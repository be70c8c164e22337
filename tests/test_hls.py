"""High-level syntax: version negotiation and rfe-bit handling.

Mirrors test/xvc_test/hls_test.cc: the decoder must accept equal or
older-supported versions and larger minor versions, reject larger major
versions (kDecoderVersionTooLow) and unsupported old versions
(kBitstreamVersionTooLow), and ignore NALs with the rfe bit set.
"""
from xvc_tpu import constants as k
from xvc_tpu import segment as seg
from xvc_tpu.codec.decoder import Decoder
from xvc_tpu.segment import DecoderState

from .util import read_data


def _nals(data):
    out, off = [], 0
    while off < len(data):
        ln = int.from_bytes(data[off:off + 4], "little")
        off += 4
        out.append(data[off:off + ln])
        off += ln
    return out


def _with_version(major, minor):
    """Rewrite the version fields inside a real segment header NAL."""
    nal = bytearray(_nals(read_data("ai16x16.xvc"))[0])
    # layout: nal header (1B) + codec id (24b=3B) + major (16b) + minor
    nal[4:6] = major.to_bytes(2, "big")
    nal[6:8] = minor.to_bytes(2, "big")
    return bytes(nal)


def test_recv_same_version():
    dec = Decoder()
    assert dec.decode_nal(_with_version(k.XVC_MAJOR_VERSION,
                                        k.XVC_MINOR_VERSION))
    assert dec.state == DecoderState.SEGMENT_HEADER_DECODED


def test_recv_larger_major_version():
    dec = Decoder()
    stream = _nals(read_data("ai16x16.xvc"))
    assert not dec.decode_nal(_with_version(k.XVC_MAJOR_VERSION + 1,
                                            k.XVC_MINOR_VERSION))
    assert dec.state == DecoderState.DECODER_VERSION_TOO_LOW
    # subsequent picture NALs are rejected in this state
    assert not dec.decode_nal(stream[1])
    assert dec.state == DecoderState.DECODER_VERSION_TOO_LOW


def test_recv_major_version_zero():
    dec = Decoder()
    assert not dec.decode_nal(_with_version(0, k.XVC_MINOR_VERSION))
    assert dec.state == DecoderState.BITSTREAM_VERSION_TOO_LOW
    assert not dec.decode_nal(_nals(read_data("ai16x16.xvc"))[1])


def test_recv_larger_minor_version():
    dec = Decoder()
    assert dec.decode_nal(_with_version(k.XVC_MAJOR_VERSION,
                                        k.XVC_MINOR_VERSION + 1))
    assert dec.state == DecoderState.SEGMENT_HEADER_DECODED


def test_recv_rfe_one():
    """NALs with the reserved-for-future-extension bit are ignored
    (ref: hls_test.cc:115-123)."""
    dec = Decoder()
    stream = _nals(read_data("ai16x16.xvc"))
    nal = bytearray(stream[0])
    nal[0] |= 1 << 6
    assert not dec.decode_nal(bytes(nal))
    assert dec.state == DecoderState.NO_SEGMENT_HEADER
    assert not dec.decode_nal(stream[1])
    assert dec.state == DecoderState.NO_SEGMENT_HEADER


def test_recv_rfe_zero_decodes():
    dec = Decoder()
    stream = _nals(read_data("ai16x16.xvc"))
    assert dec.decode_nal(stream[0])
    assert dec.decode_nal(stream[1])
    assert dec.state == DecoderState.PIC_DECODED


def test_bitdepth_too_high_gate():
    """A stream with bitdepth above the build maximum is refused
    (ref: segment_header_reader.cc:28-52)."""
    nal = bytearray(_nals(read_data("ai16x16.xvc"))[0])
    # bitdepth field: after nal hdr(1B) + codec id(3B) + versions(4B) +
    # 2x PIC_SIZE_BITS + 4b chroma; flip bitdepth nibble to 15 (=23bit)
    br_bits = 8 + 24 + 32 + 2 * k.PIC_SIZE_BITS + 4
    byte_idx, bit_off = divmod(br_bits, 8)
    # set the 4-bit field starting at bit_off to 0xF
    cur = int.from_bytes(nal, "big")
    total_bits = len(nal) * 8
    shift = total_bits - br_bits - 4
    cur |= 0xF << shift
    nal = bytearray(cur.to_bytes(len(nal), "big"))
    dec = Decoder()
    assert not dec.decode_nal(bytes(nal))
    assert dec.state == DecoderState.BITSTREAM_BITDEPTH_TOO_HIGH
