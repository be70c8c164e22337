"""Closed-GOP coding and checksum-mismatch detection.

Mirrors test/xvc_test/all_intra_test.cc closed-gop variants and
checksum_enc_dec_test.cc corruption cases.
"""
import numpy as np

from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data


def test_closed_gop_decode_bit_exact():
    pics = decode_stream(read_data("cg48x32.xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data("cg48x32_dec.yuv")


def test_closed_gop_encode_byte_exact():
    raw = read_data("sp48x32_in.yuv")
    fs = 48 * 32 * 3 // 2
    p = api.EncoderParameters(width=48, height=32, qp=32, checksum_mode=1,
                              sub_gop_length=2, max_keypic_distance=2,
                              closed_gop=1, num_ref_pics=1)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(6):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data("cg48x32.xvc")


def _nals(data):
    out, off = [], 0
    while off < len(data):
        ln = int.from_bytes(data[off:off + 4], "little")
        off += 4
        out.append(data[off:off + ln])
        off += ln
    return out


def test_corrupted_checksum_detected():
    """Flipping a checksum byte must surface as a non-conforming picture
    (ref: checksum_enc_dec_test.cc:150-190)."""
    nals = _nals(read_data("ai16x16.xvc"))
    corrupted = bytearray(nals[1])
    corrupted[-1] ^= 0xFF  # last byte of the NAL = checksum tail
    dec = api.DecoderSession()
    dec.decode_nal(nals[0])
    dec.decode_nal(bytes(corrupted))
    dec.flush()
    pic = dec.get_picture()
    assert pic is not None and not pic.conforming
    assert dec.num_corrupted_pics == 1


def test_same_input_same_checksum():
    nals_a = _nals(read_data("ai16x16.xvc"))
    # re-encode the same input: checksums identical (bitstreams identical)
    raw = read_data("ai16x16_in.yuv")
    p = api.EncoderParameters(width=16, height=16, qp=32, checksum_mode=1,
                              num_ref_pics=0, sub_gop_length=1)
    enc = api.EncoderSession(p)
    fs = 16 * 16 * 3 // 2
    nals_b = []
    for i in range(2):
        nals_b += enc.encode(raw[i * fs:(i + 1) * fs])
    nals_b += enc.flush()
    assert nals_a == nals_b


def test_crc_checksum_method_roundtrip():
    """CRC checksum method (disable_high_level_default_checksum_method):
    our CRC streams must self-validate (cross-checked against reference
    xvcdec during vector generation; ref: checksum.cc:46-93)."""
    raw = read_data("ai16x16_in.yuv")
    fs = 16 * 16 * 3 // 2
    p = api.EncoderParameters(width=16, height=16, qp=32, checksum_mode=1,
                              num_ref_pics=0, sub_gop_length=1)
    enc = api.EncoderSession(p)
    restr = enc._enc.segment_header.restrictions
    restr.disable_high_level_default_checksum_method = True
    nals = []
    for i in range(2):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    pics = decode_stream(out)
    assert all(p2.conforming for p2 in pics)
    # a flipped CRC byte must be detected
    bad = bytearray(out)
    bad[-1] ^= 0xFF
    pics = decode_stream(bytes(bad))
    assert not pics[-1].conforming
