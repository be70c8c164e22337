"""12-bit coding and NAL encapsulation mode.

Goldens from the reference binaries (tools/make_golden.py); both
byte-exact (ref: common.h XVC_HIGH_BITDEPTH, decoder.cc:84-113
encapsulation-code escape, encoder.cc:630-651).
"""
from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data


def test_12bit_decode_bit_exact():
    pics = decode_stream(read_data("b12.xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data("b12_dec.yuv")


def test_12bit_encode_byte_exact():
    raw = read_data("b12_in.yuv")
    fs = 32 * 32 * 3 // 2 * 2
    p = api.EncoderParameters(width=32, height=32, qp=32, checksum_mode=1,
                              input_bitdepth=12, internal_bitdepth=12,
                              num_ref_pics=0, sub_gop_length=1)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(2):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data("b12.xvc")


def test_encapsulation_mode_decode_bit_exact():
    pics = decode_stream(read_data("enc_encap.xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data("enc_encap_dec.yuv")


def test_encapsulation_mode_encode_byte_exact():
    raw = read_data("ai64x48_in.yuv")
    fs = 64 * 48 * 3 // 2
    p = api.EncoderParameters(
        width=64, height=48, qp=32, checksum_mode=1, num_ref_pics=0,
        sub_gop_length=1,
        explicit_encoder_settings="encapsulation_mode 1")
    enc = api.EncoderSession(p)
    nals = []
    for i in range(3):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data("enc_encap.xvc")
