"""Odd picture sizes: implicit CU splits at boundaries + crop/padding.

Mirrors test/xvc_test/resolution_test.cc: widths/heights that are not
multiples of the max CU size (and not 8-aligned) exercise implicit
quad splits outside the picture and internal-size padding with output
cropping.  Goldens from the reference binaries.
"""
import pytest

from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data

SIZES = [(24, 16), (16, 24), (44, 20), (20, 36)]


@pytest.mark.parametrize("w,h", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_decode_bit_exact(w, h):
    tag = f"res{w}x{h}"
    pics = decode_stream(read_data(tag + ".xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data(tag + "_dec.yuv")


@pytest.mark.parametrize("w,h", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_encode_byte_exact(w, h):
    tag = f"res{w}x{h}"
    raw = read_data(tag + "_in.yuv")
    fs = w * h * 3 // 2
    p = api.EncoderParameters(width=w, height=h, qp=30, checksum_mode=1,
                              sub_gop_length=1, num_ref_pics=1)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(2):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data(tag + ".xvc")
