"""Speed modes, tune modes, checksum modes, leading pictures.

Golden streams from reference xvcenc over a 48x32 6-frame sequence
(tools/make_golden.py).  Encoding must be byte-identical; decoding
bit-exact (ref: src/xvc_enc_lib/encoder_settings.cc:29-73,123-138).
"""
import pytest

from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data


def _encode(tag, **kw):
    raw = read_data("sp48x32_in.yuv")
    fs = 48 * 32 * 3 // 2
    p = api.EncoderParameters(width=48, height=32, qp=32, sub_gop_length=4,
                              **kw)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(6):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data(f"{tag}.xvc")


def _decode(tag):
    pics = decode_stream(read_data(tag + ".xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data(tag + "_dec.yuv")


@pytest.mark.parametrize("tag", ["sp_placebo", "sp_fast", "sp_tunepsnr",
                                 "sp_cksum0", "sp_leadpics"])
def test_decode_bit_exact(tag):
    _decode(tag)


@pytest.mark.slow
def test_speed_placebo_byte_exact():
    _encode("sp_placebo", speed_mode=0, checksum_mode=1)


def test_speed_fast_byte_exact():
    _encode("sp_fast", speed_mode=2, checksum_mode=1)


@pytest.mark.slow
def test_tune_psnr_byte_exact():
    _encode("sp_tunepsnr", tune_mode=1, checksum_mode=1)


@pytest.mark.slow
def test_checksum_min_overhead_byte_exact():
    _encode("sp_cksum0", checksum_mode=0)


@pytest.mark.slow
def test_leading_pictures_byte_exact():
    _encode("sp_leadpics", checksum_mode=1, leading_pictures=1)
