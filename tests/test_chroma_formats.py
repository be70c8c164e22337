"""Monochrome / 4:2:2 / 4:4:4 coding conformance.

Goldens from reference binaries over 32x32 2-frame sequences
(tools/make_golden.py); encode byte-identical, decode bit-exact
(ref: src/xvc_common_lib/yuv_pic.cc chroma scaling,
 test/xvc_test/decoder_resample_test.cc chroma cases).
"""
import pytest

from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data

CASES = [(0, "mono", 32 * 32), (2, "c422", 32 * 32 * 2),
         (3, "c444", 32 * 32 * 3)]


@pytest.mark.parametrize("cf,tag,fs", CASES, ids=[c[1] for c in CASES])
def test_decode_bit_exact(cf, tag, fs):
    pics = decode_stream(read_data(f"cf_{tag}.xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data(f"cf_{tag}_dec.yuv")


@pytest.mark.parametrize("cf,tag,fs", CASES, ids=[c[1] for c in CASES])
def test_encode_byte_exact(cf, tag, fs):
    raw = read_data(f"cf_{tag}_in.yuv")
    p = api.EncoderParameters(width=32, height=32, qp=32, checksum_mode=1,
                              chroma_format=cf, sub_gop_length=1,
                              num_ref_pics=1)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(2):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data(f"cf_{tag}.xvc")
