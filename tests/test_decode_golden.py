"""Decoder conformance: bit-exact output vs reference xvcdec.

Mirrors the reference test strategy (SURVEY.md §4): golden bitstreams were
produced by the reference xvcenc; our decoder must reproduce xvcdec's YUV
output exactly and every in-bitstream checksum must validate.
"""
import pytest

from xvc_tpu.codec.decoder import decode_stream

from .util import read_data

ALL_INTRA_STREAMS = [
    "ai16x16", "ai64x48", "ai64x48q27", "ai64x48q37", "ai44x36",
    "ai64x48b10",
]


@pytest.mark.parametrize("name", ALL_INTRA_STREAMS)
def test_all_intra_bit_exact(name):
    bitstream = read_data(name + ".xvc")
    expected = read_data(name + "_dec.yuv")
    pics = decode_stream(bitstream)
    assert all(p.conforming for p in pics), "checksum mismatch"
    out = b"".join(p.bytes for p in pics)
    assert out == expected


@pytest.mark.slow
def test_all_intra_cif_bit_exact():
    bitstream = read_data("ai352x288.xvc")
    expected = read_data("ai352x288_dec.yuv")
    pics = decode_stream(bitstream)
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == expected


def test_output_order_and_poc():
    pics = decode_stream(read_data("ai64x48.xvc"))
    assert [p.poc for p in pics] == [0, 1, 2]


INTER_STREAMS = ["ld64x48", "ra64x48", "radbg"]


@pytest.mark.parametrize("name", INTER_STREAMS)
def test_inter_bit_exact(name):
    bitstream = read_data(name + ".xvc")
    expected = read_data(name + "_dec.yuv")
    pics = decode_stream(bitstream)
    assert all(p.conforming for p in pics), "checksum mismatch"
    assert b"".join(p.bytes for p in pics) == expected
