"""Encoder conformance: byte-identical bitstream vs reference xvcenc.

The encoder must reproduce the reference bitstream exactly (same RDO
decisions, same CABAC output) for the golden configs generated from the
reference binaries (tools/make_golden.py).  Mirrors the strictest form
of the reference test contract (SURVEY.md §4, encoder rec == decoder
out); byte-identity also pins the RDO search order and lambda model.
"""
import pytest

from xvc_tpu import api

from .util import read_data, read_meta


def encode_golden(name, **kw):
    meta = read_meta(name)
    raw = read_data(name + "_in.yuv")
    p = api.EncoderParameters(width=meta["width"], height=meta["height"],
                              qp=meta["qp"], input_bitdepth=meta["bitdepth"],
                              internal_bitdepth=meta["bitdepth"],
                              checksum_mode=1, **kw)
    enc = api.EncoderSession(p)
    fs = meta["width"] * meta["height"] * 3 // 2 * \
        (2 if meta["bitdepth"] > 8 else 1)
    nals = []
    for i in range(meta["frames"]):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data(name + ".xvc")


def test_all_intra_16x16_byte_exact():
    encode_golden("ai16x16", num_ref_pics=0, sub_gop_length=1)


@pytest.mark.slow
def test_all_intra_64x48_byte_exact():
    encode_golden("ai64x48", num_ref_pics=0, sub_gop_length=1)


@pytest.mark.slow
def test_all_intra_10bit_byte_exact():
    encode_golden("ai64x48b10", num_ref_pics=0, sub_gop_length=1)


@pytest.mark.slow
def test_low_delay_byte_exact():
    encode_golden("ld64x48", num_ref_pics=1, sub_gop_length=1, low_delay=1)


def test_all_intra_16x16_byte_exact_jax_prepass(monkeypatch):
    """The batched device SATD pre-pass (XVC_INTRA_PREPASS=jax,
    xvc_tpu/tpu/intra_batch.py wired into intra_search.py) must leave
    the bitstream byte-identical to the host loop — the same contract
    the reference pins between SIMD and scalar encoders
    (ref: test/xvc_test/simd_test.cc:149-176)."""
    monkeypatch.setenv("XVC_INTRA_PREPASS", "jax")
    encode_golden("ai16x16", num_ref_pics=0, sub_gop_length=1)


@pytest.mark.slow
def test_all_intra_64x48_byte_exact_jax_prepass(monkeypatch):
    monkeypatch.setenv("XVC_INTRA_PREPASS", "jax")
    encode_golden("ai64x48", num_ref_pics=0, sub_gop_length=1)


@pytest.mark.slow
def test_low_delay_byte_exact_jax_prepass(monkeypatch):
    monkeypatch.setenv("XVC_INTRA_PREPASS", "jax")
    encode_golden("ld64x48", num_ref_pics=1, sub_gop_length=1, low_delay=1)
