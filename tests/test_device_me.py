"""Device ME pre-pass (XVC_ME=jax): byte-identical bitstreams.

The TZ fullpel-SAD sweeps run as batched device dispatches
(xvc_tpu/tpu/me.py) while the search decisions replay on the host —
VERDICT r2 item 3's contract: same bitstream as the host search.
"""
import numpy as np
import pytest

from xvc_tpu import api

from .util import read_data, read_meta


def _encode(name, env_me, monkeypatch, **kw):
    if env_me:
        monkeypatch.setenv("XVC_ME", "jax")
    else:
        monkeypatch.delenv("XVC_ME", raising=False)
    meta = read_meta(name)
    raw = read_data(name + "_in.yuv")
    p = api.EncoderParameters(width=meta["width"], height=meta["height"],
                              qp=meta["qp"], input_bitdepth=meta["bitdepth"],
                              internal_bitdepth=meta["bitdepth"],
                              checksum_mode=1, **kw)
    enc = api.EncoderSession(p)
    fs = meta["width"] * meta["height"] * 3 // 2
    nals = []
    for i in range(meta["frames"]):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    return b"".join(len(n).to_bytes(4, "little") + n for n in nals)


@pytest.mark.slow
def test_low_delay_jax_me_byte_identical_to_golden(monkeypatch):
    out = _encode("ld64x48", True, monkeypatch,
                  num_ref_pics=1, sub_gop_length=1, low_delay=1)
    assert out == read_data("ld64x48.xvc")


@pytest.mark.slow
def test_random_access_jax_me_byte_identical(monkeypatch):
    """RA (bi-pred, hierarchical): jax-ME stream == host-ME stream."""
    kw = dict(num_ref_pics=2, sub_gop_length=4)
    ref = _encode("ra64x48", False, monkeypatch, **kw)
    monkeypatch.setenv("XVC_ENC_NATIVE", "0")  # same Python path both ways
    out = _encode("ra64x48", True, monkeypatch, **kw)
    assert out == ref
