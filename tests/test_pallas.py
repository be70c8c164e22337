"""Pallas kernel correctness: bit-exact vs the XLA and host SATD paths.

Runs in interpret mode on the CPU backend (tests/conftest.py pins jax to
CPU); the same kernel lowers through Mosaic on a real TPU, where
bench.py publishes device timing vs the XLA einsum version.
"""
import numpy as np

from xvc_tpu.ops import metrics as met


def test_pallas_satd8_matches_host_and_xla():
    from xvc_tpu.tpu import satd as satd_mod
    from xvc_tpu.tpu.pallas_satd import satd8_pallas
    rng = np.random.RandomState(3)
    diff = rng.randint(-255, 256, size=(37, 8, 8)).astype(np.int32)
    got = np.asarray(satd8_pallas(diff, 8, interpret=True))
    xla = np.asarray(satd_mod.satd_square(diff, 8))
    host = np.array([met.compute_satd(d, 8) for d in diff])
    assert (got == xla).all()
    assert (got == host).all()


def test_pallas_satd8_10bit():
    from xvc_tpu.tpu.pallas_satd import satd8_pallas
    rng = np.random.RandomState(7)
    diff = rng.randint(-1023, 1024, size=(16, 8, 8)).astype(np.int32)
    got = np.asarray(satd8_pallas(diff, 10, interpret=True))
    host = np.array([met.compute_satd(d, 10) for d in diff])
    assert (got == host).all()
