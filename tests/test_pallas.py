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


def test_pallas_mc_matches_xla_core():
    """Batched sub-pel MC Pallas kernel (tpu/pallas_mc.py) vs the XLA
    gather formulation (dsp._mc_core_builder): bit-exact for both the
    clip-output (uni-pred) and short-intermediate (bi-pred) variants,
    across luma/chroma taps and bitdepths.  On a real TPU the same
    kernel is ~6-8x the XLA version (BASELINE.md round-5)."""
    from xvc_tpu.tpu import dsp
    from xvc_tpu.tpu.pallas_mc import make_mc_pallas
    import jax.numpy as jnp
    rng = np.random.RandomState(11)
    S, Hp, Wp = 3, 64, 384
    batch = 24
    for luma, block, bitdepth, short_out in (
            (True, 8, 8, False), (True, 8, 8, True),
            (True, 16, 10, False), (False, 8, 8, False),
            (False, 4, 10, True)):
        planes = jnp.asarray(rng.randint(
            0, 1 << bitdepth, (S, Hp, Wp)).astype(np.int16))
        taps = 8 if luma else 4
        n_phase = 16
        params = jnp.asarray(np.stack([
            rng.randint(0, S, batch),
            rng.randint(0, Hp - block - taps, batch),
            rng.randint(0, Wp - block - taps, batch),
            rng.randint(0, n_phase, batch),
            rng.randint(0, n_phase, batch)]).astype(np.int32))
        xla = dsp._mc_core_builder(block, block, luma, bitdepth, True,
                                   short_out)
        a = np.asarray(xla(planes, params[0], params[1], params[2],
                           params[3], params[4]))
        k = make_mc_pallas(block, block, luma, bitdepth, True, short_out,
                           batch, group=8, interpret=True)
        b = np.asarray(k(planes, params))
        assert (a == b).all(), (luma, block, bitdepth, short_out)
