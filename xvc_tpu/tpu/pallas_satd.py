"""Pallas TPU kernel for the batched 8x8 Hadamard SATD.

The XLA formulation (xvc_tpu/tpu/satd.py) expresses SATD as einsum
matmuls and lets the compiler schedule them; this module is the same
math as an explicit Pallas kernel so memory movement is under kernel
control: each grid step DMAs one (block_tile, 64) tile of flattened
sample differences into VMEM, applies the 64x64 Kronecker-factored
Hadamard (H8 (x) H8) on the MXU, and reduces |.| on the VPU — one HBM
round trip per tile.

Bit-exact vs satd.satd_square / ops.metrics.compute_satd for 8x8 blocks
(float32 products stay < 2^24): tests/test_pallas.py.  Device timing vs
the XLA version is published by bench.py (kernel section).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

_BLOCK_TILE = 1024  # blocks per grid step (s32 output layout wants 1024)


@functools.lru_cache(maxsize=None)
def _hadamard_kron8():
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]]).astype(np.float32)
    # (H D H)_flat = kron(H, H) @ D_flat for symmetric H
    return np.kron(h, h).astype(np.float32)


def _satd8_kernel(diff_ref, kron_ref, out_ref):
    x = diff_ref[...].astype(jnp.float32)            # [TB, 64]
    k = kron_ref[...]                                # [64, 64]
    m = jax.lax.dot(x, k,
                    preferred_element_type=jnp.float32)  # MXU
    s = jnp.sum(jnp.abs(m).astype(jnp.int32), axis=1)    # VPU reduce
    out_ref[...] = (s + 2) >> 2


@functools.partial(jax.jit, static_argnums=(1, 2))
def _satd8_call(diff_flat, bitdepth, interpret):
    from jax.experimental import pallas as pl
    n_blocks = diff_flat.shape[0]
    tiles = n_blocks // _BLOCK_TILE
    kron = jnp.asarray(_hadamard_kron8())
    out = pl.pallas_call(
        _satd8_kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks,), jnp.int32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_BLOCK_TILE, 64), lambda i: (i, 0)),
            pl.BlockSpec((64, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_TILE,), lambda i: (i,)),
        interpret=interpret,
    )(diff_flat, kron)
    return out >> (bitdepth - 8)


def satd8_pallas(diff, bitdepth=8, interpret=None):
    """SATD of a batch of 8x8 difference blocks via the Pallas kernel.

    diff: [B, 8, 8] int32 sample differences.  Returns [B] int32,
    bit-exact vs satd.satd_square(diff, bitdepth).
    interpret defaults to True off-TPU (the kernel targets Mosaic).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    diff = jnp.asarray(diff, jnp.int32)
    b = diff.shape[0]
    pad = (-b) % _BLOCK_TILE
    flat = diff.reshape(b, 64)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 64), jnp.int32)], axis=0)
    out = _satd8_call(flat, int(bitdepth), bool(interpret))
    return out[:b]


def bench_device(batch=4096, iters=20, seed=0):
    """Device-side timing: Pallas kernel vs the XLA einsum formulation.

    Chains `iters` dependent evaluations inside one jit so a single
    host read fences the whole run (the only honest timing fence through
    a remote-device tunnel).  Returns dict of Mpix/s per variant.
    """
    import time

    from . import satd as satd_mod
    rng = np.random.RandomState(seed)
    diff = rng.randint(-255, 256, size=(batch, 8, 8)).astype(np.int32)
    d = jnp.asarray(diff)
    interpret = jax.default_backend() != "tpu"

    def chain(fn):
        @jax.jit
        def run(x):
            def body(i, acc):
                return acc + jnp.sum(fn((x + i) % 512 - 255))
            return jax.lax.fori_loop(0, iters, body, jnp.int64(0)
                                     if jax.config.jax_enable_x64
                                     else jnp.int32(0))
        return run

    results = {}
    variants = {
        "pallas": lambda x: satd8_pallas(x, 8, interpret),
        "xla": lambda x: satd_mod.satd_square(x, 8),
    }
    for name, fn in variants.items():
        run = chain(fn)
        int(run(d))  # warm + compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(d))  # reading the scalar fences device execution
            best = min(best, time.perf_counter() - t0)
        results[name] = batch * 64 * iters / best / 1e6
    return results
