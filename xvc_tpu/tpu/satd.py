"""Batched Hadamard SATD as MXU matrix products.

TPU formulation of the reference SATD metric
(ref: src/xvc_enc_lib/sample_metric.cc, Compute8x8Satd / Compute4x4Satd):
sum-of-absolute-transformed-differences is invariant under Hadamard
row/column permutation, so the reference's butterfly is computed here as
H @ D @ H^T batched matmuls.  Transformed entries stay < 2^24 for
bitdepths <= 14 so float32 matmuls are exact; the absolute values are
accumulated in int32.

Matches xvc_tpu/ops/metrics.py compute_satd bit-exactly for square
blocks >= 4 (tests/test_tpu_intra.py).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _hadamard_f32(n):
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]]).astype(np.float32)
    return h  # numpy (not jnp): safe to cache across jit traces


def satd_square(diff, bitdepth):
    """SATD of square blocks, batched over leading dims.

    diff: [..., n, n] int32 sample differences with n in {4, 8, 16, 32, 64}.
    Blocks n >= 8 decompose into 8x8 Hadamard tiles with per-tile
    normalization (s + 2) >> 2; 4x4 uses (s + 1) >> 1
    (ref: sample_metric.cc:561-700).
    Returns [...] int32.
    """
    n = diff.shape[-1]
    lead = diff.shape[:-2]
    # HIGHEST precision (3-pass bf16) keeps every operand exact: sample
    # diffs and the <= 2^16 stage-1 partial transforms both split exactly
    # into bf16 hi/lo parts for bitdepths <= 12.
    hi = jax.lax.Precision.HIGHEST
    if n == 4:
        h = _hadamard_f32(4)
        m = jnp.einsum("ij,...jk,kl->...il", h, diff.astype(jnp.float32), h,
                       precision=hi)
        s = jnp.abs(m).astype(jnp.int32).sum(axis=(-1, -2))
        satd = (s + 1) >> 1
    else:
        t = n // 8
        d = diff.reshape(lead + (t, 8, t, 8))
        d = jnp.swapaxes(d, -3, -2).astype(jnp.float32)  # [..., t, t, 8, 8]
        h = _hadamard_f32(8)
        m = jnp.einsum("ij,...jk,kl->...il", h, d, h, precision=hi)
        s = jnp.abs(m).astype(jnp.int32).sum(axis=(-1, -2))
        satd = ((s + 2) >> 2).sum(axis=(-1, -2))
    return satd >> (bitdepth - 8)
