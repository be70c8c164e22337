"""Batched separable integer transforms for the TPU analysis path.

Same semantics as the host path (xvc_tpu/ops/transform.py, itself the
behavioral equivalent of ref: src/xvc_common_lib/transform.cc): two
integer GEMM stages with rounding shifts, int16 clipping on the inverse,
and zero-out beyond 32 lines.  Computed in int32 einsums — XLA lowers
integer dots on all backends with exact semantics; the f32+HIGHEST
split-matmul optimization used for prediction/SATD does not cover the
9-bit x 16-bit products here.

Square sizes, DCT-2 only on this path (the RDO transform-select search
stays on the host/native path for now).
"""
import functools

import numpy as np
import jax.numpy as jnp

from .. import constants as k
from ..ops import transform as tx


@functools.lru_cache(maxsize=None)
def _dct2(n, high_prec):
    m, adjust = tx.get_matrix(k.TransformType.DCT2, n, high_prec)
    return m.astype(np.int32), adjust


def fwd_dct2(resi, bitdepth, high_precision=True):
    """Forward DCT-2 of [..., n, n] int32 residual blocks -> int32 coeffs.

    Mirrors ops/transform.py forward_transform_np for square n.
    """
    n = resi.shape[-1]
    l2 = n.bit_length() - 1
    hp1 = high_precision or n >= 64 or n == 2
    m, adjust = _dct2(n, hp1)
    shift1 = l2 + bitdepth - 9 + (2 if hp1 else 0) + adjust
    shift2 = l2 + 6 + (2 if hp1 else 0) + adjust
    out1 = min(n, k.TRANSFORM_ZERO_OUT_MIN_SIZE)
    mj = jnp.asarray(m)
    r = resi.astype(jnp.int32)
    temp = (jnp.einsum("...ij,kj->...ik", r, mj[:out1, :]) +
            (1 << (shift1 - 1))) >> shift1
    coeff = (jnp.einsum("ij,...jk->...ik", mj[:out1, :], temp) +
             (1 << (shift2 - 1))) >> shift2
    if out1 < n:
        pad = [(0, 0)] * (coeff.ndim - 2) + [(0, n - out1), (0, n - out1)]
        coeff = jnp.pad(coeff, pad)
    return coeff


def inv_dct2(coeff, bitdepth, high_precision=True):
    """Inverse DCT-2 of [..., n, n] int32 coeffs -> int32 residual.

    Mirrors ops/transform.py inverse_transform_np for square n.
    """
    n = coeff.shape[-1]
    hp1 = high_precision or n >= 64 or n == 2
    m, adjust = _dct2(n, hp1)
    shift1 = 7 + (2 if hp1 else 0) + adjust
    shift2 = 20 - bitdepth + (2 if hp1 else 0) + adjust
    in1 = min(n, k.TRANSFORM_ZERO_OUT_MIN_SIZE)
    mj = jnp.asarray(m)

    def clip16(x):
        return jnp.clip(x, k.INT16_MIN, k.INT16_MAX)

    c = coeff.astype(jnp.int32)
    temp = clip16((jnp.einsum("ji,...jk->...ik", mj[:in1, :], c[..., :in1, :])
                   + (1 << (shift1 - 1))) >> shift1)
    resi = clip16((jnp.einsum("...ij,jk->...ik", temp[..., :, :in1],
                              mj[:in1, :]) + (1 << (shift2 - 1))) >> shift2)
    return resi


def quant_fast_scalar(coeff, scale, shift, offset):
    """Batched scalar quantization (non-RDOQ path): sign(c) *
    ((|c| * scale + offset) >> shift) (ref: quantize.cc QuantFast core)."""
    a = jnp.abs(coeff)
    lvl = (a * scale + offset) >> shift
    return jnp.sign(coeff) * lvl


def dequant_scalar(level, scale, shift):
    """Batched scalar dequantization with int16 clip."""
    c = (level * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(c, k.INT16_MIN, k.INT16_MAX)
