"""Device mesh construction and the sharded frame-analysis step.

Sharding layout:
  - 'data' axis: blocks of the frame (CTU tiles) — data parallel.
  - 'mode' axis: the 65-entry angular mode dimension of the prediction
    weight tensor (padded to a multiple of the axis size) — tensor
    parallel over modes; selecting the best mode's prediction is a
    one-hot contraction that XLA lowers to a psum over 'mode'.

The step is a full encode-analysis iteration: all-mode intra prediction
(one MXU matmul), SATD mode decision, residual transform (DCT-2),
scalar quant/dequant, inverse transform, reconstruction and SSD — i.e.
the compute content of the encoder inner loop, batched frame-wide.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tpu import intra_batch as ib
from ..tpu import satd as satd_mod
from ..tpu import transforms as ttx

MODE_PAD = 72  # 65 angular modes padded for even sharding (72 = 8 * 9)


def make_mesh(devices=None, mode_shards=None):
    """Build a ('data', 'mode') mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mode_shards is None:
        mode_shards = 2 if n % 2 == 0 and n > 1 else 1
    data_shards = n // mode_shards
    dev_array = np.asarray(devices).reshape(data_shards, mode_shards)
    return Mesh(dev_array, ("data", "mode"))


def padded_weights(n):
    """Angular weight tensor padded to MODE_PAD modes (zero rows)."""
    w = ib.angular_weight_tensor(n)  # [65, n*n, 2R]
    pad = np.zeros((MODE_PAD - w.shape[0],) + w.shape[1:], dtype=w.dtype)
    return np.concatenate([w, pad], axis=0)


def _analysis_step(orig, top, left, weights, n, bitdepth, qp_scale,
                   qp_shift, inv_scale, inv_shift):
    """See module docstring. Shapes: orig [B,n,n], top [B,2n+1],
    left [B,2n], weights [MODE_PAD, n*n, 2(4n+1)]."""
    b = orig.shape[0]
    ftop, fleft = ib.filter_refs(top, left)
    ref2 = jnp.concatenate([top, left, ftop, fleft],
                           axis=1).astype(jnp.float32)
    num = jnp.einsum("br,mpr->bmp", ref2, weights,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    preds = jnp.floor((num + 16.0) * (1.0 / 32.0)).astype(jnp.int32)
    # SATD for every (block, mode)
    diff = orig.reshape(b, 1, n * n) - preds
    satd = satd_mod.satd_square(diff.reshape(b, MODE_PAD, n, n), bitdepth)
    valid = jnp.arange(MODE_PAD) < ib.NUM_MODES_EXT - 2
    satd = jnp.where(valid[None, :], satd, jnp.iinfo(jnp.int32).max)
    # Mode decision + one-hot gather of the winning prediction
    # (contraction over the sharded 'mode' axis -> psum)
    best = jnp.argmin(satd, axis=1)
    onehot = jax.nn.one_hot(best, MODE_PAD, dtype=jnp.float32)
    pred_best = jnp.einsum("bm,bmp->bp", onehot, preds.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
    pred_best = pred_best.astype(jnp.int32).reshape(b, n, n)
    # Residual coding round-trip
    resi = orig - pred_best
    coeff = ttx.fwd_dct2(resi, bitdepth)
    levels = ttx.quant_fast_scalar(coeff, qp_scale, qp_shift,
                                   1 << (qp_shift - 1))
    dq = ttx.dequant_scalar(levels, inv_scale, inv_shift)
    rec_resi = ttx.inv_dct2(dq, bitdepth)
    recon = jnp.clip(pred_best + rec_resi, 0, (1 << bitdepth) - 1)
    ssd = ((orig - recon) ** 2).sum(axis=(-1, -2))
    return {"best_mode": best, "satd": satd, "ssd": ssd, "levels": levels}


def make_sharded_analysis_step(mesh, n, bitdepth, qp=32):
    """jit the analysis step with (data, mode) shardings over `mesh`."""
    from ..ops import quant as q
    transform_shift = q.get_transform_shift(n, n, bitdepth)
    qp_per, qp_rem = qp // 6, qp % 6
    qp_scale = q.FWD_QUANT_SCALES[qp_rem]
    qp_shift = q.QUANT_SHIFT + qp_per + transform_shift
    inv_scale = q.INV_QUANT_SCALES[qp_rem] << qp_per
    inv_shift = q.IQUANT_SHIFT - transform_shift

    def step(orig, top, left, weights):
        return _analysis_step(orig, top, left, weights, n, bitdepth,
                              qp_scale, qp_shift, inv_scale, inv_shift)

    dspec = NamedSharding(mesh, P("data"))
    wspec = NamedSharding(mesh, P("mode"))
    outspec = {
        "best_mode": NamedSharding(mesh, P("data")),
        "satd": NamedSharding(mesh, P("data", "mode")),
        "ssd": NamedSharding(mesh, P("data")),
        "levels": NamedSharding(mesh, P("data")),
    }
    return jax.jit(step,
                   in_shardings=(dspec, dspec, dspec, wspec),
                   out_shardings=outspec)
