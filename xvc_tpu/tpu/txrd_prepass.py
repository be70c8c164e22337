"""Device transform-RD intra mode prepass: whole-frame batched
predict + forward transform + quantize + rate/distortion estimate.

This is the transform-aware stage of the TPU-first encoder redesign
(SURVEY.md §7(e), the analog of the per-candidate loop in the
reference's transform encoder, ref: src/xvc_enc_lib/
transform_encoder.cc:54-200 driven from intra_search.cc:188-303): for
every aligned square block of the picture, all 67 intra modes are
predicted and SATD-screened in one jitted call per block size, the
top-M survivors get a full forward DCT / DST, the picture-QP fast
quantizer, an entropy-rate proxy and a Parseval-domain distortion —
all as batched MXU matmuls — and only the top-K candidates per block
are handed to the host RD search (native or Python), which then runs
the exact per-candidate RDO on a 2-4x shorter mode list.

Open-loop (references from the original picture) and approximate
(f32 transforms, rate proxy instead of CABAC bits), so the mode
ranking can differ from the closed-loop full search: this is a
documented conforming fast mode (EncoderSettings.tpu_txrd_prepass = K
candidates to keep); the decisions it forces are encoder-side freedom
only and every stream stays decodable.  Quality impact is pinned by
tests/test_txrd_prepass.py.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as k
from ..ops import quant as q
from ..ops import transform as tx
from . import intra_batch as ib
from . import satd as satd_mod

SIZES = (4, 8, 16, 32)
# SATD screening width before the transform stage; 8 covers the
# reference's num_modes_for_slow_rdo (2-3) + neighbour refinement span.
SATD_KEEP = 8
# block-batch chunk bound: keeps the [chunk, 67, n, n] prediction
# tensor under ~280 MB on the device for n = 4
CHUNK = 16384


@functools.lru_cache(maxsize=None)
def _fwd_basis(n, bitdepth, use_dst):
    """f32 forward basis + shifts for an n x n square block (DCT-2 at
    high precision, or the 4x4 DST-7 used by default intra luma)."""
    l2 = n.bit_length() - 1
    if use_dst:
        m = np.asarray(tx._DST4, dtype=np.float32)
        shift1 = 2 + bitdepth - 9
        shift2 = 2 + 6
    else:
        mi, adj = tx._matrix_i32(int(k.TransformType.DCT2), n, True)
        m = np.asarray(mi, dtype=np.float32)
        shift1 = l2 + bitdepth - 9 + 2 + adj
        shift2 = l2 + 6 + 2 + adj
    return m, shift1, shift2


@functools.lru_cache(maxsize=None)
def _parseval_gain2(n, bitdepth, use_dst):
    """coeff-domain energy per unit pixel-domain energy for the f32
    forward basis (measured once; the int bases are near-orthogonal
    scaled DCT/DST so a scalar gain is accurate to ~1%)."""
    rng = np.random.RandomState(7)
    m, shift1, shift2 = _fwd_basis(n, bitdepth, use_dst)
    m64 = m.astype(np.float64)
    g = []
    for _ in range(4):
        r = rng.randint(-64, 65, size=(n, n)).astype(np.float64)
        t = np.floor((r @ m64.T + (1 << (shift1 - 1))) / (1 << shift1))
        c = np.floor((m64 @ t + (1 << (shift2 - 1))) / (1 << shift2))
        g.append((c * c).sum() / max((r * r).sum(), 1.0))
    return float(np.mean(g))


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _txrd_step(orig, top, left, n, bitdepth, keep, is_intra_slice,
               screen_step, quant_params):
    """One block-batch mode evaluation.

    orig [B,n,n] int32, top [B,2n+1], left [B,2n] int32.
    screen_step > 1 predicts planar/DC + every screen_step-th angular
    mode only (the reference's own pass-1 evaluates evens, ref:
    intra_search.cc:236-247) — halves the dense prediction einsum, the
    prepass FLOP hog; the transform re-rank then decides among the
    screened survivors.
    quant_params: (scale, shift, inv_scale, inv_shift, lam) f32 scalars
    traced so one compiled program serves every QP.
    Returns [B, keep] int32 mode indices (true 0..66 numbering), best
    first.
    """
    weights = jnp.asarray(ib.angular_weight_tensor(n)[::screen_step])
    # the batched post filter edits fixed full-set mode positions, so
    # it is only applicable on the unstrided tensor
    post_filter = n <= 16 and screen_step == 1
    preds = ib.predict_all_modes(n, top, left, weights, bitdepth,
                                 post_filter)            # [B,M,n,n]
    diff = orig[:, None].astype(jnp.int32) - preds
    satd = satd_mod.satd_square(diff, bitdepth)               # [B,67]

    m = SATD_KEEP
    _, cand = jax.lax.top_k(-satd.astype(jnp.int32), m)       # [B,m]
    pred_m = jnp.take_along_axis(preds, cand[:, :, None, None], axis=1)
    resi = (orig[:, None] - pred_m).astype(jnp.float32)       # [B,m,n,n]

    basis, shift1, shift2 = _fwd_basis(n, bitdepth, n == 4)
    bm = jnp.asarray(basis)
    # forward 2-D transform as two batched matmuls (exact-int recipe in
    # f32: floor((x + add) / 2^shift) == arithmetic >> for negatives)
    t1 = jnp.floor((jnp.einsum("bmij,kj->bmik", resi, bm,
                               precision=jax.lax.Precision.HIGHEST) +
                    float(1 << (shift1 - 1))) * (1.0 / (1 << shift1)))
    coeff = jnp.floor((jnp.einsum("ki,bmij->bmkj", bm, t1,
                                  precision=jax.lax.Precision.HIGHEST) +
                       float(1 << (shift2 - 1))) * (1.0 / (1 << shift2)))

    scale, shift, inv_scale, inv_shift, lam = quant_params
    offset = (171.0 if is_intra_slice else 85.0) * \
        jnp.exp2(shift - 9.0)
    absc = jnp.abs(coeff)
    level = jnp.floor((absc * scale + offset) * jnp.exp2(-shift))
    level = jnp.minimum(level, 32767.0)
    # dequant back (ref: quantize.cc:94-125, square -> no rounding bias)
    ch = jnp.minimum(jnp.floor(level * inv_scale * jnp.exp2(-inv_shift)
                               + 0.5), 32767.0)
    err = absc - ch
    dist_t = jnp.sum(err * err, axis=(2, 3))                  # [B,m]
    dist = dist_t * (1.0 / _parseval_gain2(n, bitdepth, n == 4))

    sig = (level > 0.0).astype(jnp.float32)
    # rate proxy: ~1.5 bit significance + exp-golomb-ish magnitude
    bits = jnp.sum(sig * (1.5 + 2.0 * jnp.log2(level + 1.0)),
                   axis=(2, 3))
    cost = dist + lam * bits                                  # [B,m]

    _, order = jax.lax.top_k(-cost, keep)                     # [B,keep]
    best = jnp.take_along_axis(cand, order, axis=1)
    # subset index -> true mode number (0/1 = planar/DC, then angular
    # modes 2 + screen_step*i)
    return jnp.where(best < 2, best,
                     (best - 2) * screen_step + 2).astype(jnp.int32)


def _extract_grid_fast(frame, n):
    """Vectorized open-loop block + reference-line extraction for the
    full n-grid: interior references are true frame samples; rows/cols
    beyond the frame clamp to the edge (replicate padding).  This is a
    preview-quality analog of compute_ref_samples (ref:
    intra_prediction.cc:707-848) - border-substitution differences only
    affect candidate ranking, never conformance."""
    h, w = frame.shape
    bh, bw = h // n, w // n
    orig = np.ascontiguousarray(
        frame[:bh * n, :bw * n].reshape(bh, n, bw, n).swapaxes(1, 2)
        .reshape(bh * bw, n, n).astype(np.int32))
    px = (np.arange(bw) * n)[None, :, None]                  # [1,bw,1]
    py = (np.arange(bh) * n)[:, None, None]                  # [bh,1,1]
    tshape = (bh, bw, 2 * n + 1)
    tcols = np.broadcast_to(
        np.clip(px - 1 + np.arange(2 * n + 1)[None, None, :], 0, w - 1),
        tshape)
    trows = np.broadcast_to(np.clip(py - 1, 0, h - 1), tshape)
    top = frame[trows, tcols].reshape(bh * bw, 2 * n + 1).astype(np.int32)
    lshape = (bh, bw, 2 * n)
    lrows = np.broadcast_to(
        np.clip(py + np.arange(2 * n)[None, None, :], 0, h - 1), lshape)
    lcols = np.broadcast_to(np.clip(px - 1, 0, w - 1), lshape)
    left = frame[lrows, lcols].reshape(bh * bw, 2 * n).astype(np.int32)
    return orig, top, left


def frame_txrd_prepass(luma_plane, bitdepth, qp, is_intra_pic, keep=2,
                       sizes=SIZES, screen_step=1):
    """Whole-picture device transform-RD mode maps.

    Returns {n: int32 [bh, bw, keep]} candidate mode indices (best
    first) for every fully-covered aligned n x n block, or None when no
    size fits the picture."""
    frame = np.ascontiguousarray(luma_plane, dtype=np.int32)
    h, w = frame.shape
    keep = max(1, min(keep, SATD_KEEP))
    lam = float(qp.get_lambda())
    maps = {}
    for n in sizes:
        if h < n or w < n:
            continue
        tshift = q.get_transform_shift(n, n, bitdepth)
        params = (
            float(qp.get_fwd_scale(0)),
            float(q.QUANT_SHIFT + qp.get_qp_per(0) + tshift),
            float(qp.get_inv_scale(0)),
            float(q.IQUANT_SHIFT - tshift),  # dequant shift (>=0 here)
            lam,
        )
        orig, top, left = _extract_grid_fast(frame, n)
        b = orig.shape[0]
        outs = []
        for s in range(0, b, CHUNK):
            e = min(b, s + CHUNK)
            co, ct, cl = orig[s:e], top[s:e], left[s:e]
            # pad to a power-of-two bucket so every picture of a given
            # format shares a handful of compiled programs instead of
            # one per exact grid size
            bucket = 1 << max(e - s - 1, 0).bit_length()
            bucket = min(bucket, CHUNK)
            if bucket > e - s:
                pad = bucket - (e - s)
                co = np.concatenate([co, co[:1].repeat(pad, 0)])
                ct = np.concatenate([ct, ct[:1].repeat(pad, 0)])
                cl = np.concatenate([cl, cl[:1].repeat(pad, 0)])
            outs.append(_txrd_step(
                jnp.asarray(co), jnp.asarray(ct), jnp.asarray(cl),
                n, bitdepth, keep, bool(is_intra_pic), screen_step,
                tuple(jnp.float32(p) for p in params))[:e - s])
        cands = np.asarray(jnp.concatenate(outs, axis=0)) if len(outs) > 1 \
            else np.asarray(jax.device_get(outs[0]))
        maps[n] = cands.reshape(h // n, w // n, keep)
    return maps or None


def pack_intra_cands(maps, width, height, keep, sizes=SIZES):
    """Flatten candidate maps into the single int8 buffer consumed by
    the native encoder (native/xvcn_enc.inc enc_intra_cand_lookup): for
    each n in `sizes` in order, a ceil(height/n) x ceil(width/n) x keep
    grid, -1 where the map has no entry (partial edge blocks)."""
    bufs = []
    for n in sizes:
        gh = -(-height // n)
        gw = -(-width // n)
        g = np.full((gh, gw, keep), -1, np.int8)
        f = None if maps is None else maps.get(n)
        if f is not None:
            g[:f.shape[0], :f.shape[1]] = f[:gh, :gw].astype(np.int8)
        bufs.append(g.reshape(-1))
    return np.ascontiguousarray(np.concatenate(bufs))
