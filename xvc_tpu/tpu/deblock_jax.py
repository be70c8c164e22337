"""Device (JAX) in-loop deblocking filter.

Same semantics as the host filter (xvc_tpu/ops/deblock.py, behavioral
equivalent of ref: src/xvc_common_lib/deblocking_filter.cc), restructured
for the TPU:

- Boundary strengths, tc/beta and chroma gating are *state independent*
  (pure functions of the parsed CU grid), so they are computed
  vectorized on the host from the per-4x4 CU index map and shipped to
  the device as per-edge tensors.
- The luma filter has a sequential read-after-write dependency between
  neighbouring edges along the filter direction (an edge's decision
  reads samples already filtered by the previous edge), so each
  direction runs as a lax.scan over edge strips with all rows of the
  picture processed vectorized per step.  The horizontal pass reuses
  the same kernel on the transposed plane.
- The chroma filter modifies 1 sample per side with edges >= 8 apart,
  so it is a single fully-parallel masked update per direction.

Output is bit-identical to the host filter (pinned by the golden decode
tests with XVC_DSP=jax).
"""
import functools

import numpy as np

from .. import constants as k
from ..ops import deblock as dbk


# ---------------------------------------------------------------------------
# Host-side metadata (vectorized boundary-strength derivation)
# ---------------------------------------------------------------------------

def _gather_mv(attrs, idx, lst, corner):
    """corner is an (ny, nx) array; returns (mvx, mvy) arrays."""
    base = attrs[idx]  # (ny, nx, 27)
    cx = 11 + lst * 8 + corner * 2
    mvx = np.take_along_axis(base, cx[..., None], axis=-1)[..., 0]
    mvy = np.take_along_axis(base, (cx + 1)[..., None], axis=-1)[..., 0]
    return mvx, mvy


def compute_edge_metadata(pic, cu_map, attrs, direction, subblock_size,
                          beta_offset, tc_offset, restr):
    """Vectorized _get_boundary_strength over the whole picture
    (ref: deblocking_filter.cc:154-241).  Returns dict with per-subblock
    (ny, nx) arrays: bs, qp_luma, qp_chroma (x = edge positions along
    the filter direction, y = along the edge).  For direction 1 the
    arrays are in transposed coordinates (x = vertical edge position in
    the transposed plane)."""
    W, H = pic.width, pic.height
    if direction == 1:
        W, H = H, W
    one_step = 16
    xs = np.arange(subblock_size, W, subblock_size)
    ys = np.arange(0, H, subblock_size)
    if direction == 0:
        # p is the CU at (x-1, y): x is a multiple of sbs>=4 so
        # (x-1)>>2 == (x>>2) - 1
        iq = cu_map[np.ix_(ys >> 2, xs >> 2)]
        ip = cu_map[np.ix_(ys >> 2, (xs >> 2) - 1)]
    else:
        iq = cu_map[np.ix_(xs >> 2, ys >> 2)].T
        ip = cu_map[np.ix_((xs >> 2) - 1, ys >> 2)].T
    a_p = attrs[ip]
    a_q = attrs[iq]
    skip = ip == iq

    ycoord = ys[:, None].astype(np.int64)
    if direction == 0:
        # vertical edge: corner from y offset within CU
        corner_p = np.where((ycoord - a_p[..., 1]) < (a_p[..., 3] >> 1), 1, 3)
        corner_q = np.where((ycoord - a_q[..., 1]) < (a_q[..., 3] >> 1), 0, 2)
    else:
        # horizontal edge: corner from x offset within CU; in transposed
        # coords the edge position is xcoord (= y in picture coords) and
        # ycoord runs along the edge (= x in picture coords)
        corner_p = np.where((ycoord - a_p[..., 0]) < (a_p[..., 2] >> 1), 2, 3)
        corner_q = np.where((ycoord - a_q[..., 0]) < (a_q[..., 2] >> 1), 0, 1)

    base = np.int32(1 if restr.disable_deblock_boundary_strength_zero else 0)
    bs = np.full(iq.shape, base, np.int32)

    pred_bi = pic.get_prediction_type() == k.PicturePredictionType.BI
    if pred_bi:
        rp0, rp1 = a_p[..., 8], a_p[..., 9]
        rq0, rq1 = a_q[..., 8], a_q[..., 9]
        match = ((rp0 == rq0) & (rp1 == rq1)) | ((rp0 == rq1) & (rp1 == rq0))
        p0x, p0y = _gather_mv(attrs, ip, 0, corner_p)
        p1x, p1y = _gather_mv(attrs, ip, 1, corner_p)
        q0x, q0y = _gather_mv(attrs, iq, 0, corner_q)
        q1x, q1y = _gather_mv(attrs, iq, 1, corner_q)
        cond1 = ((np.abs(p0x - q0x) >= one_step) |
                 (np.abs(p0y - q0y) >= one_step) |
                 (np.abs(p1x - q1x) >= one_step) |
                 (np.abs(p1y - q1y) >= one_step))
        cond2 = ((np.abs(p0x - q1x) >= one_step) |
                 (np.abs(p0y - q1y) >= one_step) |
                 (np.abs(p1x - q0x) >= one_step) |
                 (np.abs(p1y - q0y) >= one_step))
        inner = np.where(rp0 != rp1,
                         np.where(rp0 == rq0, cond1, cond2),
                         cond1 & cond2)
        bs_mv = np.where(match, np.where(inner, 1, base), 1).astype(np.int32)
    else:
        p0x, p0y = _gather_mv(attrs, ip, 0, corner_p)
        q0x, q0y = _gather_mv(attrs, iq, 0, corner_q)
        diff = (np.abs(p0x - q0x) >= one_step) | (np.abs(p0y - q0y) >=
                                                  one_step)
        bs_mv = np.where((a_p[..., 10] != a_q[..., 10]) | diff, 1,
                         base).astype(np.int32)

    intra_m = (a_p[..., 4] != 0) | (a_q[..., 4] != 0)
    cbf_m = (a_p[..., 5] != 0) | (a_q[..., 5] != 0)
    bs = np.where(intra_m, 2, np.where(cbf_m, 1, bs_mv))
    if restr.disable_deblock_boundary_strength_one:
        bs = np.where(bs == 1, 2, bs)
    bs = np.where(skip, 0, bs)

    qp_l = (a_p[..., 6] + a_q[..., 6] + 1) >> 1
    qp_c = (a_p[..., 7] + a_q[..., 7] + 1) >> 1
    if restr.disable_deblock_depending_on_qp:
        qp_l = np.full_like(qp_l, 32)
        qp_c = np.full_like(qp_c, 31)
    return {"bs": bs, "qp_l": qp_l.astype(np.int32),
            "qp_c": qp_c.astype(np.int32), "xs": xs}


_TC = np.asarray(dbk.TC_TABLE, np.int32)
_BETA = np.asarray(dbk.BETA_TABLE, np.int32)


def luma_edge_tensors(meta, subblock_size, beta_offset, tc_offset, bitdepth):
    """Expand per-subblock metadata to per-4-row filter groups, oriented
    (n_edges, n_groups)."""
    bs, qp = meta["bs"], meta["qp_l"]
    sh = bitdepth - 8
    idx_b = np.clip(qp + beta_offset, 0, len(_BETA) - 1)
    beta = _BETA[idx_b] << sh
    idx_t = np.clip(qp + tc_offset + 2 * (bs - 1), 0, len(_TC) - 1)
    tc = _TC[idx_t] << sh
    rep = subblock_size // dbk.FILTER_GROUP_SIZE
    mask = (bs > 0)
    expand = lambda a: np.repeat(a, rep, axis=0).T.copy()
    return (expand(mask), expand(tc.astype(np.int32)),
            expand(beta.astype(np.int32)))


def chroma_edge_tensors(meta, direction, subblock_size, tc_offset,
                        bitdepth, csx, csy):
    """Per chroma (edge, row) apply mask + tc, in (transposed-for-dir1)
    chroma coords.  Returns (edges, apply (E, Hc), tc (E, Hc)) or None
    if no chroma edges exist."""
    bs, qp = meta["bs"], meta["qp_c"]
    # scale along the filter direction / along the edge
    es = csx if direction == 0 else csy      # edge-position scale
    rs = csy if direction == 0 else csx      # along-edge (row) scale
    stride_luma = dbk.CHROMA_FILTER_RESOLUTION << es
    col_stride = stride_luma // subblock_size
    if col_stride < 1 or bs.shape[1] < col_stride:
        return None
    sub_bs = bs[:, col_stride - 1::col_stride]
    sub_qp = qp[:, col_stride - 1::col_stride]
    ssb = subblock_size >> rs
    apply = np.repeat(sub_bs == 2, ssb, axis=0).T.copy()
    sh = bitdepth - 8
    idx_t = np.clip(sub_qp + tc_offset + 2, 0, len(_TC) - 1)
    tc = np.repeat(_TC[idx_t] << sh, ssb, axis=0).T.copy()
    edges = (meta["xs"][col_stride - 1::col_stride] >> es).astype(np.int32)
    return edges, apply, tc.astype(np.int32)


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_luma_pass(height, width, subblock_size, bitdepth, flags,
                   n_edges):
    """One luma filter direction as lax.scan over vertical edge strips.
    flags = (disable_initial_decision, disable_strong, disable_weak,
    disable_weak_sample_decision, disable_two_samples_weak)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    (dis_initial, dis_strong, dis_weak, dis_weak_sample,
     dis_two_samples) = flags
    groups = height // dbk.FILTER_GROUP_SIZE
    max_val = (1 << bitdepth) - 1

    def body(plane, xs):
        xe, mask_col, tc_col, beta_col = xs
        strip = lax.dynamic_slice(plane, (0, xe - 4), (height, 8))
        s = strip.reshape(groups, 4, 8).astype(jnp.int32)
        p3, p2, p1, p0 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
        q0, q1, q2, q3 = s[:, :, 4], s[:, :, 5], s[:, :, 6], s[:, :, 7]
        dp = jnp.abs(p2 - 2 * p1 + p0)
        dq = jnp.abs(q0 - 2 * q1 + q2)
        dp0, dp3 = dp[:, 0], dp[:, 3]
        dq0, dq3 = dq[:, 0], dq[:, 3]
        d0 = dp0 + dq0
        d3 = dp3 + dq3
        d = d0 + d3
        beta = beta_col
        tc = tc_col
        act = mask_col & ((d < beta) | bool(dis_initial))

        def chk_strong(i):
            t2 = (jnp.abs(s[:, i, 0] - s[:, i, 3]) +
                  jnp.abs(s[:, i, 4] - s[:, i, 7])) < (beta >> 3)
            t3 = jnp.abs(s[:, i, 3] - s[:, i, 4]) < ((tc * 5 + 1) >> 1)
            return t2 & t3

        strong = (((d0 << 1) < (beta >> 2)) & ((d3 << 1) < (beta >> 2)) &
                  chk_strong(0) & chk_strong(3))
        if dis_strong:
            strong = jnp.zeros_like(strong)

        # strong filter (per group, all 4 rows)
        tc2 = (2 * tc)[:, None]
        np2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        np1 = (p2 + p1 + p0 + q0 + 2) >> 2
        np0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        nq0 = (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3
        nq1 = (p0 + q0 + q1 + q2 + 2) >> 2
        nq2 = (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3
        cl = lambda n, o: o + jnp.clip(n - o, -tc2, tc2)
        strong_cols = [cl(np2, p2), cl(np1, p1), cl(np0, p0),
                       cl(nq0, q0), cl(nq1, q1), cl(nq2, q2)]

        # weak filter
        tcv = tc[:, None]
        delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        wmask = (jnp.abs(delta) < tcv * 10) | bool(dis_weak_sample)
        dlt = jnp.clip(delta, -tcv, tcv)
        wp0 = jnp.clip(p0 + dlt, 0, max_val)
        wq0 = jnp.clip(q0 - dlt, 0, max_val)
        side_thr = (beta + (beta >> 1)) >> 3
        half_tc = (tc >> 1)[:, None]
        fp1 = ((dp0 + dp3) < side_thr)[:, None]
        fq1 = ((dq0 + dq3) < side_thr)[:, None]
        dp1 = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1,
                       -half_tc, half_tc)
        dq1 = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1,
                       -half_tc, half_tc)
        wp1 = jnp.clip(p1 + dp1, 0, max_val)
        wq1 = jnp.clip(q1 + dq1, 0, max_val)
        if dis_two_samples:
            fp1 = jnp.zeros_like(fp1)
            fq1 = jnp.zeros_like(fq1)

        actv = act[:, None]
        strongv = strong[:, None]
        do_strong = actv & strongv
        if dis_weak:
            do_weak = jnp.zeros_like(wmask)
        else:
            do_weak = actv & (~strongv) & wmask
        out = s
        cols_p = {1: p2, 2: p1, 3: p0, 4: q0, 5: q1, 6: q2}
        new_cols = {}
        for j, (sc) in zip((1, 2, 3, 4, 5, 6), strong_cols):
            new_cols[j] = jnp.where(do_strong, sc, cols_p[j])
        new_cols[2] = jnp.where(do_weak & fp1, wp1, new_cols[2])
        new_cols[3] = jnp.where(do_weak, wp0, new_cols[3])
        new_cols[4] = jnp.where(do_weak, wq0, new_cols[4])
        new_cols[5] = jnp.where(do_weak & fq1, wq1, new_cols[5])
        out = out.at[:, :, 1].set(new_cols[1])
        out = out.at[:, :, 2].set(new_cols[2])
        out = out.at[:, :, 3].set(new_cols[3])
        out = out.at[:, :, 4].set(new_cols[4])
        out = out.at[:, :, 5].set(new_cols[5])
        out = out.at[:, :, 6].set(new_cols[6])
        plane = lax.dynamic_update_slice(
            plane, out.reshape(height, 8).astype(plane.dtype), (0, xe - 4))
        return plane, None

    def fn(plane, flat32, xs_off, mask_off, tc_off, beta_off):
        xs = lax.dynamic_slice(flat32, (xs_off,), (n_edges,))
        eg = n_edges * groups
        sl = lambda off: lax.dynamic_slice(flat32, (off,),
                                           (eg,)).reshape(n_edges, groups)
        mask = sl(mask_off) != 0
        tc = sl(tc_off)
        beta = sl(beta_off)
        plane, _ = lax.scan(body, plane, (xs, mask, tc, beta))
        return plane

    from .dsp import jit_cached
    return jit_cached(fn)


@functools.lru_cache(maxsize=None)
def make_chroma_pass(height, n_edges, bitdepth):
    """One chroma filter direction: fully parallel masked update."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    max_val = (1 << bitdepth) - 1

    def fn(plane, flat32, e_off, a_off, t_off):
        edges = lax.dynamic_slice(flat32, (e_off,), (n_edges,))
        eh = n_edges * height
        apply = lax.dynamic_slice(flat32, (a_off,), (eh,)).reshape(
            n_edges, height)
        tc = lax.dynamic_slice(flat32, (t_off,), (eh,)).reshape(
            n_edges, height)
        idx = edges[:, None] + jnp.arange(-2, 2)[None, :]   # (E, 4)
        win = plane[:, idx].astype(jnp.int32)                # (H, E, 4)
        p1, p0 = win[:, :, 0], win[:, :, 1]
        q0, q1 = win[:, :, 2], win[:, :, 3]
        tcv = tc.T
        delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tcv, tcv)
        m = apply.T != 0
        np0 = jnp.where(m, jnp.clip(p0 + delta, 0, max_val), p0)
        nq0 = jnp.where(m, jnp.clip(q0 - delta, 0, max_val), q0)
        rows = jnp.arange(height)[:, None]
        plane = plane.at[rows, (edges - 1)[None, :]].set(
            np0.astype(plane.dtype))
        plane = plane.at[rows, edges[None, :]].set(nq0.astype(plane.dtype))
        return plane

    from .dsp import jit_cached
    return jit_cached(fn)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def deblock_picture_jax(filt):
    """Device deblock for a whole picture; filt is the host
    DeblockingFilter (provides pic/rec/offsets/restrictions)."""
    import jax.numpy as jnp
    pic, rec, r = filt.pic, filt.rec, filt.restr
    subblock_size = dbk.SUBBLOCK_SIZE if \
        r.disable_ext_deblock_subblock_size_4 else dbk.SUBBLOCK_SIZE_EXT
    has_secondary = pic.has_secondary_cu_tree()
    chroma_ok = (pic.max_num_components > 1 and
                 not r.disable_deblock_chroma_filter)
    passes = []  # (cu_tree, subblock, luma?, chroma?)
    if has_secondary:
        passes.append((k.CuTree.PRIMARY, subblock_size, True, False))
        passes.append((k.CuTree.SECONDARY, dbk.SUBBLOCK_SIZE, False,
                       chroma_ok))
    else:
        passes.append((k.CuTree.PRIMARY, subblock_size, True, chroma_ok))

    flags = (bool(r.disable_deblock_initial_sample_decision),
             bool(r.disable_deblock_strong_filter),
             bool(r.disable_deblock_weak_filter),
             bool(r.disable_deblock_weak_sample_decision),
             bool(r.disable_deblock_two_samples_weak_filter))
    bd = pic.bitdepth
    csx, csy = rec.shift_x[1], rec.shift_y[1]

    from . import dsp
    from ..profiling import span
    # phase 1: compute all edge metadata on the host and pack every
    # upload (planes + metadata) into one flat transfer
    built = {}
    work = []  # (direction, kind, payload-handles...)
    batch = dsp.DevBatch()
    plane_handles = {}
    pre = getattr(rec, "_dev_pre_deblock", None)
    rec._dev_pre_deblock = None
    if pre is None:
        pre = {}
    elif not isinstance(pre, dict):
        pre = {0: pre}  # legacy: luma-only device plane
    for comp in range(pic.max_num_components):
        if comp in pre:
            continue  # device-resident from the reconstruction stage
        plane_handles[comp] = batch.add(
            rec.plane_view(comp).astype(np.int16))
    with span("deblock.meta"):
        for direction in (0, 1):
            for cu_tree, sbs, do_luma, do_chroma in passes:
                bkey = (cu_tree,)
                if bkey not in built:
                    built[bkey] = filt._build_cu_maps(cu_tree)
                cu_map, attrs = built[bkey]
                meta = compute_edge_metadata(pic, cu_map, attrs, direction,
                                             sbs, filt.beta_offset,
                                             filt.tc_offset, r)
                if meta["xs"].size == 0:
                    continue
                if do_luma:
                    mask, tc, beta = luma_edge_tensors(
                        meta, sbs, filt.beta_offset, filt.tc_offset, bd)
                    # prune fully-inactive edges (no-op scan steps):
                    # typically well over half the 4-grid edge columns
                    # have bs==0 for every row group
                    act = mask.any(axis=1)
                    xs = meta["xs"].astype(np.int32)[act]
                    mask, tc, beta = mask[act], tc[act], beta[act]
                    if not len(xs):
                        continue
                    pad = dsp.pad_pow2(len(xs)) - len(xs)
                    if pad:
                        # padded steps carry a real edge position with an
                        # all-false mask (exact no-ops)
                        xs = np.concatenate([xs, np.full(pad, xs[-1],
                                                         np.int32)])
                        zf = lambda a: np.concatenate(
                            [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
                        mask, tc, beta = zf(mask), zf(tc), zf(beta)
                    work.append((direction, "luma", sbs,
                                 batch.add(xs),
                                 batch.add(mask.astype(np.int32)),
                                 batch.add(tc), batch.add(beta)))
                if do_chroma:
                    ct = chroma_edge_tensors(meta, direction, sbs,
                                             filt.tc_offset, bd, csx, csy)
                    if ct is None:
                        continue
                    edges, apply, tc = ct
                    if not apply.any():
                        continue
                    work.append((direction, "chroma", len(edges),
                                 batch.add(edges),
                                 batch.add(apply.astype(np.int32)),
                                 batch.add(tc)))
    with span("deblock.upload"):
        batch.upload()

    # phase 2: run the passes with device-resident data
    planes_dev = {comp: batch.get(h) for comp, h in plane_handles.items()}
    planes_dev.update(pre)

    # CTU-row sharding over the mesh (SURVEY.md §2.5 TPU mapping): each
    # filter direction is embarrassingly parallel across the along-edge
    # axis, so the plane is sharded on rows for the vertical-edge pass
    # and re-sharded (XLA all-to-all over ICI) after the transpose so
    # the horizontal-edge pass is row-parallel again — the communication
    # pattern standing in for the reference's single-host in-picture
    # threading.  Bit-exact: the scan dependency runs along the
    # unsharded axis.  (tests/test_sharding.py pins sharded==unsharded.)
    from .. import engine
    # a per-picture device pin (GOP-across-devices decode pipeline)
    # overrides row sharding: the picture is the shard, so its deblock
    # runs whole on the pinned chip
    mesh = engine.get_mesh() if engine.get_pin_device() is None else None

    def shard_rows(x):
        if mesh is None or x.shape[0] % mesh.size != 0:
            return x
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("blk", None)))

    for item in work:
        direction, kind = item[0], item[1]
        if kind == "luma":
            _, _, sbs, hxs, hmask, htc, hbeta = item
            h, w = pic.height, pic.width
            if direction == 1:
                h, w = w, h
            fn = make_luma_pass(h, w, sbs, bd, flags, hxs[3])
            pl = planes_dev[0].T if direction == 1 else planes_dev[0]
            pl = shard_rows(pl)
            f32 = batch.flat(hxs)[0]
            pl = fn(pl, f32, hxs[1], hmask[1], htc[1], hbeta[1])
            planes_dev[0] = pl.T if direction == 1 else pl
        else:
            _, _, n_edges, hedges, happly, htc = item
            hc = rec.height[1] if direction == 0 else rec.width[1]
            fn = make_chroma_pass(hc, n_edges, bd)
            f32 = batch.flat(hedges)[0]
            for comp in (1, 2):
                pl = planes_dev[comp].T if direction == 1 else \
                    planes_dev[comp]
                pl = shard_rows(pl)
                pl = fn(pl, f32, hedges[1], happly[1], htc[1])
                planes_dev[comp] = pl.T if direction == 1 else pl

    # Keep the final planes resident on the device for future MC
    # references: edge-replicate padding (the device pad_border) plus a
    # 64-sample right/bottom margin for bucketed MC windows, written in
    # place into the frame-store superstack (tpu/flat_recon.py).  The
    # host copy (checksums/output) comes back in a single download.
    # Under a mesh the planes carry shardings that must not be folded
    # into the (single-device) superstack: keep the per-picture device
    # cache the sharded reconstructor consumes instead.
    from .flat_recon import device_pad_planes, frame_store_put
    dev_cache = device_pad_planes(
        rec, {c: planes_dev[c] for c in range(pic.max_num_components)})
    if mesh is None:
        frame_store_put(rec, dev_cache)
    else:
        rec._dev_planes = dev_cache
    with span("deblock.download"):
        flat, offs = dsp.gather_flat(
            [planes_dev[c] for c in range(pic.max_num_components)])
    for comp in range(pic.max_num_components):
        off, shape = offs[comp]
        rec.plane_view(comp)[:] = \
            flat[off:off + int(np.prod(shape))].reshape(shape)
