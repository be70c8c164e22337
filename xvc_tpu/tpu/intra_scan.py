"""Whole-picture intra luma reconstruction as ONE jitted lax.scan.

The codec's inherently sequential tail — intra prediction reads the
reconstructed neighbours of each CU — expressed as a device scan over
the leaf CUs in decode order: each step gathers the reference line from
the evolving picture plane, predicts (planar / DC / angular with the
exact integer semantics of ref: src/xvc_common_lib/intra_prediction.cc:
365-558,707-871), adds the residual and writes the block back with a
masked dynamic update.  One dispatch reconstructs every intra luma
block of the picture; there are no host round trips per CU.

All work runs on a padded 64x64 domain with the block geometry as data
(traced scalars), so one compiled program covers every CU size and
mode.  Exactness vs the host path is pinned by
tests/test_intra_scan.py and the golden decode matrix.

Scope: luma, default (unrestricted) intra toolset, 67-mode set.  Chroma
(incl. LM) and restricted configs stay on the host; pictures with LIC
fall back entirely (LIC blocks interleave with intra in decode order).
"""
import functools

import numpy as np

from ..ops import intra_pred as ip

PAD_TL = 8      # plane padding top/left (ref line reads at -1)
PAD_BR = 200    # right/bottom (64x64 window + 128-long ref line reads)
LINE = 320      # >= 3*64 + 2*64 (the availability line buffer)
RLEN = 256      # >= base(65) + 129 (projected angular reference line)

# metadata record layout (int32): one row per leaf
M_PX, M_PY, M_W, M_H, M_MODE, M_HAS_L, M_HAS_A, M_HAS_AL, M_SBL, \
    M_SAR, M_ACTIVE = range(11)
META_COLS = 11


def plane_pad(vis_plane, dtype=np.int16):
    """Host: pad a visible plane for the scan's window reads.  Total
    dims round up to multiples of 128 so the compiled scan is shared
    across picture sizes."""
    h, w = vis_plane.shape
    ph = -(-(h + PAD_TL + PAD_BR) // 128) * 128
    pw = -(-(w + PAD_TL + PAD_BR) // 128) * 128
    return np.pad(np.ascontiguousarray(vis_plane, np.int32),
                  ((PAD_TL, ph - h - PAD_TL),
                   (PAD_TL, pw - w - PAD_TL))).astype(dtype)


@functools.lru_cache(maxsize=None)
def make_intra_scan(plane_h, plane_w, bitdepth):
    """Returns jitted fn(plane int16 (Hp,Wp), resi int16 (Hp,Wp),
    meta int32 (N, META_COLS)) -> plane int16.

    plane/resi are padded with plane_pad (same origin offset PAD_TL)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dc_def = 1 << (bitdepth - 1)
    max_val = (1 << bitdepth) - 1
    angle_tab = jnp.asarray(np.asarray(ip.ANGLE_TABLE_EXT, np.int32))
    inv_tab = jnp.asarray(np.asarray(ip.INV_ANGLE_TABLE_EXT, np.int32))
    thr_ext = jnp.asarray(np.asarray((0, 20, 20, 14, 2, 0, 20, 0),
                                     np.int32))
    HOR, VER, DIAG = 18, 50, 34
    j64 = jnp.arange(64)
    jl = jnp.arange(LINE)
    j129 = jnp.arange(129)
    j128 = jnp.arange(128)

    def ref_line(plane, px, py, w, h, has_li, has_ai, has_ali, sbl, sar):
        """compute_ref_samples as masked gathers over the line buffer
        (ref: intra_prediction.cc:707-848).  Returns (top[129],
        left[128]) int32."""
        has_l = has_li != 0
        has_a = has_ai != 0
        has_al = has_ali != 0
        ppx = px + PAD_TL
        ppy = py + PAD_TL
        # strips: left column (rows py..py+127 at px-1), top row
        # (cols px-1..px+128 at py-1)
        colv = lax.dynamic_slice(plane, (ppy, ppx - 1),
                                 (128, 1))[:, 0].astype(jnp.int32)
        rowv = lax.dynamic_slice(plane, (ppy - 1, ppx - 1),
                                 (1, 130))[0].astype(jnp.int32)
        corner = rowv[0]
        ls = w + h           # left_size
        tls = w              # top_left_size
        base = ls + tls      # start of top row in line space

        line = jnp.full((LINE,), dc_def, jnp.int32)
        # left part: j in [0, ls); i = ls-1-j (distance down the column)
        i_left = ls - 1 - jl
        lv_real = colv[jnp.clip(i_left, 0, 127)]
        pad_v = colv[jnp.clip(h + sbl - 1, 0, 127)]
        lv = jnp.where(i_left < h + sbl, lv_real, pad_v)
        line = jnp.where((jl < ls) & has_l, lv, line)
        # above-left corner run: j in [ls, ls+tls)
        line = jnp.where((jl >= ls) & (jl < ls + tls) & has_al, corner,
                         line)
        # top row: j in [base, base+w): rowv[1 + (j-base)]
        tv = rowv[jnp.clip(jl - base + 1, 0, 129)]
        line = jnp.where((jl >= base) & (jl < base + w) & has_a, tv, line)
        # above-right: j in [base+w, base+w+h): real for first sar then
        # replicate
        ar_i = jl - (base + w)
        ar_real = rowv[jnp.clip(1 + w + ar_i, 0, 129)]
        ar_pad = rowv[jnp.clip(w + sar, 0, 129)]
        arv = jnp.where(ar_i < sar, ar_real, ar_pad)
        line = jnp.where((jl >= base + w) & (jl < base + w + h) &
                         has_a & (sar > 0), arv, line)

        # default directional padding (disable_intra_ref_padding == 0)
        def at(idx):
            return line[jnp.clip(idx, 0, LINE - 1)]

        # 1) below-left absent: fill j < w from the nearest available
        ref_bl = jnp.where(has_l, at(w),
                           jnp.where(has_al, at(ls),
                                     jnp.where(has_a, at(ls + tls),
                                               at(ls + tls + w))))
        line = jnp.where((jl < w) & (sbl == 0), ref_bl, line)
        # 2) left absent: j in [w, w+h) <- line[w-1]
        line = jnp.where((jl >= w) & (jl < w + h) & (~has_l),
                         at(w - 1), line)
        # 3) corner absent: j in [ls, ls+tls) <- line[ls-1]
        line = jnp.where((jl >= ls) & (jl < ls + tls) & (~has_al),
                         at(ls - 1), line)
        # 4) above absent: j in [base, base+w) <- line[base-1]
        line = jnp.where((jl >= base) & (jl < base + w) & (~has_a),
                         at(base - 1), line)
        # 5) above-right absent: j in [base+w, base+w+h) <- line[base+w-1]
        line = jnp.where((jl >= base + w) & (jl < base + w + h) &
                         (sar == 0), at(base + w - 1), line)

        has_any = has_l | has_a | has_al | (sbl > 0) | (sar > 0)
        line = jnp.where(has_any, line, dc_def)

        # top[x] = line[base - 1 + x] (x in [0, w+h]); left[i] =
        # line[ls - 1 - i]
        top = line[jnp.clip(base - 1 + j129, 0, LINE - 1)]
        top = jnp.where(j129 <= w + h, top, dc_def)
        left = line[jnp.clip(ls - 1 - j128, 0, LINE - 1)]
        left = jnp.where(j128 < w + h, left, dc_def)
        return top, left

    def filt_refs(top, left, w, h):
        """[1 2 1] reference filter (ref: intra_prediction.cc:850-871)."""
        n = w + h
        t_m1 = top[jnp.clip(j129 - 1, 0, 128)]
        t_p1 = top[jnp.clip(j129 + 1, 0, 128)]
        ft = ((top << 1) + t_m1 + t_p1 + 2) >> 2
        ft0 = ((top[0] << 1) + top[1] + left[0] + 2) >> 2
        ft = jnp.where(j129 == 0, ft0, ft)
        ft = jnp.where(j129 >= n, top, ft)  # ftop[n] = top[n]
        l_m1 = left[jnp.clip(j128 - 1, 0, 127)]
        l_p1 = left[jnp.clip(j128 + 1, 0, 127)]
        fl = ((left << 1) + l_m1 + l_p1 + 2) >> 2
        fl0 = ((left[0] << 1) + top[0] + left[1] + 2) >> 2
        fl = jnp.where(j128 == 0, fl0, fl)
        fl = jnp.where(j128 >= n - 1, left, fl)  # fleft[n-1] = left[n-1]
        return ft, fl

    yy = j64[:, None]
    xx = j64[None, :]

    def pred_planar(top, left, w, h, wl2, hl2):
        above = top[jnp.clip(1 + xx, 0, 128)]
        leftv = left[jnp.clip(yy, 0, 127)]
        tr = top[jnp.clip(1 + w, 0, 128)]
        bl = left[jnp.clip(h, 0, 127)]
        shift = wl2 + hl2 + 1
        hor = (h - 1 - yy) * above + (yy + 1) * bl
        ver = (w - 1 - xx) * leftv + (xx + 1) * tr
        return ((hor << wl2) + (ver << hl2) + (1 << (shift - 1))) >> shift

    def pred_dc(top, left, w, h, post):
        tsum = jnp.sum(jnp.where((j129 >= 1) & (j129 <= w), top, 0))
        lsum = jnp.sum(jnp.where(j128 < h, left, 0))
        total = w + h
        dc = (tsum + lsum + (total >> 1)) // total
        out = jnp.full((64, 64), dc, jnp.int32)
        lcol = left[jnp.clip(yy, 0, 127)]
        trow = top[jnp.clip(1 + xx, 0, 128)]
        f_col = (lcol + 3 * out + 2) >> 2
        f_row = (trow + 3 * out + 2) >> 2
        f_00 = (top[1] + left[0] + 2 * dc + 2) >> 2
        out = jnp.where(post & (xx == 0) & (yy > 0), f_col, out)
        out = jnp.where(post & (yy == 0) & (xx > 0), f_row, out)
        out = jnp.where(post & (xx == 0) & (yy == 0), f_00, out)
        return out

    def pred_angular(top, left, w, h, mode, post):
        is_hor = mode < DIAG
        # flip: left becomes the top line (ref: intra_prediction.cc:437)
        ft = jnp.where(j129 == 0, top[0],
                       left[jnp.clip(j129 - 1, 0, 127)])
        fl = top[jnp.clip(1 + j128, 0, 128)]
        t = jnp.where(is_hor, ft, top)
        l = jnp.where(is_hor, fl, left)
        wp = jnp.where(is_hor, h, w)
        hp = jnp.where(is_hor, w, h)
        angle_offset = jnp.where(is_hor, HOR - mode, mode - VER)
        angle = angle_tab[jnp.clip(16 + angle_offset, 0, 32)]
        inv_angle = inv_tab[jnp.clip(-angle_offset - 1, 0, 15)]

        num_proj = jnp.where(angle < 0, -((hp * angle) >> 5) - 1, 0)
        base = jnp.where(angle < 0, num_proj + 1, 1)
        # reference line by closed-form gather (no sequential build)
        jr = jnp.arange(RLEN)
        d = jr - base
        proj_i = -d - 2
        proj_idx = ((128 + (proj_i + 1) * inv_angle) >> 8) - 1
        rv = jnp.where(d >= -1,
                       t[jnp.clip(d + 1, 0, 128)],
                       l[jnp.clip(proj_idx, 0, 127)])
        # rows
        asum = (yy + 1) * angle
        offset = asum >> 5
        iw = asum & 31
        idx0 = jnp.clip(base + offset + xx, 0, RLEN - 1)
        s0 = rv[idx0]
        s1 = rv[jnp.clip(idx0 + 1, 0, RLEN - 1)]
        interp = ((32 - iw) * s0 + iw * s1 + 16) >> 5
        out = jnp.where(iw != 0, interp, s0)
        # post filters on column 0
        lcol = l[jnp.clip(yy, 0, 127)]
        pf_copy = jnp.clip(t[1] + ((lcol - t[0]) >> 1), 0, max_val)
        pf_near = jnp.clip(out + ((lcol - t[0]) >> 2), 0, max_val)
        out = jnp.where(post & (angle == 0) & (xx == 0), pf_copy, out)
        out = jnp.where(post & (angle != 0) & (jnp.abs(angle) <= 1) &
                        (xx == 0), pf_near, out)
        # un-flip
        return jnp.where(is_hor, out.T, out)

    def step(plane_resi, meta):
        plane, resi = plane_resi
        px, py, w, h = meta[M_PX], meta[M_PY], meta[M_W], meta[M_H]
        mode = meta[M_MODE]
        active = meta[M_ACTIVE] != 0
        # integer log2 (block dims are in {4,8,16,32,64})
        wl2 = jnp.where(w == 4, 2, jnp.where(w == 8, 3, jnp.where(
            w == 16, 4, jnp.where(w == 32, 5, 6))))
        hl2 = jnp.where(h == 4, 2, jnp.where(h == 8, 3, jnp.where(
            h == 16, 4, jnp.where(h == 32, 5, 6))))

        top, left = ref_line(plane, px, py, w, h,
                             meta[M_HAS_L], meta[M_HAS_A], meta[M_HAS_AL],
                             meta[M_SBL], meta[M_SAR])
        # use_filtered_ref_samples (ref: intra_prediction.cc:342-363);
        # note planar (mode 0) DOES use filtered refs when selected, DC
        # takes the raw line regardless (host predict dispatch).
        size = (wl2 + hl2) >> 1
        mode_diff = jnp.minimum(jnp.abs(mode - HOR), jnp.abs(mode - VER))
        use_filt = mode_diff > thr_ext[jnp.clip(size, 0, 7)]
        ftop, fleft = filt_refs(top, left, w, h)
        stop = jnp.where(use_filt, ftop, top)
        sleft = jnp.where(use_filt, fleft, left)

        post = (w <= 16) & (h <= 16)
        branch = jnp.clip(mode, 0, 2)  # 0=planar 1=dc 2=angular
        pred = lax.switch(
            branch,
            [lambda: pred_planar(stop, sleft, w, h, wl2, hl2),
             lambda: pred_dc(top, left, w, h, post),
             lambda: pred_angular(stop, sleft, w, h, mode, post)])

        rwin = lax.dynamic_slice(resi, (py + PAD_TL, px + PAD_TL),
                                 (64, 64)).astype(jnp.int32)
        reco = jnp.clip(pred + rwin, 0, max_val)
        win = lax.dynamic_slice(plane, (py + PAD_TL, px + PAD_TL),
                                (64, 64))
        mask = active & (yy < h) & (xx < w)
        new = jnp.where(mask, reco.astype(jnp.int16), win)
        plane = lax.dynamic_update_slice(plane, new,
                                         (py + PAD_TL, px + PAD_TL))
        return (plane, resi), None

    def fn(plane, resi, meta):
        (plane, _), _ = lax.scan(step, (plane, resi), meta)
        return plane

    from .dsp import jit_cached
    return jit_cached(fn)


# chroma metadata record layout: adds the plane index (0=u, 1=v) and the
# LM flag; modes are the resolved chroma modes (DM already mapped)
C_PLANE, C_PX, C_PY, C_W, C_H, C_MODE, C_IS_LM, C_HAS_L, C_HAS_A, \
    C_HAS_AL, C_SBL, C_SAR, C_ACTIVE = range(13)
CMETA_COLS = 13


@functools.lru_cache(maxsize=None)
def make_intra_chroma_scan(plane_h, plane_w, luma_h, luma_w, bitdepth):
    """Whole-picture intra CHROMA reconstruction (4:2:0) as one scan.

    Returns jitted fn(planes int16 (2,Hp,Wp), resi int32 (2,Hp,Wp),
    luma int16 (HpL,WpL), meta int32 (N, CMETA_COLS)) -> planes.

    Covers planar/DC/angular/DM (resolved at collect time) and LM-chroma
    (ref: intra_prediction.cc:560-686): the linear-model parameters are
    derived on device from the evolving chroma planes and the final
    reconstructed luma (which the luma scan leaves device-resident).
    Bit-exact vs the host path; pinned by the golden decode matrix with
    XVC_DSP=jax and tests/test_jax_decode.py.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    dc_def = 1 << (bitdepth - 1)
    max_val = (1 << bitdepth) - 1
    angle_tab = jnp.asarray(np.asarray(ip.ANGLE_TABLE_EXT, np.int32))
    inv_tab = jnp.asarray(np.asarray(ip.INV_ANGLE_TABLE_EXT, np.int32))
    HOR, VER, DIAG = 18, 50, 34
    j64 = jnp.arange(64)
    jl = jnp.arange(LINE)
    j129 = jnp.arange(129)
    j128 = jnp.arange(128)
    yy = j64[:, None]
    xx = j64[None, :]
    j33 = jnp.arange(33)
    g33y = j33[:, None]
    g33x = j33[None, :]

    def ref_line(planes, pi, px, py, w, h, has_li, has_ai, has_ali, sbl,
                 sar):
        has_l = has_li != 0
        has_a = has_ai != 0
        has_al = has_ali != 0
        ppx = px + PAD_TL
        ppy = py + PAD_TL
        colv = lax.dynamic_slice(planes, (pi, ppy, ppx - 1),
                                 (1, 128, 1))[0, :, 0].astype(jnp.int32)
        rowv = lax.dynamic_slice(planes, (pi, ppy - 1, ppx - 1),
                                 (1, 1, 130))[0, 0].astype(jnp.int32)
        corner = rowv[0]
        ls = w + h
        tls = w
        base = ls + tls
        line = jnp.full((LINE,), dc_def, jnp.int32)
        i_left = ls - 1 - jl
        lv_real = colv[jnp.clip(i_left, 0, 127)]
        pad_v = colv[jnp.clip(h + sbl - 1, 0, 127)]
        lv = jnp.where(i_left < h + sbl, lv_real, pad_v)
        line = jnp.where((jl < ls) & has_l, lv, line)
        line = jnp.where((jl >= ls) & (jl < ls + tls) & has_al, corner,
                         line)
        tv = rowv[jnp.clip(jl - base + 1, 0, 129)]
        line = jnp.where((jl >= base) & (jl < base + w) & has_a, tv, line)
        ar_i = jl - (base + w)
        ar_real = rowv[jnp.clip(1 + w + ar_i, 0, 129)]
        ar_pad = rowv[jnp.clip(w + sar, 0, 129)]
        arv = jnp.where(ar_i < sar, ar_real, ar_pad)
        line = jnp.where((jl >= base + w) & (jl < base + w + h) &
                         has_a & (sar > 0), arv, line)

        def at(idx):
            return line[jnp.clip(idx, 0, LINE - 1)]

        ref_bl = jnp.where(has_l, at(w),
                           jnp.where(has_al, at(ls),
                                     jnp.where(has_a, at(ls + tls),
                                               at(ls + tls + w))))
        line = jnp.where((jl < w) & (sbl == 0), ref_bl, line)
        line = jnp.where((jl >= w) & (jl < w + h) & (~has_l),
                         at(w - 1), line)
        line = jnp.where((jl >= ls) & (jl < ls + tls) & (~has_al),
                         at(ls - 1), line)
        line = jnp.where((jl >= base) & (jl < base + w) & (~has_a),
                         at(base - 1), line)
        line = jnp.where((jl >= base + w) & (jl < base + w + h) &
                         (sar == 0), at(base + w - 1), line)
        has_any = has_l | has_a | has_al | (sbl > 0) | (sar > 0)
        line = jnp.where(has_any, line, dc_def)
        top = line[jnp.clip(base - 1 + j129, 0, LINE - 1)]
        top = jnp.where(j129 <= w + h, top, dc_def)
        left = line[jnp.clip(ls - 1 - j128, 0, LINE - 1)]
        left = jnp.where(j128 < w + h, left, dc_def)
        return top, left

    def pred_planar(top, left, w, h, wl2, hl2):
        above = top[jnp.clip(1 + xx, 0, 128)]
        leftv = left[jnp.clip(yy, 0, 127)]
        tr = top[jnp.clip(1 + w, 0, 128)]
        bl = left[jnp.clip(h, 0, 127)]
        shift = wl2 + hl2 + 1
        hor = (h - 1 - yy) * above + (yy + 1) * bl
        ver = (w - 1 - xx) * leftv + (xx + 1) * tr
        return ((hor << wl2) + (ver << hl2) + (1 << (shift - 1))) >> shift

    def pred_dc(top, left, w, h):
        tsum = jnp.sum(jnp.where((j129 >= 1) & (j129 <= w), top, 0))
        lsum = jnp.sum(jnp.where(j128 < h, left, 0))
        total = w + h
        dc = (tsum + lsum + (total >> 1)) // total
        return jnp.full((64, 64), dc, jnp.int32)

    def pred_angular(top, left, w, h, mode):
        is_hor = mode < DIAG
        ft = jnp.where(j129 == 0, top[0],
                       left[jnp.clip(j129 - 1, 0, 127)])
        fl = top[jnp.clip(1 + j128, 0, 128)]
        t = jnp.where(is_hor, ft, top)
        l = jnp.where(is_hor, fl, left)
        hp = jnp.where(is_hor, w, h)
        angle_offset = jnp.where(is_hor, HOR - mode, mode - VER)
        angle = angle_tab[jnp.clip(16 + angle_offset, 0, 32)]
        inv_angle = inv_tab[jnp.clip(-angle_offset - 1, 0, 15)]
        num_proj = jnp.where(angle < 0, -((hp * angle) >> 5) - 1, 0)
        base = jnp.where(angle < 0, num_proj + 1, 1)
        jr = jnp.arange(RLEN)
        d = jr - base
        proj_i = -d - 2
        proj_idx = ((128 + (proj_i + 1) * inv_angle) >> 8) - 1
        rv = jnp.where(d >= -1,
                       t[jnp.clip(d + 1, 0, 128)],
                       l[jnp.clip(proj_idx, 0, 127)])
        asum = (yy + 1) * angle
        offset = asum >> 5
        iw = asum & 31
        idx0 = jnp.clip(base + offset + xx, 0, RLEN - 1)
        s0 = rv[idx0]
        s1 = rv[jnp.clip(idx0 + 1, 0, RLEN - 1)]
        interp = ((32 - iw) * s0 + iw * s1 + 16) >> 5
        out = jnp.where(iw != 0, interp, s0)
        return jnp.where(is_hor, out.T, out)

    def rescale_luma(luma, px, py, w, h, has_l, has_a):
        """4:2:0 luma downsample on the (h+1, w+1) LM grid
        (ref: intra_prediction.cc:873-954); grid row/col 0 hold the
        above/left reference positions."""
        lx = 2 * px
        ly = 2 * py
        # window rows ly-2 .. ly+2h+1, cols lx-4 .. lx+2w+3 -> (68, 72)
        win = lax.dynamic_slice(
            luma, (ly - 2 + PAD_TL, lx - 4 + PAD_TL),
            (68, 72)).astype(jnp.int32)

        def L(r, c):
            # r, c relative to (ly-2, lx-4); r = 2*gy + dr etc.
            return win[jnp.clip(r, 0, 67), jnp.clip(c, 0, 71)]

        # interior + top row: yi = gy - 1 in [-1, h); xi = gx - 1
        gy = g33y
        gx = g33x
        yi = gy - 1
        xi = gx - 1
        ry = 2 + 2 * yi          # window row of luma row ly + 2*yi
        cxl = 4 + 2 * xi         # window col of luma col lx + 2*xi
        six = (L(ry, cxl - 1) + 2 * L(ry, cxl) + L(ry, cxl + 1) +
               L(ry + 1, cxl - 1) + 2 * L(ry + 1, cxl) +
               L(ry + 1, cxl + 1))
        interior = (six + 4) >> 3
        # left reference column (gx == 0), present only when has_l
        sl = (L(ry, 1) + 2 * L(ry, 2) + L(ry, 3) +
              L(ry + 1, 1) + 2 * L(ry + 1, 2) + L(ry + 1, 3))
        left_col = (sl + 4) >> 3
        # no-left fallback writes grid col 1 with the 2-tap average
        nl = (L(ry, 4) + L(ry + 1, 4) + 1) >> 1
        out = jnp.zeros((33, 33), jnp.int32)
        valid_y = jnp.where(has_a != 0, yi >= -1, yi >= 0)
        out = jnp.where((gx >= 1) & valid_y & (yi < h) & (xi < w) &
                        ((has_l != 0) | (xi >= 1) | (gx == 1)),
                        jnp.where((has_l == 0) & (gx == 1), nl, interior),
                        out)
        out = jnp.where((gx == 0) & valid_y & (yi < h) & (has_l != 0),
                        left_col, out)
        return out

    def derive_lm(sub, top, left, w, h, has_a, has_l):
        """derive_lm_params (ops/intra_pred.py:304-387), int32 exact for
        bitdepth <= 12."""
        # neighbour strides (reference loops step dx/dy)
        dx = jnp.where((has_l != 0) & (w // h > 1), w // h, 1)
        dy = jnp.where((has_a != 0) & (h // w > 1), h // w, 1)
        am = (j64 < w) & (j64 % dx == 0) & (has_a != 0)
        lm = (j64 < h) & (j64 % dy == 0) & (has_l != 0)
        ra = sub[0, jnp.clip(1 + j64, 0, 32)]
        rl = sub[jnp.clip(1 + j64, 0, 32), 0]
        sa = top[jnp.clip(1 + j64, 0, 128)]   # chroma above row
        sl = left[jnp.clip(j64, 0, 127)]      # chroma left col
        sum_x = jnp.sum(jnp.where(am, ra, 0)) + jnp.sum(jnp.where(lm, rl, 0))
        sum_y = jnp.sum(jnp.where(am, sa, 0)) + jnp.sum(jnp.where(lm, sl, 0))
        sum_xx = jnp.sum(jnp.where(am, ra * ra, 0)) + \
            jnp.sum(jnp.where(lm, rl * rl, 0))
        sum_xy = jnp.sum(jnp.where(am, ra * sa, 0)) + \
            jnp.sum(jnp.where(lm, rl * sl, 0))
        nbr = jnp.sum(am.astype(jnp.int32)) + jnp.sum(lm.astype(jnp.int32))

        def log2floor(v):
            return 31 - jnp.clip(lax.clz(jnp.maximum(v, 1)), 0, 31)

        size_shift = jnp.maximum(log2floor(nbr) +
                                 jnp.where((1 << log2floor(nbr)) < nbr, 1,
                                           0), 1)
        over = size_shift - (15 - bitdepth)
        sh = jnp.maximum(over, 0)
        rnd = jnp.where(sh > 0, 1 << jnp.maximum(sh - 1, 0), 0)
        sum_x = jnp.where(sh > 0, (sum_x + rnd) >> sh, sum_x)
        sum_y = jnp.where(sh > 0, (sum_y + rnd) >> sh, sum_y)
        sum_xx = jnp.where(sh > 0, (sum_xx + rnd) >> sh, sum_xx)
        sum_xy = jnp.where(sh > 0, (sum_xy + rnd) >> sh, sum_xy)
        size_shift = size_shift - sh
        avg_x = sum_x >> size_shift
        avg_y = sum_y >> size_shift
        x_frac = sum_x & ((1 << size_shift) - 1)
        y_frac = sum_y & ((1 << size_shift) - 1)
        stddev_xy = sum_xy - ((avg_x * avg_y) << size_shift) - \
            avg_x * y_frac - avg_y * x_frac
        stddev_xx = sum_xx - ((avg_x * avg_x) << size_shift) - \
            2 * avg_x * x_frac
        shift_xy = jnp.where(stddev_xy == 0, 0,
                             jnp.maximum(log2floor(jnp.abs(stddev_xy)) -
                                         bitdepth + 2, 0))
        shift_xx = jnp.where(stddev_xx == 0, 0,
                             jnp.maximum(log2floor(jnp.abs(stddev_xx)) - 5,
                                         0))
        sxy_sh = stddev_xy >> shift_xy
        sxx_sh = stddev_xx >> shift_xx
        total_shift = bitdepth + shift_xx + 4 + 7 - 13 - shift_xy
        degenerate = sxx_sh < (1 << 5)
        q = ((1 << (bitdepth + 4)) + sxx_sh // 2) // jnp.maximum(sxx_sh, 1)
        scale = sxy_sh * q
        scale = jnp.where(total_shift >= 0, scale >> total_shift,
                          scale << (-total_shift))
        lim = 1 << (15 - 7)
        scale = (1 << 7) * jnp.clip(scale, -lim, lim - 1)
        base_v = jnp.where(scale < 0, -scale - 1, scale)
        base_shift = log2floor(base_v) - jnp.where(scale != 0, 5, 0)
        shift = 13 - base_shift
        scale = jnp.where(base_shift >= 0, scale >> base_shift,
                          scale << (-base_shift))
        offset = avg_y - ((scale * avg_x) >> shift)
        # no-neighbour / degenerate fallbacks
        none_avail = (has_a == 0) & (has_l == 0)
        scale = jnp.where(degenerate | none_avail, 0, scale)
        offset = jnp.where(none_avail, dc_def,
                           jnp.where(degenerate, avg_y, offset))
        shift = jnp.where(degenerate | none_avail, 0, shift)
        return scale, offset, shift

    def pred_lm(luma, top, left, px, py, w, h, has_a, has_l):
        sub = rescale_luma(luma, px, py, w, h, has_l, has_a)
        scale, offset, shift = derive_lm(sub, top, left, w, h, has_a,
                                         has_l)
        blk = sub[jnp.clip(1 + yy, 0, 32), jnp.clip(1 + xx, 0, 32)]
        return jnp.clip(((scale * blk) >> shift) + offset, 0, max_val)

    def step(carry, meta):
        planes, resi, luma = carry
        pi = meta[C_PLANE]
        px, py, w, h = meta[C_PX], meta[C_PY], meta[C_W], meta[C_H]
        mode = meta[C_MODE]
        is_lm = meta[C_IS_LM] != 0
        active = meta[C_ACTIVE] != 0
        wl2 = jnp.where(w == 2, 1, jnp.where(w == 4, 2, jnp.where(
            w == 8, 3, jnp.where(w == 16, 4, jnp.where(w == 32, 5, 6)))))
        hl2 = jnp.where(h == 2, 1, jnp.where(h == 4, 2, jnp.where(
            h == 8, 3, jnp.where(h == 16, 4, jnp.where(h == 32, 5, 6)))))
        top, left = ref_line(planes, pi, px, py, w, h,
                             meta[C_HAS_L], meta[C_HAS_A],
                             meta[C_HAS_AL], meta[C_SBL], meta[C_SAR])
        branch = jnp.where(is_lm, 3, jnp.clip(mode, 0, 2))
        pred = lax.switch(
            branch,
            [lambda: pred_planar(top, left, w, h, wl2, hl2),
             lambda: pred_dc(top, left, w, h),
             lambda: pred_angular(top, left, w, h, mode),
             lambda: pred_lm(luma, top, left, px, py, w, h,
                             meta[C_HAS_A], meta[C_HAS_L])])
        rwin = lax.dynamic_slice(resi, (pi, py + PAD_TL, px + PAD_TL),
                                 (1, 64, 64))[0]
        reco = jnp.clip(pred + rwin, 0, max_val)
        win = lax.dynamic_slice(planes, (pi, py + PAD_TL, px + PAD_TL),
                                (1, 64, 64))
        mask = active & (yy < h) & (xx < w)
        new = jnp.where(mask, reco.astype(jnp.int16), win[0])
        planes = lax.dynamic_update_slice(planes, new[None],
                                          (pi, py + PAD_TL, px + PAD_TL))
        return (planes, resi, luma), None

    def fn(planes, resi, luma, meta):
        (planes, _, _), _ = lax.scan(step, (planes, resi, luma), meta)
        return planes

    from .dsp import jit_cached
    return jit_cached(fn)
