"""Bottom-up batched CU split RDO from device cost maps.

The reference decides the CU tree by top-down mutate-and-backtrack
recursion, fully coding every node at every level
(ref: src/xvc_enc_lib/cu_encoder.cc:123-273).  This module is the
split-decision stage of the TPU-first redesign (SURVEY.md §7 stage 4):

  * the open-loop 67-mode SATD cost maps of EVERY aligned square block
    of the picture come from a handful of batched device dispatches
    (tpu/lookahead.py, one per block size),
  * for inter pictures, open-loop zero-MV SAD maps against the
    reference pictures' original planes add the inter leaf costs
    (frame_zero_mv_sad below, one fused dispatch),
  * the split tree is then settled by a vectorized bottom-up dynamic
    program that runs ON DEVICE (one jitted call): leaf vs binary
    (hor/ver, shared-mode rectangle estimates) vs quad at every node —
    fixed tensor stages instead of recursion.

Because the costs are open-loop proxies (references from original
pictures, no reconstruction loop), the DP only FORCES a decision where
the margin is decisive; ambiguous nodes keep the encoder's normal full
search.  FORCE_LEAF only disables the quad arm (binary splits are
still searched, matching the comparator: nonquad vs quad);
FORCE_SPLIT disables the leaf and binary arms and is only emitted when
quad beats the best non-quad arrangement decisively.

The force maps feed both the Python twin (codec/cu_encoder.py) and the
native production encoder (native/xvcn_enc.inc enc_compress_cu), so
`speed_mode 3` = reference fast mode + device split DP.  The resulting
bitstream differs from the reference (decisions are forced) but stays
conforming; tests/test_wavefront_rdo.py pins RD proximity.

Cost model (integer, like the encoder's SATD pre-pass
ref: src/xvc_enc_lib/intra_search.cc:189-250):

  leaf(n)   = min(min_mode satd[n], zero_mv_sad[n]) + mode_cost
  rect(n)   = shared-mode pair of two n/2 squares + mode_cost
  hor/ver   = two rects + split_cost
  quad(n)   = sum of 4 best(n/2) + split_cost
  best(n)   = min(leaf, hor, ver, quad)

force split where quad * MARGIN_NUM < nonquad * MARGIN_DEN,
force leaf  where nonquad * MARGIN_NUM < quad * MARGIN_DEN.
"""
import functools

import numpy as np

# decisive-margin ratio (5%): only force when one side wins by this.
# Forcing requires a decisive win: e.g. force split only when
# quad * MARGIN_NUM < nonquad * MARGIN_DEN with NUM > DEN, i.e. the
# quad cost is at least NUM/DEN-1 = 5% below the best non-quad cost.
# Near-ties satisfy neither inequality and stay UNDECIDED.  Measured on
# the bench 720p LD content: identical stream bytes to the full search
# at both 10%% and 5%%, so the tighter margin is free speedup.
MARGIN_NUM, MARGIN_DEN = 21, 20
# signaling-bit estimates at sqrt-lambda (coarse; absorbed by margin)
MODE_BITS = 5.0
SPLIT_BITS = 2.0

FORCE_SPLIT = 1
FORCE_LEAF = -1
UNDECIDED = 0


@functools.lru_cache(maxsize=None)
def _dp_fn(shape_key, sizes, have_inter, max_binary_size,
           allow_force_split):
    """Jitted bottom-up split DP over the per-size cost maps.

    shape_key: ((n, bh, bw, modes) ...) static map shapes.
    Returns fn(maps..., [sads...,] mode_cost, split_cost)
    -> tuple of int8 force maps for every n with a child map."""
    import jax
    import jax.numpy as jnp

    shapes = dict((n, s) for n, *s in shape_key)

    def fn(*args):
        n_maps = len(shapes)
        maps = dict(zip(sorted(shapes), args[:n_maps]))
        pos = n_maps
        sads = None
        if have_inter:
            sads = dict(zip(sorted(shapes), args[pos:pos + n_maps]))
            pos += n_maps
        mode_cost, split_cost = args[pos], args[pos + 1]

        def floor_grid(n):
            # common full-block grid across intra/inter maps
            bh = shapes[n][0]
            bw = shapes[n][1]
            if sads is not None:
                bh = min(bh, sads[n].shape[0])
                bw = min(bw, sads[n].shape[1])
            return bh, bw

        best = {}
        nonquad = {}
        quad = {}
        for n in sorted(shapes):
            m = maps[n].astype(jnp.int32)
            bh, bw = floor_grid(n)
            m = m[:bh, :bw]
            sq_min = m.min(axis=-1)
            if sads is not None:
                sq_min = jnp.minimum(sq_min,
                                     sads[n][:bh, :bw].astype(jnp.int32))
            leaf = sq_min + mode_cost
            half = n // 2
            if half not in shapes:
                nonquad[n] = leaf
                best[n] = leaf
                continue
            m2 = maps[half].astype(jnp.int32)
            bh2 = min(m2.shape[0], 2 * bh)
            bw2 = min(m2.shape[1], 2 * bw)
            # crop child grids to the parent-covered region (frames not
            # multiples of n leave partial children outside any parent)
            m2 = m2[:bh2, :bw2]
            ph, pw = bh2 // 2, bw2 // 2
            # shared-mode rectangle estimates from per-mode child maps:
            # an (n x n/2) rect = two n/2 squares side by side with ONE
            # intra mode; an (n/2 x n) rect = two stacked squares
            rh = (m2[:, 0::2, :] + m2[:, 1::2, :]).min(axis=-1)  # (bh2,pw)
            rv = (m2[0::2, :, :] + m2[1::2, :, :]).min(axis=-1)  # (ph,bw2)
            if sads is not None:
                s2 = sads[half][:bh2, :bw2]
                rh = jnp.minimum(rh, s2[:, 0::2] + s2[:, 1::2])
                rv = jnp.minimum(rv, s2[0::2, :] + s2[1::2, :])
            rh = rh + mode_cost
            rv = rv + mode_cost
            hor = (rh[0::2, :] + rh[1::2, :])[:bh, :bw] + split_cost
            ver = (rv[:, 0::2] + rv[:, 1::2])[:bh, :bw] + split_cost
            ch = best[half][:bh2, :bw2]
            qd = (ch[0::2, 0::2] + ch[0::2, 1::2] + ch[1::2, 0::2] +
                  ch[1::2, 1::2])[:bh, :bw] + split_cost
            if n <= max_binary_size:
                nq = jnp.minimum(leaf, jnp.minimum(hor, ver))
            else:
                # binary splits are illegal at this size
                # (is_binary_split_valid: width/height <= max size), so
                # the only alternative to quad is the plain leaf
                nq = leaf
            nonquad[n] = nq
            quad[n] = qd
            best[n] = jnp.minimum(nq, qd)

        out = []
        for n in sorted(shapes):
            if n not in quad:
                continue
            nq, qd = nonquad[n], quad[n]
            f = jnp.zeros(nq.shape, jnp.int8)
            if allow_force_split:
                # FORCE_SPLIT only on intra pictures: the open-loop
                # inter model is zero-MV SAD, blind to true motion that
                # a single merge/skip MV at this node would capture, so
                # "detail -> must split" is unsound for inter content.
                f = jnp.where(qd * MARGIN_NUM < nq * MARGIN_DEN,
                              jnp.int8(FORCE_SPLIT), f)
            f = jnp.where(nq * MARGIN_NUM < qd * MARGIN_DEN,
                          jnp.int8(FORCE_LEAF), f)
            out.append(f)
        return tuple(out)

    return jax.jit(fn)


def frame_zero_mv_sad(orig_luma, ref_planes, bitdepth, sizes=(8, 16, 32,
                                                              64)):
    """Open-loop inter leaf costs: per-block zero-MV SAD against each
    reference picture's ORIGINAL luma, minimum over references, for
    every aligned square block size.  One fused device dispatch.

    orig_luma: (H, W) int array; ref_planes: list of (H, W) arrays.
    Returns {n: np.ndarray (H//n, W//n) int32}.  The SAD is scaled to
    the SATD cost domain like the reference's uni-prediction estimate
    (SATD ~ 2x SAD on typical residuals; the decisive margin absorbs
    the approximation).
    """
    import jax
    import jax.numpy as jnp
    if not ref_planes:
        return None
    h, w = orig_luma.shape
    hh = min(h, min(r.shape[0] for r in ref_planes))
    ww = min(w, min(r.shape[1] for r in ref_planes))
    hh -= hh % max(sizes)
    ww -= ww % max(sizes)
    if hh <= 0 or ww <= 0:
        return None
    orig = jnp.asarray(np.ascontiguousarray(orig_luma[:hh, :ww], np.int32))
    refs = jnp.stack([jnp.asarray(np.ascontiguousarray(
        r[:hh, :ww], np.int32)) for r in ref_planes])

    @functools.partial(jax.jit, static_argnums=())
    def run(orig, refs):
        d = jnp.abs(refs - orig[None])          # (R, H, W)
        outs = []
        base = None
        prev = 1
        for n in sorted(sizes):
            if base is None:
                base = d.reshape(d.shape[0], hh // n, n, ww // n,
                                 n).sum((2, 4))
            else:
                f = n // prev
                base = base.reshape(base.shape[0], base.shape[1] // f, f,
                                    base.shape[2] // f, f).sum((2, 4))
            outs.append(base.min(axis=0))       # min over refs
            prev = n
        return outs

    outs = run(orig, refs)
    # SAD -> SATD-domain scale (x2), matching the intra map cost domain
    return {n: (2 * np.asarray(o)).astype(np.int32)
            for n, o in zip(sorted(sizes), outs)}


def split_dp_from_lookahead(maps, lambda_sqrt, inter_sad=None,
                            max_binary_size=32, binary_depth_ok=True,
                            allow_force_split=True):
    """maps: {n: costs[bh, bw, modes] int32} from frame_intra_lookahead;
    inter_sad: optional {n: [bh, bw] int64} from frame_zero_mv_sad.
    max_binary_size / binary_depth_ok mirror the encoder's binary-split
    legality (primary tree) so nonquad only includes arms the search
    would actually take.  Returns {n: force[bh, bw] int8} for every n
    that has a child map."""
    import jax.numpy as jnp
    mode_cost = int(round(MODE_BITS * lambda_sqrt))
    split_cost = int(round(SPLIT_BITS * lambda_sqrt))
    sizes = tuple(sorted(maps))
    shape_key = tuple((n,) + tuple(np.shape(maps[n])) for n in sizes)
    have_inter = inter_sad is not None
    fn = _dp_fn(shape_key, sizes, have_inter,
                max_binary_size if binary_depth_ok else 0,
                allow_force_split)
    args = [jnp.asarray(maps[n]) for n in sizes]
    if have_inter:
        args += [jnp.asarray(inter_sad.get(
            n, np.full(np.shape(maps[n])[:2], (1 << 30), np.int32)))
            for n in sizes]
    args += [jnp.asarray(mode_cost, jnp.int32),
             jnp.asarray(split_cost, jnp.int32)]
    out = fn(*args)
    force = {}
    oi = 0
    for n in sizes:
        if n // 2 in maps:
            force[n] = np.asarray(out[oi])
            oi += 1
    return force


def decision_for(force_maps, pos_x, pos_y, width, height):
    """The DP decision for a square CU at (pos_x, pos_y): FORCE_SPLIT /
    FORCE_LEAF / UNDECIDED.  Non-square or unmapped nodes are
    UNDECIDED."""
    if force_maps is None or width != height:
        return UNDECIDED
    f = force_maps.get(width)
    if f is None or pos_x % width or pos_y % width:
        return UNDECIDED
    by, bx = pos_y // width, pos_x // width
    if by >= f.shape[0] or bx >= f.shape[1]:
        return UNDECIDED
    return int(f[by, bx])


def pack_force_maps(force_maps, width, height, sizes=(8, 16, 32, 64)):
    """Flatten force maps into the single int8 buffer consumed by the
    native encoder (native/xvcn_enc.inc force_lookup): for each n in
    `sizes` in order, a ceil(height/n) x ceil(width/n) grid, UNDECIDED
    where the map has no entry."""
    bufs = []
    for n in sizes:
        gh = -(-height // n)
        gw = -(-width // n)
        g = np.zeros((gh, gw), np.int8)
        f = None if force_maps is None else force_maps.get(n)
        if f is not None:
            g[:f.shape[0], :f.shape[1]] = f[:gh, :gw]
        bufs.append(g.reshape(-1))
    return np.ascontiguousarray(np.concatenate(bufs))
