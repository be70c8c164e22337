"""Pallas TPU kernel for batched sub-pel motion compensation.

The XLA formulation of the MC window gather
(dsp._mc_core_builder: vmap(dynamic_slice) over the block batch) is the
measured device bottleneck: 160 Mpix/s on a v5e-lite chip vs 22,742
Mpix/s for the inverse-transform path (BASELINE.md round-5 table) —
the filter math is trivial, the gather is everything.  This kernel
replaces the gather with what the hardware actually wants: the
reference planes stay in HBM, each block's (h+taps-1, w+taps-1) window
is fetched by an async DMA whose offsets come from scalar-prefetched
parameters, G windows per wave, double-buffered so the DMAs of wave
g+1 overlap the VPU filter work of wave g.

Semantics are bit-exact with dsp._mc_core_builder (and therefore with
the scalar reference, ref: src/xvc_common_lib/inter_prediction.cc:
1138-1378): exact int32 arithmetic, the reference's int16 wrap points,
all four fractional cases computed and selected per block.

Layout notes (guide: /opt/skills/guides/pallas_guide.md):
  - planes:  (R, Hp, Wp) int16, memory_space=ANY (stays in HBM)
  - params:  (5, B) int32 [ref_idx, y0, x0, fx, fy]; passed twice —
    once as scalar prefetch (SMEM, feeds the DMA offsets) and once as
    a VMEM tensor (feeds the vectorized one-hot filter selection)
  - window scratch: (2, G, wh, ww) int16 VMEM + (2, G) DMA semaphores
"""
import functools

import numpy as np

from . import dsp
from ..codec import inter_mc as mc


def _filters(luma, high_prec):
    if luma:
        t = mc.LUMA_FILTER_HIGH_PREC if high_prec else mc.LUMA_FILTER
    else:
        t = mc.CHROMA_FILTER_HIGH_PREC if high_prec else mc.CHROMA_FILTER
    return np.asarray(t, np.int32)


@functools.lru_cache(maxsize=None)
def make_mc_pallas(width, height, luma, bitdepth, high_prec, short_out,
                   batch, group=8, interpret=False):
    """Batched MC kernel: fn(planes int16 (R,Hp,Wp), params int32
    (5, batch)) -> (batch, height, width) int16.  `batch` must be a
    multiple of `group` (mc_pallas_direct pads)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert batch % group == 0
    taps = mc.NUM_TAPS_LUMA if luma else mc.NUM_TAPS_CHROMA
    half = taps // 2 - 1
    wh, ww = height + taps - 1, width + taps - 1
    # DMA slices of a tiled int16 HBM array must start and size on tile
    # boundaries (sublane 8 / lane 128, probed on-chip), so each wave
    # copies an aligned superset window and the kernel extracts the true
    # (wh, ww) window with dynamic rolls (positive shifts only: negative
    # dynamic rotate amounts miscompile on current Mosaic).
    whp = -(-(wh + 7) // 8) * 8
    wwp = -(-(ww + 127) // 128) * 128
    table_np = _filters(luma, high_prec)
    n_phase = table_np.shape[0]
    max_val = (1 << bitdepth) - 1
    prec_diff = mc.INTERNAL_PRECISION - bitdepth
    off = mc.INTERNAL_OFFSET
    ngroups = batch // group

    def ftap(f, i):
        # f (G, taps) -> (G, 1, 1) tap column as pure slice+reshape
        # (fancy `f[:, i, None, None]` lowers to an unsupported gather
        # in Mosaic)
        return f[:, i:i + 1].reshape(-1, 1, 1)

    def conv_h(src, f):
        # src (G, n, ww) int32, f (G, taps) -> (G, n, width)
        out = ftap(f, 0) * src[:, :, 0:width]
        for i in range(1, taps):
            out = out + ftap(f, i) * src[:, :, i:i + width]
        return out

    def conv_v(src, f):
        out = ftap(f, 0) * src[:, 0:height, :]
        for i in range(1, taps):
            out = out + ftap(f, i) * src[:, i:i + height, :]
        return out

    def wrap16(x):
        return x.astype(jnp.int16).astype(jnp.int32)

    def kernel(params_smem, planes, fxy, table, out_ref, win, sems):
        hp = planes.shape[1]
        wp = planes.shape[2]

        def aligned(g, j):
            y = params_smem[1, g * group + j]
            x = params_smem[2, g * group + j]
            # clamp-then-align so the (...//k)*k form is the LAST op:
            # Mosaic proves tile alignment syntactically and cannot see
            # through a jnp.minimum of two aligned values
            ya = pl.multiple_of((jnp.minimum(y, hp - whp) // 8) * 8, 8)
            xa = pl.multiple_of((jnp.minimum(x, wp - wwp) // 128) * 128,
                                128)
            return y, x, ya, xa

        def get_dma(slot, g, j):
            r = params_smem[0, g * group + j]
            _, _, ya, xa = aligned(g, j)
            return pltpu.make_async_copy(
                planes.at[r, pl.ds(ya, whp), pl.ds(xa, wwp)],
                win.at[slot, j], sems.at[slot, j])

        def start_wave(slot, g):
            for j in range(group):
                get_dma(slot, g, j).start()

        def compute(slot, g):
            ws = []
            for j in range(group):
                y, x, ya, xa = aligned(g, j)
                w = win[slot, j].astype(jnp.int32)
                w = pltpu.roll(w, whp - (y - ya), axis=0)
                w = pltpu.roll(w, wwp - (x - xa), axis=1)
                ws.append(w[0:wh, 0:ww])
            w32 = jnp.stack(ws)
            # fxy is (ngroups, 2, group): indexing the untiled leading
            # dim avoids Mosaic's lane-alignment restriction on dynamic
            # slices (a (5,B) lane-dim ds(g*group) cannot be proven
            # 128-aligned)
            row = fxy[g]
            fx = row[0]
            fy = row[1]
            # vectorized per-block filter rows via one-hot combination
            # (an int32 (G,16)@(16,taps) dot has no MXU mapping; unroll
            # the 16 phases as VPU multiply-accumulates instead)
            ph = jax.lax.broadcasted_iota(jnp.int32, (group, n_phase), 1)
            tab = table[:]
            oh_x = (fx[:, None] == ph).astype(jnp.int32)
            oh_y = (fy[:, None] == ph).astype(jnp.int32)
            f_x = oh_x[:, 0:1] * tab[0:1, :]
            f_y = oh_y[:, 0:1] * tab[0:1, :]
            for p in range(1, n_phase):
                f_x = f_x + oh_x[:, p:p + 1] * tab[p:p + 1, :]
                f_y = f_y + oh_y[:, p:p + 1] * tab[p:p + 1, :]

            center = w32[:, half:half + height, half:half + width]
            if short_out:
                case00 = wrap16(wrap16(center << prec_diff) - off)
            else:
                case00 = jnp.clip(center, 0, max_val)

            ch = conv_h(w32[:, half:half + height, :], f_x)
            cv = conv_v(w32[:, :, half:half + width], f_y)
            if short_out:
                shift1 = mc.FILTER_PRECISION - prec_diff
                offset1 = -(off << shift1)
                case_h = wrap16((ch + offset1) >> shift1)
                case_v = wrap16((cv + offset1) >> shift1)
                temp = wrap16((conv_h(w32, f_x) + offset1) >> shift1)
                case_hv = wrap16(conv_v(temp, f_y) >> mc.FILTER_PRECISION)
            else:
                fshift = mc.FILTER_PRECISION
                foff = 1 << (fshift - 1)
                case_h = jnp.clip((ch + foff) >> fshift, 0, max_val)
                case_v = jnp.clip(wrap16((cv + foff) >> fshift),
                                  0, max_val)
                shift1 = mc.FILTER_PRECISION - prec_diff
                offset1 = -(off << shift1)
                temp = wrap16((conv_h(w32, f_x) + offset1) >> shift1)
                shift2 = mc.FILTER_PRECISION + prec_diff
                offset2 = (off << mc.FILTER_PRECISION) + (1 << (shift2 - 1))
                case_hv = jnp.clip(
                    wrap16((conv_v(temp, f_y) + offset2) >> shift2),
                    0, max_val)

            # arithmetic 4-way select: Mosaic rejects 1-D -> (G,1,1)
            # broadcasts, so build the per-block masks from the 2-D
            # one-hots via the same slice+reshape pattern as ftap
            mx = oh_x[:, 0:1].reshape(-1, 1, 1)   # 1 where fx == 0
            my = oh_y[:, 0:1].reshape(-1, 1, 1)   # 1 where fy == 0
            res = (mx * my * case00 + my * (1 - mx) * case_h +
                   mx * (1 - my) * case_v +
                   (1 - mx) * (1 - my) * case_hv)
            out_ref[pl.ds(g * group, group)] = res.astype(jnp.int16)

        start_wave(0, 0)

        def body(g, _):
            slot = jax.lax.rem(g, 2)
            nxt = jax.lax.rem(g + 1, 2)

            @pl.when(g + 1 < ngroups)
            def _():
                start_wave(nxt, g + 1)

            for j in range(group):
                get_dma(slot, g, j).wait()
            compute(slot, g)
            return 0

        jax.lax.fori_loop(0, ngroups, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # planes (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # fxy (ngroups,2,G)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # filter table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, group, whp, wwp), np.int16),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    table = jnp.asarray(table_np)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, height, width), np.int16),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    from .dsp import jit_cached

    def fn(planes, params):
        # plane dims must be tile-aligned: DMA slice starts AND shapes
        # must sit on (8, 128) boundaries, and the right/bottom-edge
        # clamp can only produce aligned starts when hp/wp are aligned
        # (probed on-chip: unaligned planes silently corrupt edge
        # blocks).  The frame store allocates aligned planes
        # (tpu/flat_recon._padded_shape).
        if (planes.shape[1] % 8 or planes.shape[2] % 128
                or planes.shape[1] < whp or planes.shape[2] < wwp):
            raise ValueError(
                "mc pallas kernel needs plane dims aligned to (8, 128) "
                "and >= (%d, %d); got %r" % (whp, wwp, planes.shape))
        fxy = params[3:5].reshape(2, ngroups, group).transpose(1, 0, 2)
        return call(params, planes, fxy, table)

    return jit_cached(fn)


def mc_pallas_direct(width, height, luma, bitdepth, high_prec, short_out,
                     group=8, interpret=False):
    """Signature-compatible wrapper for dsp.make_mc_kernel_direct:
    fn(planes, params int32 (5, B)) for any B (pads to `group`)."""
    import jax.numpy as jnp

    def fn(planes, params):
        b = params.shape[1]
        pb = -(-b // group) * group
        if pb != b:
            pad = jnp.zeros((5, pb - b), params.dtype)
            params = jnp.concatenate([params, pad], axis=1)
        k = make_mc_pallas(width, height, luma, bitdepth, high_prec,
                           short_out, pb, group=group,
                           interpret=interpret)
        out = k(planes, params)
        return out[:b]

    return fn


def bench_device(batch=4096, iters=64, bitdepth=8, block=16, group=8):
    """XLA-gather MC vs Pallas MC on the current backend; Mpix/s both,
    plus a bit-exactness check on the same inputs."""
    import time
    import jax
    import jax.numpy as jnp
    from jax import lax

    S, Hp, Wp = 6, 512, 768
    rng = np.random.RandomState(0)
    planes = jnp.asarray(
        rng.randint(0, 1 << bitdepth, (S, Hp, Wp)).astype(np.int16))
    params = jnp.asarray(np.stack([
        rng.randint(0, S, batch),
        rng.randint(0, Hp - block - 8, batch),
        rng.randint(0, Wp - block - 8, batch),
        rng.randint(1, 16, batch),
        rng.randint(1, 16, batch)]).astype(np.int32))

    xla_core = dsp._mc_core_builder(block, block, True, bitdepth, True,
                                    False)
    xla = jax.jit(lambda pl_, pr: xla_core(pl_, pr[0], pr[1], pr[2],
                                           pr[3], pr[4]))
    pallas = make_mc_pallas(block, block, True, bitdepth, True, False,
                            batch, group=group)

    a = np.asarray(xla(planes, params))
    b = np.asarray(pallas(planes, params))
    exact = bool((a == b).all())

    from .device_bench import _roundtrip_seconds
    out = {"bit_exact": exact}
    # perturb only y0 between iterations (defeats relay memoization);
    # perturbing every row would push ref_idx past S, which XLA's
    # dynamic_slice clamps but a real DMA faults on
    dy = jnp.zeros((5, 1), jnp.int32).at[1, 0].set(1)
    for name, fn in (("xla", xla), ("pallas", pallas)):
        def chain(i, acc, fn=fn):
            o = fn(planes, params + dy * (i & 1))
            return acc + jnp.sum(o.astype(jnp.int32))

        run = jax.jit(lambda n, chain=chain:
                      lax.fori_loop(0, n, chain, jnp.int32(0)))
        int(run(2))
        rt = _roundtrip_seconds()
        t0 = time.perf_counter()
        int(run(iters))
        per_call = max(time.perf_counter() - t0 - rt, 1e-9) / iters
        out[name + "_mpixs"] = round(batch * block * block / per_call
                                     / 1e6, 1)
        out[name + "_us_per_call"] = round(per_call * 1e6, 1)
    return out
