"""Device motion-estimation pre-pass: batched fullpel SAD sweeps.

The TZ search (ref: src/xvc_enc_lib/inter_tz_search.cc:85-330) evaluates
its candidate motion vectors one SAD at a time on the host.  With
XVC_ME=jax the structure is kept but the SAD evaluations are batched:
the initial diamond sweep's candidate set is fully determined by the
(fixed) sweep center, so all of its SADs — every diamond point of every
range — are computed in ONE device dispatch (gather the candidate
windows from the reference plane, one vectorized |diff| reduction per
candidate), and the sequential TZ decision logic then replays on the
host against the returned SAD table.  The raster fallback grid batches
the same way when reached.  SAD values are identical to the host metric,
so bitstreams are byte-identical (tests/test_device_me.py).

This is the encode-side analog of the decode block batching: the
per-candidate work becomes a fixed tensor program, and the candidate
axis is the scale-out axis.  (In this environment the device sits
behind a ~100 ms/transfer tunnel, so the jax pre-pass is a
correctness/scale-out path, not a wall-clock win; the native C++ ME is
the single-host performance path.)
"""
import functools

import numpy as np

_WIN = 192  # fixed gather window (covers search ranges up to ~60 + block)


@functools.lru_cache(maxsize=None)
def make_sad_fn(w, h, fast, bitdepth, n_cand):
    """jit fn(window int32 [WIN,WIN], cands int32 [2,N]) -> int64 [N].

    cands rows are (y, x) offsets of candidate block origins within the
    window.  fast=True skips odd rows and doubles (SAD_FAST semantics,
    ref: sample_metric.cc / ops/metrics.py compute_sad_fast).
    """
    import jax
    import jax.numpy as jnp

    step = 2 if fast else 1
    rows = jnp.arange(0, h, step)
    cols = jnp.arange(w)

    def one(window, orig, y, x):
        blk = window[y + rows[:, None], x + cols[None, :]]
        d = jnp.abs(orig[rows[:, None], cols[None, :]] - blk)
        # block SADs fit int32 for bitdepth <= 12 (64*64*4095 < 2^25)
        s = jnp.sum(d)
        if fast:
            s = s * 2
        return s >> (bitdepth - 8)

    def fn(window, orig, cands):
        return jax.vmap(lambda y, x: one(window, orig, y, x))(
            cands[0], cands[1])

    from .dsp import jit_cached
    return jit_cached(fn)


def tz_initial_candidates(mv_base, search_range):
    """Candidate list of the initial TZ diamond sweep around a fixed
    center: every point of every doubling range (the host replay applies
    the bounds/early-exit logic).  Returns [(mv_x, mv_y), ...]."""
    bx, by = mv_base
    out = []
    rng = 1
    while rng <= search_range:
        if rng == 1:
            out += [(bx, by - rng), (bx - rng, by), (bx + rng, by),
                    (bx, by + rng)]
        elif rng <= 8:
            r2 = rng >> 1
            out += [(bx, by - rng), (bx - r2, by - r2), (bx + r2, by - r2),
                    (bx - rng, by), (bx + rng, by), (bx - r2, by + r2),
                    (bx + r2, by + r2), (bx, by + rng)]
        else:
            out += [(bx, by - rng), (bx - rng, by), (bx + rng, by),
                    (bx, by + rng)]
            for i in range(1, 4):
                r14 = i * (rng >> 2)
                r34 = rng - r14
                out += [(bx - r14, by - r34), (bx + r14, by - r34),
                        (bx - r14, by + r34), (bx + r14, by + r34)]
        rng *= 2
    return out


class DeviceSadTable:
    """Precomputed SAD cache for one (CU, reference) TZ search.

    Candidates whose windows fall outside the gather window or that were
    not prefetched fall back to the host metric (identical values)."""

    def __init__(self, search, cu, metric, ref_pic, orig_buffer):
        self.search = search
        self.cu = cu
        self.metric = metric
        self.ref_pic = ref_pic
        self.orig = orig_buffer
        self.cache = {}
        self._host_fn = None

    def _ensure_host(self, qp):
        if self._host_fn is None:
            self._host_fn = self.search._make_dist_fullpel(
                self.cu, qp, self.metric, self.ref_pic, self.orig)
        return self._host_fn

    def prefetch(self, qp, mvs):
        """Batch-evaluate a candidate MV list in one device call."""
        from ..ops import metrics as met
        mt = self.metric.type
        fast = mt == met.MetricType.SAD_FAST
        if mt not in (met.MetricType.SAD, met.MetricType.SAD_FAST):
            return  # LIC/affine metrics stay on the host path
        mvs = [m for m in mvs if m not in self.cache]
        if not mvs:
            return
        cu = self.cu
        cx, cy = cu.pos(0)
        w, h = cu.width, cu.height
        # window centered on the candidate bounding box
        xs = [m[0] for m in mvs]
        ys = [m[1] for m in mvs]
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        if x1 - x0 + w > _WIN or y1 - y0 + h > _WIN:
            return  # enormous range: host path
        import jax.numpy as jnp
        plane = self.ref_pic.padded_plane(0)
        px, py = self.ref_pic.pad_x[0], self.ref_pic.pad_y[0]
        wy0 = py + cy + y0
        wx0 = px + cx + x0
        if wy0 < 0 or wx0 < 0 or wy0 + _WIN > plane.shape[0] or \
                wx0 + _WIN > plane.shape[1]:
            return
        window = np.ascontiguousarray(
            plane[wy0:wy0 + _WIN, wx0:wx0 + _WIN], np.int32)
        orig = np.ascontiguousarray(self.orig[:h, :w], np.int32) \
            if self.orig.shape == (h, w) else \
            np.ascontiguousarray(self.orig, np.int32)
        from . import dsp
        n = dsp.pad_pow2(len(mvs))
        cands = np.zeros((2, n), np.int32)
        for i, (mx, my) in enumerate(mvs):
            cands[0, i] = my - y0
            cands[1, i] = mx - x0
        fn = make_sad_fn(w, h, fast, self.metric.bitdepth, n)
        from ..engine import get_pin_device
        pin = get_pin_device()
        if pin is not None:
            # GOP-pipeline device pin: this picture's SAD sweeps run on
            # its assigned mesh device (see engine.set_pin_device).
            import jax
            sads = np.asarray(fn(jax.device_put(window, pin),
                                 jax.device_put(orig, pin),
                                 jax.device_put(cands, pin)))
        else:
            sads = np.asarray(fn(jnp.asarray(window), jnp.asarray(orig),
                                 jnp.asarray(cands)))
        weight = qp.distortion_weight[0]
        for i, m in enumerate(mvs):
            self.cache[m] = int(int(sads[i]) * weight)

    def dist(self, qp, mv_x, mv_y):
        v = self.cache.get((mv_x, mv_y))
        if v is not None:
            return v
        return self._ensure_host(qp)(mv_x, mv_y)
