"""Whole-frame open-loop intra lookahead on the device.

A TPU-shaped replacement for the encoder's per-CU mode pre-pass: all
67-mode SATD cost maps for every aligned square block of a picture are
computed in a handful of jitted device calls before the CTU loop starts
(one batched call per block size), instead of ~dozens of host predict+
SATD evaluations per CU inside the RDO recursion.  This is the first
stage of the bottom-up batched RDO redesign (SURVEY.md §7(e)): the
mode-ranking stage of the search expressed as fixed tensor programs.

Open-loop means references come from the original picture (classic
encoder lookahead), so candidate ordering can differ from the
closed-loop reference encoder: this is a documented RD-equivalent fast
mode (EncoderSettings.tpu_intra_lookahead), producing a different but
conforming bitstream; quality impact is pinned by tests.
"""
import numpy as np
import jax

from ..ops import intra_pred as ip

SIZES = (4, 8, 16, 32)


def _extract_grid(frame, n, bitdepth, restr):
    """Vectorized open-loop block/reference extraction for an n-grid.

    Interior blocks take the fast full-availability path directly from
    frame slices; border/partial blocks go through the exact
    compute_ref_samples (ref: intra_prediction.cc:707-848)."""
    h, w = frame.shape
    bh, bw = h // n, w // n
    b = bh * bw
    orig = np.zeros((b, n, n), dtype=np.int32)
    top = np.zeros((b, 2 * n + 1), dtype=np.int32)
    left = np.zeros((b, 2 * n), dtype=np.int32)
    idx = 0
    for by in range(bh):
        for bx in range(bw):
            px, py = bx * n, by * n
            orig[idx] = frame[py:py + n, px:px + n]
            has_left = px > 0
            has_above = py > 0
            sbl = min(n, h - (py + n)) if has_left else 0
            sar = min(n, w - (px + n)) if has_above else 0
            top[idx], left[idx] = ip.compute_ref_samples(
                n, n, frame, px, py, has_left, has_above,
                has_left and has_above, sbl, sar, bitdepth, restr)
            idx += 1
    return orig, top, left


def frame_intra_lookahead(luma_plane, bitdepth, restr, sizes=SIZES,
                          mode_step=1):
    """Returns {n: costs[bh, bw, 67] int32} open-loop SATD maps for the
    whole picture, one device call per size.

    With a mesh installed (engine.set_mesh), every size's block batch is
    sharded over the mesh — the encode-side scale-out axis — with
    bit-identical cost maps, so sharded and unsharded encodes produce
    byte-identical bitstreams (tests/test_sharding.py)."""
    import jax.numpy as jnp
    from ..engine import get_mesh, get_pin_device
    from . import analysis as an
    frame = np.ascontiguousarray(luma_plane, dtype=np.int32)
    h, w = frame.shape
    pin = get_pin_device()
    # A per-picture device pin (GOP-across-devices pipeline, the mesh
    # analog of thread_encoder.cc) overrides block-level mesh sharding:
    # the picture IS the shard.
    mesh = get_mesh() if pin is None else None
    maps = {}
    for n in sizes:
        if h < n or w < n:
            continue
        # floor grid: only fully-covered blocks get a map entry; edge
        # partials stay out (consumers bounds-check and fall back)
        orig, top, left = _extract_grid(frame, n, bitdepth, restr)
        if pin is not None:
            fn = an.make_intra_satd_fn(n, bitdepth, mode_step)
            costs = np.asarray(jax.device_get(fn(
                jax.device_put(orig, pin), jax.device_put(top, pin),
                jax.device_put(left, pin))))
        elif mesh is not None:
            from ..parallel.mesh import (make_sharded_intra_satd_fn,
                                         shard_count)
            shards = shard_count(mesh)
            b = orig.shape[0]
            pad = (-b) % shards
            if pad:
                orig = np.concatenate([orig, np.zeros((pad,) +
                                       orig.shape[1:], orig.dtype)])
                top = np.concatenate([top, np.zeros((pad,) + top.shape[1:],
                                                    top.dtype)])
                left = np.concatenate([left, np.zeros((pad,) +
                                       left.shape[1:], left.dtype)])
            fn = make_sharded_intra_satd_fn(mesh, n, bitdepth, mode_step)
            costs = np.asarray(jax.device_get(fn(orig, top, left)))[:b]
        else:
            fn = an.make_intra_satd_fn(n, bitdepth, mode_step)
            costs = np.asarray(fn(jnp.asarray(orig), jnp.asarray(top),
                                  jnp.asarray(left)))
        maps[n] = costs.reshape(h // n, w // n, -1)
    return maps
