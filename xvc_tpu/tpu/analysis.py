"""Frame intra analysis: all-mode SATD cost maps as one jitted TPU step.

This is the TPU formulation of the encoder's intra SATD mode pre-pass
(ref: src/xvc_enc_lib/intra_search.cc:188-303 DetermineSlowIntraModes):
instead of looping CU-by-CU and mode-by-mode on the host, a whole batch
of NxN blocks is evaluated against all 67 intra modes at once —
prediction as a single MXU matmul (see intra_batch.py) and distortion as
batched Hadamard matmuls (see satd.py).

The host-side helpers extract blocks and reference lines (open-loop,
against the original frame — the standard encoder look-ahead
formulation); the jitted device step is `make_intra_satd_fn`.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra_pred as ip
from ..restrictions import Restrictions
from . import intra_batch as ib
from . import satd as satd_mod


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _intra_satd_step(orig, top, left, n, bitdepth, mode_step=1):
    """mode_step > 1 evaluates planar/DC + every mode_step-th angular
    (no post filter): a cheap upper-bound cost subset for the split DP
    (tpu/wavefront_rdo.py), ~mode_step x less einsum work."""
    weights = jnp.asarray(ib.angular_weight_tensor(n)[::mode_step])
    post_filter = n <= 16 and mode_step == 1
    preds = ib.predict_all_modes(n, top, left, weights, bitdepth,
                                 post_filter)
    diff = orig[:, None].astype(jnp.int32) - preds
    return satd_mod.satd_square(diff, bitdepth)


def make_intra_satd_fn(n, bitdepth, mode_step=1):
    """Returns jitted fn(orig [B,n,n], top [B,2n+1], left [B,2n]) -> [B,M]
    int32 SATD per mode, bit-exact vs the host path (M=67 when
    mode_step == 1, else 2 + ceil(65/mode_step))."""
    def fn(orig, top, left):
        return _intra_satd_step(orig, top, left, n, bitdepth, mode_step)
    return fn


def extract_blocks(frame, n, bitdepth, restrictions=None):
    """Host prep: tile a luma frame into NxN blocks + reference lines.

    frame: (H, W) int array (H, W multiples of n).  Reference samples are
    taken open-loop from the frame itself with the reference codec's
    availability/padding rules (ref: intra_prediction.cc:707-848).
    Returns (orig [B,n,n], top [B,2n+1], left [B,2n]) int32.
    """
    restr = restrictions or Restrictions()
    h, w = frame.shape
    bh, bw = h // n, w // n
    orig = np.zeros((bh * bw, n, n), dtype=np.int32)
    top = np.zeros((bh * bw, 2 * n + 1), dtype=np.int32)
    left = np.zeros((bh * bw, 2 * n), dtype=np.int32)
    b = 0
    for by in range(bh):
        for bx in range(bw):
            px, py = bx * n, by * n
            orig[b] = frame[py:py + n, px:px + n]
            has_left = px > 0
            has_above = py > 0
            size_below_left = min(n, h - (py + n)) if has_left else 0
            size_above_right = min(n, w - (px + n)) if has_above else 0
            top[b], left[b] = ip.compute_ref_samples(
                n, n, frame, px, py, has_left, has_above,
                has_left and has_above, size_below_left, size_above_right,
                bitdepth, restr)
            b += 1
    return orig, top, left


def analyze_frame(frame, n=8, bitdepth=8):
    """Full-frame open-loop intra analysis.

    Returns dict with per-block mode cost map [B, 67] and best modes [B].
    """
    orig, top, left = extract_blocks(np.asarray(frame), n, bitdepth)
    fn = make_intra_satd_fn(n, bitdepth)
    costs = fn(jnp.asarray(orig), jnp.asarray(top), jnp.asarray(left))
    costs = np.asarray(jax.device_get(costs))
    return {"costs": costs, "best_mode": costs.argmin(axis=1)}
