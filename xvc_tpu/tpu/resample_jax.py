"""Device picture resampling: windowed-sinc rescale as two MXU matmuls.

TPU formulation of the reference resampler core
(ref: src/xvc_common_lib/resample.cc:569-950 resample::Resample and the
SIMD resampler role of xvc_common_lib/simd/): the separable polyphase
filter of each axis is materialized as a sparse-in-dense tap matrix, so
the whole-plane resample is

    tmp = window @ Mh      (horizontal pass, int32 matmul)
    out = Mv @ tmp         (vertical pass, int32 matmul)

with the reference's exact shift/clip between the passes — integer
matmuls map straight onto the MXU and XLA fuses the shift/clip
epilogues.  Bit-exact against ops/resample.resample for every scale
class (pinned by tests/test_resample_device.py): int32 is sufficient
because |sum(taps)| <= 256 and samples are <= 16-bit, so both passes
stay under 2^27.

Used for decoder output rescaling and cross-segment reference
rescaling (alt-rec-pic) when the jax DSP engine is active.
"""
import functools

import numpy as np

from ..ops import resample as rs


@functools.lru_cache(maxsize=32)
def _tap_matrix(scale, out_size, in_window, origin_shift):
    """Dense (in_window, out_size) int32 tap matrix for one axis.

    in_window covers [-8, src_size + 8) around the source extent;
    origin_shift (=8) maps source position 0 to window row 8."""
    full, off, taps, post = rs._axis_taps(scale, out_size)
    m = np.zeros((in_window, out_size), dtype=np.int32)
    for t in range(len(off)):
        rows = full + off[t] + origin_shift
        m[rows, np.arange(out_size)] = taps[:, t]
    return m, post


@functools.lru_cache(maxsize=32)
def _resample_fn(src_width, src_height, src_bitdepth, dst_width,
                 dst_height, dst_bitdepth):
    """jit fn(window int32 [src_h+16, src_w+16]) -> int32 [dst_h, dst_w],
    exact twin of ops/resample.resample on that window."""
    import jax
    import jax.numpy as jnp

    pad = 8
    scale_x = ((src_width << rs.POSITION_PRECISION) + (dst_width >> 1)) \
        // dst_width
    scale_y = ((src_height << rs.POSITION_PRECISION) + (dst_height >> 1)) \
        // dst_height
    shift_hor = max(
        src_bitdepth - (rs.INTERNAL_PRECISION - rs.FILTER_PRECISION), 0)
    shift_ver = 2 * rs.FILTER_PRECISION - shift_hor + src_bitdepth \
        - dst_bitdepth
    maxv = (1 << dst_bitdepth) - 1

    mh, post_x = _tap_matrix(scale_x, dst_width, src_width + 2 * pad, pad)
    mv, post_y = _tap_matrix(scale_y, dst_height, src_height + 2 * pad, pad)
    mh = jnp.asarray(mh)
    mv = jnp.asarray(mv.T)  # (dst_h, src_h+16)

    def fn(window):
        tmp = jnp.matmul(window, mh, preferred_element_type=jnp.int32)
        if post_x:
            tmp = tmp >> 1
        tmp = jnp.clip(tmp >> shift_hor, 0, 65535)
        out = jnp.matmul(mv, tmp, preferred_element_type=jnp.int32)
        if post_y:
            out = out >> 1
        return jnp.clip(out >> shift_ver, 0, maxv)

    from .dsp import jit_cached
    return jit_cached(fn)


def resample(padded_src, origin_y, origin_x, src_width, src_height,
             src_bitdepth, dst_width, dst_height, dst_bitdepth):
    """Device twin of ops/resample.resample (same signature/result)."""
    import jax
    pad = 8
    window = np.ascontiguousarray(
        padded_src[origin_y - pad:origin_y + src_height + pad,
                   origin_x - pad:origin_x + src_width + pad], np.int32)
    fn = _resample_fn(src_width, src_height, src_bitdepth,
                      dst_width, dst_height, dst_bitdepth)
    return np.asarray(jax.device_get(fn(window))).astype(np.int32)
