"""Distortion metrics: SSD, SAD, SATD (Hadamard), structural SSD, PSNR.

Behavioral equivalent of the reference metrics
(ref: src/xvc_enc_lib/sample_metric.cc).  Sum-of-absolute-transformed
values are invariant under Hadamard row/col ordering, so the fast
butterflies of the reference are computed here as H D H^T products —
which is also the MXU-native formulation for the JAX path.
"""
from functools import lru_cache

import numpy as np

from .. import constants as k
from .. import native as _native


class MetricType:
    SSD = 0
    SATD = 1
    SAD = 2
    SAD_FAST = 3
    SAD_AC_ONLY = 4
    SAD_AC_ONLY_FAST = 5
    SATD_AC_ONLY = 6
    STRUCTURAL_SSD = 7


@lru_cache(maxsize=None)
def _hadamard(n):
    h = np.array([[1]], dtype=np.int64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def _satd_block(d, w, h):
    m = _hadamard(h) @ d @ _hadamard(w)
    s = int(np.abs(m).sum())
    if w == 4 and h == 4:
        return (s + 1) >> 1
    if w == h:
        return (s + 2) >> 2
    return int(2.0 * s / np.sqrt(w * h))


def compute_satd(diff, bitdepth):
    """diff: (h, w) int array of sample differences."""
    height, width = diff.shape
    d = diff.astype(np.int64)
    total = 0
    if width == 2 or height == 2:
        bw = bh = 2
    elif width == 4 and height == 4:
        bw = bh = 4
    elif height == 4 and width > height:
        bw, bh = 8, 4
    elif width == 4 and height > width:
        bw, bh = 4, 8
    elif width > height:
        bw, bh = 16, 8
    elif width < height:
        bw, bh = 8, 16
    else:
        bw = bh = 8
    for y in range(0, height, bh):
        for x in range(0, width, bw):
            blk = d[y:y + bh, x:x + bw]
            if bw == 2:
                m = _hadamard(2) @ blk @ _hadamard(2)
                total += int(np.abs(m).sum())
            else:
                total += _satd_block(blk, bw, bh)
    return total >> (bitdepth - 8)


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def compute_satd_ac_only(diff, bitdepth):
    height, width = diff.shape
    avg = _trunc_div(int(diff.sum()), width * height)
    return compute_satd(diff - avg, bitdepth)


def compute_ssd(diff, bitdepth):
    d = diff.astype(np.int64)
    return int((d * d).sum()) >> (2 * (bitdepth - 8))


def compute_sad(diff, bitdepth):
    return int(np.abs(diff.astype(np.int64)).sum()) >> (bitdepth - 8)


def compute_sad_fast(diff, bitdepth):
    d = diff[::2, :].astype(np.int64)
    return (int(np.abs(d).sum()) * 2) >> (bitdepth - 8)


def compute_sad_ac_only(diff, bitdepth, skip_lines=0):
    height, width = diff.shape
    step = 1 + skip_lines
    d = diff[::step, :].astype(np.int64)
    delta_sum = int(d.sum()) * step
    n = width * height
    avg = _trunc_div(delta_sum, n)
    s = int(np.abs(d - avg).sum())
    return (s * step) >> (bitdepth - 8)


def compute_structural_ssd(qp_raw_luma, strength, diff_free_src1, src2,
                           bitdepth):
    """Structural (SSIM-blended) SSD for luma
    (ref: sample_metric.cc:705-767).  src1/src2: (h, w) int arrays."""
    src1 = diff_free_src1
    height, width = src1.shape
    size = 4 if (height < 8 or width < 8) else 8
    total = 0
    for by in range(0, height - size + 1, size):
        for bx in range(0, width - size + 1, size):
            total += _structural_block(
                qp_raw_luma, strength, size,
                src1[by:by + size, bx:bx + size],
                src2[by:by + size, bx:bx + size], bitdepth)
    return total


def _structural_block(z, strength, size, s1, s2, bitdepth):
    n = size * size
    shift = 2 * (bitdepth - 8)
    c1 = ((n * n * 26634) >> 12) << shift
    c2 = ((n * n * 239708) >> 12) << shift
    c4 = 255 * 255
    w = max(0, int((4 * z - 0.054 * z * z - 70) * strength)) >> 4
    w1 = 64 - (w >> 1)
    w2 = 2 * w
    a1 = s1.astype(np.int64)
    a2 = s2.astype(np.int64)
    orig_sum = int(a1.sum())
    reco_sum = int(a2.sum())
    orig_orig = int((a1 * a1).sum())
    reco_reco = int((a2 * a2).sum())
    orig_reco = int((a1 * a2).sum())
    d = a1 - a2
    ssd = int((d * d).sum())
    m = (orig_sum - reco_sum) / n
    a = (c4 - m * m + c1) / (c4 + c1)
    b = (2.0 * n * orig_reco - 2 * orig_sum * reco_sum + c2) / \
        (n * orig_orig - orig_sum * orig_sum +
         n * reco_reco - reco_sum * reco_sum + c2)
    ssd >>= shift
    return int(w1 * ssd + w2 * (c4 >> ((8 - size) >> 1)) * (1 - a * b)) >> 6


class SampleMetric:
    """Metric dispatcher bound to a type + qp weighting."""

    def __init__(self, bitdepth, metric_type, structural_strength=1.0):
        self.bitdepth = bitdepth
        self.type = metric_type
        self.structural_strength = structural_strength

    def compare(self, qp, comp, src1, src2):
        """src1/src2: (h, w) integer arrays of identical shape."""
        t = self.type
        if _native.available():
            a, b = src1, src2
            if a.dtype != np.int32 or a.strides[1] != 4:
                a = np.ascontiguousarray(a, np.int32)
            if b.dtype != np.int32 or b.strides[1] != 4:
                b = np.ascontiguousarray(b, np.int32)
            mt = t
            if t == MetricType.STRUCTURAL_SSD and comp != 0:
                mt = MetricType.SSD
            dist = _native.LIB.xvcn_metric(
                mt, a.ctypes.data, a.strides[0] // 4, b.ctypes.data,
                b.strides[0] // 4, a.shape[1], a.shape[0], self.bitdepth,
                qp.get_qp_raw(0), float(self.structural_strength))
            weight = qp.distortion_weight[comp]
            return int(dist * weight)
        diff = src1.astype(np.int64) - src2.astype(np.int64)
        if t == MetricType.SSD:
            dist = compute_ssd(diff, self.bitdepth)
        elif t == MetricType.SATD:
            dist = compute_satd(diff, self.bitdepth)
        elif t == MetricType.SATD_AC_ONLY:
            dist = compute_satd_ac_only(diff, self.bitdepth)
        elif t == MetricType.SAD:
            dist = compute_sad(diff, self.bitdepth)
        elif t == MetricType.SAD_FAST:
            dist = compute_sad_fast(diff, self.bitdepth)
        elif t == MetricType.SAD_AC_ONLY:
            dist = compute_sad_ac_only(diff, self.bitdepth, 0)
        elif t == MetricType.SAD_AC_ONLY_FAST:
            dist = compute_sad_ac_only(diff, self.bitdepth, 1)
        elif t == MetricType.STRUCTURAL_SSD:
            if comp == 0:
                dist = compute_structural_ssd(
                    qp.get_qp_raw(0), self.structural_strength, src1, src2,
                    self.bitdepth)
            else:
                dist = compute_ssd(diff, self.bitdepth)
        else:
            raise ValueError("unknown metric")
        weight = qp.distortion_weight[comp]
        return int(dist * weight)


def compute_picture_psnr(rec_view, orig_view):
    """PSNR against 8-bit max like the reference (max=255)."""
    diff = rec_view.astype(np.int64) - orig_view.astype(np.int64)
    mse = float((diff * diff).sum()) / diff.size if diff.size else 0.0
    if mse > 0:
        return 10 * np.log10(255 * 255 / mse)
    return 99.999
