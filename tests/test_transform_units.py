"""Transform unit tests: DC-only exactness and high-frequency zero-out.

Mirrors test/xvc_test/transform_test.cc:153-243.
"""
import numpy as np
import pytest

from xvc_tpu import constants as k
from xvc_tpu.ops import transform as tx


@pytest.mark.parametrize("size", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("bitdepth", [8, 10])
def test_dc_only_inverse_exact(size, bitdepth):
    """A DC-only coefficient block must reconstruct to the exact flat
    value of the DC fast path (ref: transform.cc:115-121)."""
    for dc in (64, -64, 1024, -513):
        coeff = np.zeros((size, size), np.int32)
        coeff[0, 0] = dc
        full = tx.inverse_transform_np(coeff, 0, 0, bitdepth, True)
        fast = tx.inverse_transform_np(coeff, 0, 0, bitdepth, True,
                                       dc_only=True)
        assert np.array_equal(full, fast), (size, bitdepth, dc)
        assert (fast == fast[0, 0]).all()


@pytest.mark.parametrize("w,h", [(64, 64), (64, 32), (32, 64), (64, 16)])
def test_zero_out_high_frequencies(w, h):
    """Coefficients at x/y >= 32 never contribute to a 64-pt inverse
    (ref: transform.cc kTransformZeroOutMinSize)."""
    rng = np.random.RandomState(5)
    coeff = rng.randint(-256, 256, (h, w)).astype(np.int32)
    zeroed = coeff.copy()
    if h >= k.TRANSFORM_ZERO_OUT_MIN_SIZE * 2:
        zeroed[k.TRANSFORM_ZERO_OUT_MIN_SIZE:, :] = 0
    if w >= k.TRANSFORM_ZERO_OUT_MIN_SIZE * 2:
        zeroed[:, k.TRANSFORM_ZERO_OUT_MIN_SIZE:] = 0
    a = tx.inverse_transform_np(coeff, 0, 0, 8, True)
    b = tx.inverse_transform_np(zeroed, 0, 0, 8, True)
    assert np.array_equal(a, b)


def test_forward_inverse_roundtrip_monotone():
    """Forward+inverse must approximately preserve smooth residuals
    (integer transform accuracy sanity, all families)."""
    rng = np.random.RandomState(7)
    for fam in (k.TransformType.DCT2, k.TransformType.DCT5,
                k.TransformType.DCT8, k.TransformType.DST1,
                k.TransformType.DST7):
        resi = rng.randint(-32, 32, (8, 8)).astype(np.int32)
        c = tx.forward_transform_np(resi, fam, fam, 8, True)
        r = tx.inverse_transform_np(c, fam, fam, 8, True)
        assert np.abs(r - resi).max() <= 2, fam
