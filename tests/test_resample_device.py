"""Device resampler (two-matmul formulation) == host resampler, exactly.

The reference pins its SIMD resampler to the scalar one by bitstream
equality (ref: test/xvc_test/simd_test.cc:149-176, resample role of
src/xvc_common_lib/resample.cc:569-852); here the device twin is pinned
sample-exact over every scale class of get_filter_from_scale plus the
upsample/equal paths and bitdepth conversions.
"""
import numpy as np
import pytest

from xvc_tpu.ops import resample as rs
from xvc_tpu.tpu import resample_jax


def _host_resample(*args):
    """Call the host path directly (bypasses the engine dispatch)."""
    import os
    prev = os.environ.get("XVC_DSP")
    os.environ["XVC_DSP"] = "host"
    try:
        return rs.resample(*args)
    finally:
        if prev is None:
            os.environ.pop("XVC_DSP", None)
        else:
            os.environ["XVC_DSP"] = prev


CASES = [
    # (src_w, src_h, src_bd, dst_w, dst_h, dst_bd)
    (16, 16, 8, 24, 24, 8),      # upsample 1.5x
    (16, 16, 8, 32, 32, 8),      # upsample 2x
    (24, 16, 8, 24, 16, 10),     # equal size, bitdepth up
    (32, 32, 10, 24, 24, 8),     # downsample 4:3 (filter class 1)
    (48, 48, 8, 32, 32, 8),      # downsample 1.5x (class 2)
    (64, 48, 8, 24, 16, 8),      # downsample ~2.7x/3x (class 4/5)
    (96, 96, 8, 16, 16, 8),      # downsample 6x (class 7)
    (40, 24, 8, 56, 64, 10),     # anisotropic up, bitdepth up
    (56, 64, 10, 40, 24, 8),     # anisotropic down, bitdepth down
]


@pytest.mark.parametrize("src_w,src_h,src_bd,dst_w,dst_h,dst_bd", CASES)
def test_device_resample_exact(src_w, src_h, src_bd, dst_w, dst_h, dst_bd):
    rng = np.random.RandomState(src_w * 31 + dst_w)
    pad = 16
    padded = rng.randint(0, 1 << src_bd,
                         (src_h + 2 * pad, src_w + 2 * pad)).astype(np.int32)
    args = (padded, pad, pad, src_w, src_h, src_bd, dst_w, dst_h, dst_bd)
    host = _host_resample(*args)
    dev = resample_jax.resample(*args)
    assert host.shape == dev.shape == (dst_h, dst_w)
    assert np.array_equal(host, dev)
