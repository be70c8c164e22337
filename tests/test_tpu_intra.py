"""Bit-exactness of the batched TPU intra/SATD path vs the host path."""
import numpy as np
import pytest

from xvc_tpu import constants as k
from xvc_tpu.ops import intra_pred as ip
from xvc_tpu.ops import metrics as met
from xvc_tpu.restrictions import Restrictions
from xvc_tpu.tpu import analysis as an
from xvc_tpu.tpu import intra_batch as ib


def _host_predict(n, mode, top, left, bitdepth, restr):
    """Host reference prediction replicating intra_recon mode dispatch."""
    use_filt = ip.use_filtered_ref_samples(n, n, mode, restr)
    if use_filt:
        ftop, fleft = ip.filter_ref_samples(n, n, top, left)
    else:
        ftop, fleft = top, left
    post_filter = n <= 16
    if mode == 0:
        return ip.pred_planar(n, n, ftop, fleft)
    if mode == 1:
        return ip.pred_dc(n, n, top, left, post_filter, restr)
    return ip.pred_angular(n, n, mode, ftop, fleft, post_filter, bitdepth,
                           restr)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bitdepth", [8, 10])
def test_batched_intra_predictions_bit_exact(n, bitdepth):
    rng = np.random.RandomState(7 * n + bitdepth)
    restr = Restrictions()
    maxv = (1 << bitdepth) - 1
    frame = rng.randint(0, maxv + 1, size=(4 * n, 4 * n)).astype(np.int32)
    orig, top, left = an.extract_blocks(frame, n, bitdepth, restr)
    import jax.numpy as jnp
    weights = jnp.asarray(ib.angular_weight_tensor(n))
    preds = np.asarray(ib.predict_all_modes(
        n, jnp.asarray(top), jnp.asarray(left), weights, bitdepth, n <= 16))
    for b in range(0, orig.shape[0], 5):
        for mode in range(k.NBR_INTRA_MODES_EXT):
            ref = _host_predict(n, mode, top[b], left[b], bitdepth, restr)
            assert np.array_equal(preds[b, mode], ref), \
                f"n={n} block={b} mode={mode}"


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_batched_satd_costs_bit_exact(n):
    rng = np.random.RandomState(n)
    bitdepth = 8
    restr = Restrictions()
    frame = rng.randint(0, 256, size=(4 * n, 4 * n)).astype(np.int32)
    orig, top, left = an.extract_blocks(frame, n, bitdepth, restr)
    result = an.analyze_frame(frame, n, bitdepth)
    costs = result["costs"]
    for b in range(0, orig.shape[0], 7):
        for mode in range(0, k.NBR_INTRA_MODES_EXT, 9):
            pred = _host_predict(n, mode, top[b], left[b], bitdepth, restr)
            diff = orig[b].astype(np.int64) - pred
            ref = met.compute_satd(diff, bitdepth)
            assert costs[b, mode] == ref, f"n={n} b={b} mode={mode}"
