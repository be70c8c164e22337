"""Device intra-scan kernel vs the host intra predictor, bit-exact.

Randomized geometry / availability / mode sweep: each case runs one
leaf through the lax.scan kernel (resi=0 so the written block equals
the prediction) and through the host path
(compute_ref_samples -> filter -> pred_*), asserting equality.
"""
import numpy as np
import pytest

from xvc_tpu.ops import intra_pred as ip
from xvc_tpu.restrictions import Restrictions
from xvc_tpu.tpu import intra_scan


def _host_pred(n_w, n_h, mode, plane, px, py, flags, bitdepth, restr):
    has_l, has_a, has_al, sbl, sar = flags
    top, left = ip.compute_ref_samples(
        n_w, n_h, plane, px, py, has_l, has_a, has_al, sbl, sar,
        bitdepth, restr)
    use_filt = ip.use_filtered_ref_samples(n_w, n_h, mode, restr)
    if use_filt:
        ftop, fleft = ip.filter_ref_samples(n_w, n_h, top, left)
    else:
        ftop, fleft = top, left
    post = n_w <= 16 and n_h <= 16
    if mode == 0:
        return ip.pred_planar(n_w, n_h, ftop, fleft)
    if mode == 1:
        return ip.pred_dc(n_w, n_h, top, left, post, restr)
    return ip.pred_angular(n_w, n_h, mode, ftop, fleft, post, bitdepth,
                           restr)


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_intra_scan_matches_host(bitdepth):
    rng = np.random.RandomState(41 + bitdepth)
    restr = Restrictions()
    H, W = 128, 160
    plane = rng.randint(0, 1 << bitdepth, (H, W)).astype(np.int32)
    fn = intra_scan.make_intra_scan(H + intra_scan.PAD_TL +
                                    intra_scan.PAD_BR,
                                    W + intra_scan.PAD_TL +
                                    intra_scan.PAD_BR, bitdepth)
    resi = np.zeros_like(plane)
    dev_plane = intra_scan.plane_pad(plane)
    dev_resi = intra_scan.plane_pad(resi)

    import jax.numpy as jnp
    cases = []
    for _ in range(120):
        w = int(rng.choice([4, 8, 16, 32, 64]))
        h = int(rng.choice([4, 8, 16, 32, 64]))
        px = int(rng.randint(0, (W - w) // 4 + 1)) * 4
        py = int(rng.randint(0, (H - h) // 4 + 1)) * 4
        mode = int(rng.randint(0, 67))
        has_l = px > 0 and bool(rng.randint(0, 2))
        has_a = py > 0 and bool(rng.randint(0, 2))
        has_al = has_l and has_a and bool(rng.randint(0, 2))
        sbl = int(rng.randint(0, min(w, H - (py + h)) + 1)) \
            if has_l and py + h < H else 0
        sar = int(rng.randint(0, min(h, W - (px + w)) + 1)) \
            if has_a and px + w < W else 0
        cases.append((px, py, w, h, mode, has_l, has_a, has_al, sbl, sar))

    meta = np.zeros((len(cases), intra_scan.META_COLS), np.int32)
    for i, (px, py, w, h, mode, hl, ha, hal, sbl, sar) in \
            enumerate(cases):
        meta[i] = (px, py, w, h, mode, int(hl), int(ha), int(hal),
                   sbl, sar, 1)

    out = np.asarray(fn(jnp.asarray(dev_plane), jnp.asarray(dev_resi),
                        jnp.asarray(meta)))
    pt = intra_scan.PAD_TL
    # NOTE: each scan step overwrote its block in the carried plane;
    # run cases one-at-a-time instead to compare against the pristine
    # host plane (the batch above exercises compile once).
    for (px, py, w, h, mode, hl, ha, hal, sbl, sar) in cases[:40]:
        m1 = np.zeros((1, intra_scan.META_COLS), np.int32)
        m1[0] = (px, py, w, h, mode, int(hl), int(ha), int(hal),
                 sbl, sar, 1)
        got = np.asarray(fn(jnp.asarray(dev_plane),
                            jnp.asarray(dev_resi), jnp.asarray(m1)))
        blk = got[pt + py:pt + py + h, pt + px:pt + px + w].astype(
            np.int32)
        want = _host_pred(w, h, mode, plane, px, py,
                          (hl, ha, hal, sbl, sar), bitdepth, restr)
        assert np.array_equal(blk, want), \
            (w, h, mode, hl, ha, hal, sbl, sar, px, py)
