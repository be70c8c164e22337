"""Run the device kernels on the REAL TPU backend (not the CPU mesh).

The rest of the suite pins the JAX path on a virtual CPU mesh
(tests/conftest.py); these tests spawn subprocesses WITHOUT the CPU pin
so the same integer kernels execute on the actual TPU, proving MXU/VPU
integer semantics match the host bit-for-bit (VERDICT round-1 item 7).
Skipped when no TPU backend is attached.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHECK = r"""
import sys
import jax
if jax.default_backend() not in ("tpu",):
    sys.exit(42)
"""

_KERNELS = _CHECK + r"""
import numpy as np
import jax.numpy as jnp
from xvc_tpu.tpu import dsp
from xvc_tpu.ops import transform as tx, quant as q
from xvc_tpu import constants as k

rng = np.random.RandomState(7)
# dequant + inverse transform: rectangular blocks, 8/10/12-bit
for (w, h, bd, txv, txh) in [(8, 8, 8, 0, 0), (4, 16, 10, 0, 0),
                             (32, 8, 12, 0, 0), (16, 16, 8, 2, 5),
                             (64, 64, 10, 0, 0)]:
    coeff = rng.randint(-2000, 2000, (5, h, w)).astype(np.int16)
    coeff[:, min(4, h):, :] = 0
    qp = q.Qp(32, k.ChromaFormat.YUV420, bd)
    bias = ((w.bit_length() + h.bit_length()) % 2) != 0
    scale = qp.get_inv_scale(0) * (181 if bias else 1)
    fn = dsp.make_dequant_itx_direct(w, h, bd, txv, txh, "gen", True)
    dev = np.asarray(fn(jnp.asarray(coeff),
                        jnp.full((5,), scale, np.int32)))
    for i in range(5):
        dq = q.dequant_np(coeff[i], 0, qp, w, h, bd)
        host = tx.inverse_transform_np(
            dq, k.TransformType(txv) if txv else k.TransformType.DEFAULT,
            k.TransformType(txh) if txh else k.TransformType.DEFAULT,
            bd, True)
        assert np.array_equal(dev[i], host), (w, h, bd, txv, txh, i)
print("KERNELS-OK")
"""

_DECODE = _CHECK + r"""
from xvc_tpu.codec.decoder import decode_stream
for name in ("ra64x48", "ai64x48b10"):
    bs = open("tests/data/%s.xvc" % name, "rb").read()
    exp = open("tests/data/%s_dec.yuv" % name, "rb").read()
    pics = decode_stream(bs)
    assert all(p.conforming for p in pics), name
    assert b"".join(p.bytes for p in pics) == exp, name
print("DECODE-OK")
"""

_SATD = _CHECK + r"""
import numpy as np
import jax
import jax.numpy as jnp
from xvc_tpu import constants as k
from xvc_tpu.ops import intra_pred as ip
from xvc_tpu.ops import metrics as met
from xvc_tpu.restrictions import Restrictions
from xvc_tpu.tpu import analysis as an

rng = np.random.RandomState(11)
restr = Restrictions()
for n, bd in ((8, 8), (16, 10), (4, 12)):
    frame = rng.randint(0, 1 << bd, size=(4 * n, 4 * n)).astype(np.int32)
    orig, top, left = an.extract_blocks(frame, n, bd, restr)
    fn = an.make_intra_satd_fn(n, bd)
    costs = np.asarray(jax.block_until_ready(
        fn(jnp.asarray(orig), jnp.asarray(top), jnp.asarray(left))))
    for b in range(0, orig.shape[0], 5):
        for mode in range(0, k.NBR_INTRA_MODES_EXT, 7):
            use_filt = ip.use_filtered_ref_samples(n, n, mode, restr)
            ftop, fleft = (ip.filter_ref_samples(n, n, top[b], left[b])
                           if use_filt else (top[b], left[b]))
            if mode == 0:
                pred = ip.pred_planar(n, n, ftop, fleft)
            elif mode == 1:
                pred = ip.pred_dc(n, n, top[b], left[b], n <= 16, restr)
            else:
                pred = ip.pred_angular(n, n, mode, ftop, fleft, n <= 16,
                                       bd, restr)
            diff = orig[b].astype(np.int64) - pred
            ref = met.compute_satd(diff, bd)
            assert costs[b, mode] == ref, (n, bd, b, mode)
print("SATD-OK")
"""


def _run_on_tpu(code, timeout=900, extra_env=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = os.environ.get("XVC_TPU_PLATFORM", "axon,tpu")
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    if extra_env:
        env.update(extra_env)
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    if r.returncode == 42:
        pytest.skip("no TPU backend attached")
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.tpu
def test_tpu_dequant_itx_exact_on_device():
    out = _run_on_tpu(_KERNELS)
    assert "KERNELS-OK" in out


@pytest.mark.tpu
@pytest.mark.slow
def test_tpu_full_decode_bit_exact_on_device():
    out = _run_on_tpu(_DECODE, timeout=1500,
                      extra_env={"XVC_DSP": "jax"})
    assert "DECODE-OK" in out


@pytest.mark.tpu
def test_tpu_intra_satd_exact_on_device():
    out = _run_on_tpu(_SATD)
    assert "SATD-OK" in out
