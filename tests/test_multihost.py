"""Multi-host (multi-process) mesh: sharded lookahead == single-host.

Two local processes form a JAX multi-controller cluster (CPU backend,
2 devices each -> a 4-device global mesh); the encoder's whole-frame
intra lookahead sharded over that process-spanning mesh must produce
exactly the single-process result — the sharded==unsharded determinism
contract (ref: test/xvc_test/simd_test.cc:149-176) lifted across hosts
(xvc_tpu/parallel/multihost.py).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from xvc_tpu.parallel import multihost
ok = multihost.init(coordinator_address='127.0.0.1:' + port,
                    num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, jax.process_count()
from xvc_tpu import engine
from xvc_tpu.restrictions import Restrictions
from xvc_tpu.tpu.lookahead import frame_intra_lookahead
rng = np.random.RandomState(21)
frame = rng.randint(0, 256, size=(64, 96)).astype(np.int32)
engine.set_mesh(multihost.global_mesh())
try:
    maps = frame_intra_lookahead(frame, 8, Restrictions())
finally:
    engine.set_mesh(None)
if pid == 0:
    np.savez(out, **{str(n): maps[n] for n in maps})
print('WORKER_OK', pid)
"""


@pytest.mark.slow
def test_multihost_lookahead_matches_single(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    out = str(tmp_path / "mh.npz")
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, port, str(i), out],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=420)
            outs.append((p.returncode, o, e))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process jax cluster did not come up")
    for rc, o, e in outs:
        if rc != 0 and ("UNIMPLEMENTED" in e or "not supported" in e or
                        "Unable to initialize" in e):
            pytest.skip("multi-process CPU collectives unsupported: " +
                        e[-200:])
        assert rc == 0, e[-2000:]
        assert "WORKER_OK" in o

    # single-process reference (unsharded)
    from xvc_tpu.restrictions import Restrictions
    from xvc_tpu.tpu.lookahead import frame_intra_lookahead
    rng = np.random.RandomState(21)
    frame = rng.randint(0, 256, size=(64, 96)).astype(np.int32)
    ref = frame_intra_lookahead(frame, 8, Restrictions())
    got = np.load(out)
    assert set(got.files) == {str(n) for n in ref}
    for n in ref:
        assert np.array_equal(ref[n], got[str(n)]), n


GOP_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
port, pid = sys.argv[1], int(sys.argv[2])
from xvc_tpu.parallel import multihost
ok = multihost.init(coordinator_address='127.0.0.1:' + port,
                    num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, jax.process_count()
from xvc_tpu.codec.encoder import encode_stream
from xvc_tpu.codec.encoder_settings import EncoderSettings

W, H, F = 32, 24, 6
rng = np.random.RandomState(5)
frames = []
for f in range(F):
    y = ((np.arange(H)[:, None] * 3 + np.arange(W)[None, :] * 5 + f * 7)
         % 220 + rng.randint(0, 30, (H, W))).astype(np.uint8)
    u = np.full((H // 2, W // 2), 90 + f, np.uint8)
    v = np.full((H // 2, W // 2), 150 - f, np.uint8)
    frames += [y.tobytes(), u.tobytes(), v.tobytes()]
yuv = b''.join(frames)

def run(mh):
    s = EncoderSettings()
    s.initialize_speed(2)
    s.explicit_restrictions = multihost.GOP_PIPELINE_PROFILE
    s.multihost_gop = mh
    return b''.join(encode_stream(yuv, W, H, F, qp=30, settings=s,
                                  sub_gop_length=4, num_ref_pics=1))

single = run(0)   # every process encodes everything (deterministic)
multi = run(1)    # pictures split over processes, recon broadcast
assert multi == single, (len(multi), len(single))
print('GOP_WORKER_OK', pid, len(single))
"""


@pytest.mark.slow
def test_multihost_gop_pipelined_encode_byte_identical():
    """Cross-host GOP pipelining: the sub-GOP's pictures split over a
    2-process mesh by DOC ownership, recon planes broadcast over the
    global mesh — bitstream byte-identical to the single-host encode
    (the multi-host analog of ref: src/xvc_enc_lib/thread_encoder.cc:
    99-158 picture-level parallelism)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, "-c", GOP_WORKER, port, str(i)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=420)
            outs.append((p.returncode, o, e))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process jax cluster did not come up")
    for rc, o, e in outs:
        if rc != 0 and ("UNIMPLEMENTED" in e or "not supported" in e or
                        "Unable to initialize" in e):
            pytest.skip("multi-process CPU collectives unsupported: " +
                        e[-200:])
        assert rc == 0, e[-2000:]
        assert "GOP_WORKER_OK" in o
