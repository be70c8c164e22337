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
