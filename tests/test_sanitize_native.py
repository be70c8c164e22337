"""Sanitized native runtime: no UB under golden + damaged streams.

Rebuilds the C++ runtime with UBSan (trap-on-error: memory/bounds/
control-flow classes) in a subprocess and drives full decodes plus the
fuzz corpus through it — the analog of the reference's SANITIZE_BUILD
CI axis (ref: CMakeLists.txt:22, src/CMakeLists.txt:204-207).  A trap
(SIGILL) fails the test.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = r"""
import random
from xvc_tpu import native
assert native.available(), "sanitized native build failed"
from xvc_tpu.codec.decoder import decode_stream
from xvc_tpu import api

for name in ("ra64x48", "ai64x48b10", "rm3_64x48"):
    bs = open("tests/data/%s.xvc" % name, "rb").read()
    exp = open("tests/data/%s_dec.yuv" % name, "rb").read()
    pics = decode_stream(bs)
    assert b"".join(p.bytes for p in pics) == exp, name

# damaged NALs through the sanitized entropy/DSP runtime
rng = random.Random(9)
data = open("tests/data/ld64x48.xvc", "rb").read()
nals, off = [], 0
while off + 4 <= len(data):
    ln = int.from_bytes(data[off:off + 4], "little"); off += 4
    nals.append(data[off:off + ln]); off += ln
for damage in range(len(nals)):
    dec = api.DecoderSession()
    for i, n in enumerate(nals):
        b = bytearray(n)
        if i == damage:
            for _ in range(10):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        dec.decode_nal(bytes(b))
    dec.flush()
print("SANITIZE-OK")
"""


@pytest.mark.slow
def test_native_runtime_sanitized():
    env = dict(os.environ, XVC_NATIVE_SANITIZE="1", XVC_NATIVE="1")
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    r = subprocess.run([sys.executable, "-c", _CODE], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, (r.returncode, r.stderr[-1500:])
    assert "SANITIZE-OK" in r.stdout
