"""Native (C++) vs Python path bit-exactness.

The framework's determinism contract, mirroring the reference's SIMD
on/off tests (ref: test/xvc_test/simd_test.cc:149-176): the native
entropy engines / RDO quantizer must produce byte-identical bitstreams
and identical decoded pictures to the pure-Python reference path.
"""
import numpy as np
import pytest

import xvc_tpu.native as native
from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream

from .util import read_data


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _with_python_path(fn):
    lib = native.LIB
    native.LIB = None
    try:
        return fn()
    finally:
        native.LIB = lib


def _synth_frame(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (rng.randint(0, 60, size=(h, w)) + 90 + 50 * np.sin(xx / 5.0) +
         40 * np.cos(yy / 7.0)).clip(0, 255).astype(np.uint8)
    u = ((xx[:h // 2, :w // 2] * 3 + seed) % 200 + 20).astype(np.uint8)
    v = ((yy[:h // 2, :w // 2] * 2 + seed) % 200 + 20).astype(np.uint8)
    return y.tobytes() + u.tobytes() + v.tobytes()


def _encode(w, h, frames, **kw):
    p = api.EncoderParameters(width=w, height=h, checksum_mode=1, **kw)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(frames):
        nals += enc.encode(_synth_frame(w, h, i))
    nals += enc.flush()
    return b"".join(len(n).to_bytes(4, "little") + n for n in nals)


def test_encode_native_equals_python():
    native_bs = _encode(24, 16, 2, qp=30, num_ref_pics=0, sub_gop_length=1)
    python_bs = _with_python_path(
        lambda: _encode(24, 16, 2, qp=30, num_ref_pics=0, sub_gop_length=1))
    assert native_bs == python_bs


def test_decode_native_equals_python():
    bitstream = read_data("ra64x48.xvc")
    pics_n = decode_stream(bitstream)
    pics_p = _with_python_path(lambda: decode_stream(bitstream))
    assert [p.poc for p in pics_n] == [p.poc for p in pics_p]
    for a, b in zip(pics_n, pics_p):
        assert a.conforming and b.conforming
        assert a.bytes == b.bytes
