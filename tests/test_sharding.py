"""Sharded == unsharded invariants on a virtual 8-device CPU mesh.

The mesh shards the two scale-out axes of the codec: decode block
batches (xvc_tpu/tpu/recon.py, via __graft_entry__.dryrun_multichip)
and the encoder's whole-frame intra lookahead batches
(xvc_tpu/tpu/lookahead.py) — both must match the single-device result
exactly, the reference's determinism contract
(ref: test/xvc_test/simd_test.cc:149-176) lifted to the mesh.
"""
import numpy as np
import jax
import pytest

from xvc_tpu import engine
from xvc_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lookahead_equals_unsharded():
    from xvc_tpu.restrictions import Restrictions
    from xvc_tpu.tpu.lookahead import frame_intra_lookahead
    rng = np.random.RandomState(11)
    frame = rng.randint(0, 256, size=(96, 128)).astype(np.int32)
    restr = Restrictions()
    ref = frame_intra_lookahead(frame, 8, restr)
    mesh = make_mesh(jax.devices()[:8])
    engine.set_mesh(mesh)
    try:
        sharded = frame_intra_lookahead(frame, 8, restr)
    finally:
        engine.set_mesh(None)
    assert set(ref) == set(sharded)
    for n in ref:
        assert np.array_equal(ref[n], sharded[n]), n


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lookahead_encode_byte_identical():
    """A lookahead encode with the analysis sharded over the mesh must
    produce the same bitstream as the single-device lookahead encode."""
    from xvc_tpu import api
    rng = np.random.RandomState(4)
    w, h, frames = 64, 64, 2
    yy, xx = np.mgrid[0:h, 0:w]
    raws = []
    for t in range(frames):
        y = np.clip(100 + 50 * np.sin((xx + 3 * t) / 7.0) +
                    rng.randint(-8, 9, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        raws.append(y.tobytes() + u.tobytes() + v.tobytes())
    raw = b"".join(raws)

    def encode():
        p = api.EncoderParameters(
            width=w, height=h, qp=32, checksum_mode=1, num_ref_pics=0,
            sub_gop_length=1,
            explicit_encoder_settings="tpu_intra_lookahead 1")
        enc = api.EncoderSession(p)
        fs = w * h * 3 // 2
        nals = []
        for i in range(frames):
            nals += enc.encode(raw[i * fs:(i + 1) * fs])
        nals += enc.flush()
        return b"".join(len(n).to_bytes(4, "little") + n for n in nals)

    unsharded = encode()
    engine.set_mesh(make_mesh(jax.devices()[:8]))
    try:
        sharded = encode()
    finally:
        engine.set_mesh(None)
    assert sharded == unsharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gop_pipeline_mesh_encode_byte_identical(monkeypatch):
    """GOP-across-devices pipeline: a threaded encode with each
    in-flight picture's device stages pinned round-robin to a mesh
    device (the TPU analog of the reference picture-per-thread pool,
    ref: src/xvc_enc_lib/thread_encoder.cc:99-158) must produce a
    byte-identical bitstream to the sequential single-device encode."""
    from xvc_tpu import api
    from .util import read_data
    monkeypatch.setenv("XVC_ME", "jax")
    raw = read_data("sp48x32_in.yuv")
    fs = 48 * 32 * 3 // 2

    def run(threads):
        p = api.EncoderParameters(
            width=48, height=32, qp=32, sub_gop_length=4, checksum_mode=1,
            threads=threads,
            explicit_encoder_settings="tpu_intra_lookahead 1")
        enc = api.EncoderSession(p)
        nals = []
        for i in range(6):
            nals += enc.encode(raw[i * fs:(i + 1) * fs])
        nals += enc.flush()
        return b"".join(len(n).to_bytes(4, "little") + n for n in nals)

    seq = run(0)
    engine.set_mesh(make_mesh(jax.devices()[:8]))
    try:
        piped = run(4)
    finally:
        engine.set_mesh(None)
    assert piped == seq


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.block_until_ready(fn(*args))
    # flagship decode-path MC kernel: one 16x16 block per batch entry
    assert out.shape == (args[1].shape[1], 16, 16)
