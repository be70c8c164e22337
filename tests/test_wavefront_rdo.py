"""Bottom-up batched split RDO (tpu/wavefront_rdo.py): the device
lookahead maps + vectorized split DP must (a) produce a conforming,
decodable bitstream, (b) track the full top-down search's RD closely,
and (c) actually prune the quad recursion (decisions are forced).
Replaces the role of ref: src/xvc_enc_lib/cu_encoder.cc:123-273 at
DP-decided nodes."""
import numpy as np
import pytest

from xvc_tpu.codec.encoder import encode_stream
from xvc_tpu.codec.encoder_settings import EncoderSettings
from xvc_tpu.codec.decoder import decode_stream

def synthetic_yuv420(w, h, f, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(f):
        y = np.zeros((h, w), np.uint8)
        y[:, :w // 2] = 100 + i * 3          # flat half
        y[:, w // 2:] = rng.randint(0, 256, (h, w // 2))  # detailed half
        u = np.full((h // 2, w // 2), 110 + i, np.uint8)
        v = np.full((h // 2, w // 2), 130 - i, np.uint8)
        out += [y.tobytes(), u.tobytes(), v.tobytes()]
    return b"".join(out)


def _encode(yuv, w, h, f, split_dp):
    s = EncoderSettings()
    s.initialize_speed(2)
    s.tpu_split_dp = split_dp
    nals = encode_stream(yuv, w, h, f, qp=32, settings=s,
                         sub_gop_length=1, num_ref_pics=0,
                         checksum_mode=1)
    from xvc_tpu.nal import write_nal_units
    return write_nal_units(nals)


def _psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


@pytest.mark.slow
def test_split_dp_conforming_and_rd_close():
    w, h, f = 64, 64, 2
    yuv = synthetic_yuv420(w, h, f, seed=9)
    full = _encode(yuv, w, h, f, 0)
    dp = _encode(yuv, w, h, f, 1)

    pics = decode_stream(dp)
    assert len(pics) == f and all(p.conforming for p in pics)

    # RD proximity: the DP stream may differ, but neither bitrate nor
    # quality may collapse vs the full search
    assert len(dp) <= len(full) * 1.15, (len(dp), len(full))
    src = np.frombuffer(yuv, np.uint8).reshape(f, -1)
    rec = np.stack([np.frombuffer(p.bytes, np.uint8) for p in pics])
    ref_pics = decode_stream(full)
    ref = np.stack([np.frombuffer(p.bytes, np.uint8) for p in ref_pics])
    psnr_dp = _psnr(src, rec)
    psnr_full = _psnr(src, ref)
    assert psnr_dp >= psnr_full - 0.5, (psnr_dp, psnr_full)


def test_split_dp_forces_decisions():
    """The DP must actually decide something on structured content:
    flat regions force leaves, detailed regions force splits."""
    from xvc_tpu.tpu.wavefront_rdo import (split_dp_from_lookahead,
                                           FORCE_LEAF, FORCE_SPLIT,
                                           decision_for, UNDECIDED)
    from xvc_tpu.tpu.lookahead import frame_intra_lookahead
    from xvc_tpu.restrictions import Restrictions
    yy, xx = np.mgrid[0:32, 0:32]
    frame = np.zeros((64, 128), np.int32)
    frame[:, :64] = 128                      # flat 64 block -> leaf
    # mode-adaptive 64 block: each 32 quadrant fits a different intra
    # mode (stripes in three directions + flat), so one shared 64 mode
    # is decisively worse than four per-quadrant modes -> forced quad.
    # (Pure noise is a genuine near-tie: SATD is ~additive across block
    # sizes, so noisy nodes stay UNDECIDED by design.)
    q = np.zeros((64, 64), np.int32)
    q[:32, :32] = 128 + 90 * ((yy >> 2) & 1)
    q[:32, 32:] = 128 + 90 * ((xx >> 2) & 1)
    q[32:, :32] = 128 + 90 * (((xx + yy) >> 2) & 1)
    q[32:, 32:] = 40
    frame[:, 64:] = q
    maps = frame_intra_lookahead(frame, 8, Restrictions(),
                                 sizes=(4, 8, 16, 32, 64))
    force = split_dp_from_lookahead(maps, lambda_sqrt=8.0)
    assert set(force) == {8, 16, 32, 64}
    # flat side: 32/64 nodes decided as leaves
    assert decision_for(force, 0, 0, 32, 32) == FORCE_LEAF
    assert decision_for(force, 32, 32, 32, 32) == FORCE_LEAF
    assert decision_for(force, 0, 0, 64, 64) == FORCE_LEAF
    assert decision_for(force, 64, 0, 64, 64) == FORCE_SPLIT
    # non-square / unaligned / unmapped queries stay undecided
    assert decision_for(force, 0, 0, 32, 16) == UNDECIDED
    assert decision_for(force, 8, 0, 16, 16) == UNDECIDED
    assert decision_for(force, 0, 0, 128, 128) == UNDECIDED
    assert decision_for(None, 0, 0, 32, 32) == UNDECIDED


def test_split_dp_near_ties_stay_undecided():
    """Forcing requires a decisive (> MARGIN_NUM/MARGIN_DEN - 1) win:
    when leaf and quad costs are within the margin of each other, the
    node must be UNDECIDED so the encoder's full search decides it."""
    from xvc_tpu.tpu.wavefront_rdo import (split_dp_from_lookahead,
                                           UNDECIDED, FORCE_LEAF,
                                           FORCE_SPLIT, MODE_BITS,
                                           SPLIT_BITS)
    lam = 0.0  # zero lambda: costs are exactly the map minima
    base = 10000

    def dp(maps, **kw):
        return split_dp_from_lookahead(maps, lam, **kw)[16][0, 0]

    # one 16x16 node over four 8x8 children; leaf == sum(children);
    # max_binary_size=0 isolates the leaf-vs-quad comparison
    maps = {8: np.full((2, 2, 1), base // 4, np.int32),
            16: np.full((1, 1, 1), base, np.int32)}
    assert dp(maps, max_binary_size=0) == UNDECIDED
    # 2% better split: still inside the (5%) margin -> undecided
    maps[8][:] = int(base * 0.98) // 4
    assert dp(maps, max_binary_size=0) == UNDECIDED
    # 20% better split: decisive -> forced split
    maps[8][:] = int(base * 0.80) // 4
    assert dp(maps, max_binary_size=0) == FORCE_SPLIT
    # ... but with binary splits legal, the same geometry is reachable
    # via hor/ver arms, so quad is never decisively better -> undecided
    assert dp(maps) == UNDECIDED
    # 20% better leaf: decisive -> forced leaf (binary can't beat the
    # leaf either: its parts cost the same as quad's children)
    maps[8][:] = int(base * 1.25) // 4
    maps[16][:] = base
    assert dp(maps, max_binary_size=0) == FORCE_LEAF
    assert dp(maps) == FORCE_LEAF


def test_speed3_native_python_identical_and_conforming():
    """speed_mode 3 (TPU: fast knobs + device split DP) must produce
    byte-identical streams from the native encoder and the Python twin,
    stay conforming, and actually force decisions on structured
    content."""
    import os
    from xvc_tpu.tpu import wavefront_rdo as wf
    w, h, f = 192, 192, 2
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(5)
    frames = []
    for t in range(f):
        y = np.zeros((h, w), np.int32)
        y[:64] = 210                                   # flat band
        y[64:128] = 128 + 80 * (((xx[:64] + 4 * t) >> 3) & 1)  # stripes
        y[128:] = 128 + rng.randint(-20, 21, (64, w))  # noise band
        frames += [np.clip(y, 0, 255).astype(np.uint8).tobytes(),
                   np.full((h // 2, w // 2), 120, np.uint8).tobytes(),
                   np.full((h // 2, w // 2), 130, np.uint8).tobytes()]
    yuv = b"".join(frames)

    forced = []
    orig_pack = wf.pack_force_maps

    def pack_spy(fm, pw, ph, sizes=(8, 16, 32, 64)):
        buf = orig_pack(fm, pw, ph, sizes)
        forced.append(int((buf != 0).sum()))
        return buf

    def enc(native):
        os.environ["XVC_ENC_NATIVE"] = "1" if native else "0"
        try:
            s = EncoderSettings()
            s.initialize_speed(3)
            nals = encode_stream(yuv, w, h, f, qp=32, settings=s,
                                 sub_gop_length=2, num_ref_pics=1,
                                 checksum_mode=1)
        finally:
            os.environ.pop("XVC_ENC_NATIVE", None)
        from xvc_tpu.nal import write_nal_units
        return write_nal_units(nals)

    wf.pack_force_maps = pack_spy
    try:
        nat = enc(True)
    finally:
        wf.pack_force_maps = orig_pack
    assert forced and any(n > 0 for n in forced), forced
    pyt = enc(False)
    assert nat == pyt, (len(nat), len(pyt))
    pics = decode_stream(nat)
    assert len(pics) == f and all(p.conforming for p in pics)
