"""Device transform-RD intra mode prepass (tpu/txrd_prepass.py): the
batched predict+transform+quant+rate ranking must (a) produce a
conforming decodable stream, (b) keep native and Python consumption
byte-identical, (c) track the full mode search's RD closely, and
(d) fall back to the exact search off the aligned grid.  Replaces the
role of ref: src/xvc_enc_lib/intra_search.cc:188-303 +
transform_encoder.cc:54-200 at covered blocks (conforming fast mode).
"""
import os

import numpy as np
import pytest

from xvc_tpu.codec.encoder import encode_stream
from xvc_tpu.codec.encoder_settings import EncoderSettings
from xvc_tpu.codec.decoder import decode_stream
from xvc_tpu.nal import write_nal_units


def synthetic_yuv420(w, h, f, seed=3):
    rng = np.random.RandomState(seed)
    base = (128 + 60 * np.sin(np.arange(w)[None, :] / 9.0) *
            np.cos(np.arange(h)[:, None] / 7.0)).astype(np.uint8)
    out = []
    for i in range(f):
        y = np.roll(base, i * 2, axis=1).copy()
        y[h // 2:, :] = rng.randint(0, 256, (h - h // 2, w))
        u = np.full((h // 2, w // 2), 110 + i, np.uint8)
        v = np.full((h // 2, w // 2), 130 - i, np.uint8)
        out += [y.tobytes(), u.tobytes(), v.tobytes()]
    return b"".join(out)


def _encode(yuv, w, h, f, txrd, native):
    os.environ["XVC_ENC_NATIVE"] = "1" if native else "0"
    try:
        s = EncoderSettings()
        s.initialize_speed(2)
        s.tpu_txrd_prepass = txrd
        nals = encode_stream(yuv, w, h, f, qp=32, settings=s,
                             sub_gop_length=1, num_ref_pics=0,
                             checksum_mode=1)
        return write_nal_units(nals)
    finally:
        os.environ["XVC_ENC_NATIVE"] = "1"


def _psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_txrd_prepass_native_python_byte_identical():
    """The native candidate lookup (xvcn_enc.inc enc_intra_cand_lookup)
    and the Python twin consume the same device maps bit for bit."""
    w, h, f = 128, 96, 2
    yuv = synthetic_yuv420(w, h, f)
    a = _encode(yuv, w, h, f, 2, True)
    b = _encode(yuv, w, h, f, 2, False)
    assert a == b


def test_txrd_prepass_conforming_and_rd_close():
    w, h, f = 128, 96, 2
    yuv = synthetic_yuv420(w, h, f)
    full = _encode(yuv, w, h, f, 0, True)
    tx = _encode(yuv, w, h, f, 2, True)
    pics = decode_stream(tx)
    assert len(pics) == f and all(p.conforming for p in pics)
    # RD proximity: pruned candidates may differ, but neither bitrate
    # nor quality may collapse vs the full mode search
    assert len(tx) <= len(full) * 1.05, (len(tx), len(full))
    src = np.frombuffer(yuv, np.uint8).reshape(f, -1)
    rec = np.stack([np.frombuffer(p.bytes, np.uint8) for p in pics])
    ref = np.stack([np.frombuffer(p.bytes, np.uint8)
                    for p in decode_stream(full)])
    assert _psnr(src, rec) >= _psnr(src, ref) - 0.25


def test_txrd_prepass_unaligned_frame_falls_back():
    """A frame size with partial edge blocks: edge CUs miss the maps
    (packed -1) and take the exact search; stream stays conforming."""
    w, h, f = 44, 36, 1
    yuv = synthetic_yuv420(w, h, f)
    tx = _encode(yuv, w, h, f, 2, True)
    pics = decode_stream(tx)
    assert len(pics) == f and all(p.conforming for p in pics)


def test_txrd_prepass_restricted_mode_disables_maps():
    """Non-default intra toolsets (restricted modes) must skip the
    device maps entirely (the batched predictor implements the default
    toolset only) and still produce the unchanged restricted stream."""
    os.environ["XVC_ENC_NATIVE"] = "0"
    try:
        w, h, f = 64, 48, 1
        yuv = synthetic_yuv420(w, h, f)

        def enc(txrd):
            s = EncoderSettings()
            s.initialize_speed(2)
            s.initialize_restricted(1)  # mode A: 35-mode intra
            s.tpu_txrd_prepass = txrd
            nals = encode_stream(yuv, w, h, f, qp=32, settings=s,
                                 sub_gop_length=1, num_ref_pics=0,
                                 checksum_mode=1)
            return write_nal_units(nals)

        assert enc(2) == enc(0)
    finally:
        os.environ["XVC_ENC_NATIVE"] = "1"


def test_pack_intra_cands_layout():
    """Packed buffer layout must match the native lookup's offsets:
    4/8/16/32 ceil grids x K, -1 on uncovered entries."""
    from xvc_tpu.tpu.txrd_prepass import pack_intra_cands
    w, h, keep = 44, 36, 2
    maps = {4: np.zeros((9, 11, 2), np.int8) + 5,
            8: np.zeros((4, 5, 2), np.int8) + 7}
    buf = pack_intra_cands(maps, w, h, keep)
    g4 = 9 * 11 * 2
    g8 = -(-36 // 8) * -(-44 // 8) * 2  # ceil grid: 5 x 6
    g16 = -(-36 // 16) * -(-44 // 16) * 2
    g32 = -(-36 // 32) * -(-44 // 32) * 2
    assert buf.size == g4 + g8 + g16 + g32
    assert (buf[:g4] == 5).all()
    b8 = buf[g4:g4 + g8].reshape(5, 6, 2)
    assert (b8[:4, :5] == 7).all()
    assert (b8[4, :] == -1).all() and (b8[:, 5] == -1).all()
    assert (buf[g4 + g8:] == -1).all()
