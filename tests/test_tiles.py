"""CTU-tile-row extension: per-tile CABAC contexts + prediction cut at
tile tops (xvc_tpu extension; SURVEY.md §2.5/§5 in-picture scale-out).

Contracts pinned here:
  * tile streams roundtrip conformingly (intra and inter configs),
  * the tile cut really is independent: decoding a tile's substream
    must not depend on the other tiles' parse state,
  * every NAL of a tile stream is rfe-flagged so baseline (reference)
    decoders skip the stream cleanly instead of misparsing,
  * tile_rows=1 produces the plain (reference-compatible) stream.
"""
import numpy as np
import pytest

from xvc_tpu import constants as k
from xvc_tpu.codec.decoder import Decoder, decode_stream
from xvc_tpu.codec.encoder import encode_stream
from xvc_tpu.codec.encoder_settings import EncoderSettings


def synthetic_yuv420(w, h, f, seed=5):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(f):
        y = (128 + 80 * np.sin(2 * np.pi * (xx + 5 * t) / w) *
             np.cos(2 * np.pi * yy / h) +
             rng.randint(-10, 11, (h, w))).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + t, np.uint8)
        v = rng.randint(100, 156, (h // 2, w // 2)).astype(np.uint8)
        out += [y.tobytes(), u.tobytes(), v.tobytes()]
    return b"".join(out)


def _encode(yuv, w, h, f, tile_rows, num_ref_pics=0, sub_gop=1):
    s = EncoderSettings()
    s.initialize_speed(2)
    s.tile_rows = tile_rows
    return encode_stream(yuv, w, h, f, qp=32, settings=s,
                         sub_gop_length=sub_gop, num_ref_pics=num_ref_pics,
                         checksum_mode=1)


def _psnr(a, b):
    d = np.frombuffer(a, np.uint8).astype(np.int64) - \
        np.frombuffer(b, np.uint8).astype(np.int64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _frame(nals):
    from xvc_tpu.nal import write_nal_units
    return write_nal_units(nals)


def test_tiles_intra_roundtrip_and_rfe_flag():
    w, h, f = 64, 192, 2  # 3 CTU rows
    yuv = synthetic_yuv420(w, h, f)
    nals = _encode(yuv, w, h, f, tile_rows=3)
    for nal in nals:
        assert (nal[0] >> 6) & 1 == 1, "tile NAL must be rfe-flagged"
    pics = decode_stream(_frame(nals))
    assert len(pics) == f and all(p.conforming for p in pics)
    # quality sanity: the tile cut costs bits, not correctness
    src = yuv[:w * h * 3 // 2]
    assert _psnr(src, pics[0].bytes) > 28.0


def test_tiles_inter_roundtrip():
    w, h, f = 64, 128, 4  # 2 CTU rows, inter GOP
    yuv = synthetic_yuv420(w, h, f, seed=9)
    nals = _encode(yuv, w, h, f, tile_rows=2, num_ref_pics=2, sub_gop=4)
    pics = decode_stream(_frame(nals))
    assert len(pics) == f and all(p.conforming for p in pics)


def test_tiles_vs_plain_stream():
    """tile_rows<=1 keeps the plain stream (byte-identical to a build
    without the feature); tiles change the bitstream but not the
    quality envelope."""
    w, h, f = 64, 128, 1
    yuv = synthetic_yuv420(w, h, f, seed=2)
    plain = _frame(_encode(yuv, w, h, f, tile_rows=0))
    plain1 = _frame(_encode(yuv, w, h, f, tile_rows=1))
    assert plain == plain1
    tiled = _frame(_encode(yuv, w, h, f, tile_rows=2))
    assert tiled != plain
    p0 = decode_stream(plain)[0]
    t0 = decode_stream(tiled)[0]
    assert p0.conforming and t0.conforming
    src = yuv[:w * h * 3 // 2]
    assert _psnr(src, t0.bytes) >= _psnr(src, p0.bytes) - 0.7


def test_tile_substreams_parse_independently():
    """Each tile's CABAC substream must decode without the other tiles'
    parse state: zeroing the LAST tile's payload bytes must not change
    the first tile's reconstruction (it fails the checksum, but the
    top tile rows decode identically)."""
    w, h, f = 64, 128, 1
    yuv = synthetic_yuv420(w, h, f, seed=7)
    nals = _encode(yuv, w, h, f, tile_rows=2)
    good = decode_stream(_frame(nals))[0]
    pic_nal = bytearray(nals[-1])
    # picture payload layout: header .. | size0 size1 (32b each) | t0 | t1
    # find the size table: header is byte-aligned; sizes directly follow.
    # Reconstruct offsets from the segment-parsed sizes:
    from xvc_tpu.bitio import BitReader
    from xvc_tpu import segment as seg
    seg_nals = list(nals)
    state, sh, _ = seg.read_segment_header(BitReader(seg_nals[0][1:]), 0,
                                           ext_allowed=True)
    assert sh is not None and sh.tile_rows == 2
    # locate the size table by scanning: the two 32-bit sizes plus the
    # table and the max-robust MD5 checksum (3x16B) must span the NAL
    total = len(pic_nal)
    found = None
    for off in range(2, total - 8):
        s0 = int.from_bytes(pic_nal[off:off + 4], "big")
        s1 = int.from_bytes(pic_nal[off + 4:off + 8], "big")
        if s0 and s1 and off + 8 + s0 + s1 + 48 == total:
            found = (off, s0, s1)
            break
    assert found, "size table not located"
    off, s0, s1 = found
    t1_start = off + 8 + s0
    corrupted = bytearray(pic_nal)
    for i in range(t1_start, t1_start + s1):
        corrupted[i] = 0
    dec = Decoder()
    assert dec.decode_nal(seg_nals[0])
    dec.decode_nal(bytes(corrupted))
    dec.flush()
    pics = []
    while True:
        pic = dec.get_decoded_picture()
        if pic is None:
            break
        pics.append(pic)
    assert len(pics) == 1
    bad = pics[0]
    assert not bad.conforming  # checksum must catch the damage
    # top tile (first CTU row span) decodes identically
    rows = h // 2  # tile 0 = first CTU row = 64 luma rows of 128
    good_y = np.frombuffer(good.bytes, np.uint8)[:w * 64].reshape(64, w)
    bad_y = np.frombuffer(bad.bytes, np.uint8)[:w * 64].reshape(64, w)
    # deblocking at the tile edge mixes the bottom 4 rows; everything
    # above is bit-identical
    assert (good_y[:60] == bad_y[:60]).all()
    assert rows > 0  # geometry sanity


def test_rfe_stream_ignored_without_ext_header():
    """Tile picture NALs without their ext segment header are ignored
    (the reference's rfe-drop behavior)."""
    w, h, f = 64, 128, 1
    yuv = synthetic_yuv420(w, h, f, seed=3)
    nals = _encode(yuv, w, h, f, tile_rows=2)
    dec = Decoder()
    assert not dec.decode_nal(nals[-1])  # picture without segment

    plain = _encode(yuv, w, h, f, tile_rows=0)
    dec2 = Decoder()
    assert dec2.decode_nal(plain[0])
    # an rfe picture NAL in a non-tile segment is dropped
    assert not dec2.decode_nal(nals[-1])


@pytest.mark.slow
def test_reference_decoder_skips_tile_stream(tmp_path):
    """The reference xvcdec must skip (not misparse) a tile stream:
    every NAL is rfe-flagged (ref: decoder.cc:84-113)."""
    import os
    import subprocess
    dec = "/tmp/refbuild/app/xvcdec"
    if not os.path.exists(dec):
        pytest.skip("reference build not present")
    w, h, f = 64, 128, 2
    yuv = synthetic_yuv420(w, h, f, seed=4)
    bs = tmp_path / "tiles.xvc"
    bs.write_bytes(_frame(_encode(yuv, w, h, f, tile_rows=2)))
    out = tmp_path / "out.yuv"
    r = subprocess.run([dec, "-bitstream-file", str(bs),
                        "-output-file", str(out)],
                       capture_output=True, text=True, timeout=60)
    # no crash, and no picture decoded from an all-rfe stream
    assert r.returncode != -11, "reference segfaulted on tile stream"
    assert not out.exists() or out.stat().st_size == 0


def test_tiles_jax_mesh_decode_byte_identical(monkeypatch):
    """One tile picture split across the 8-device mesh: per-tile CABAC
    parse on the host, then ONE batched device reconstruction whose
    block batch is sharded over the mesh with each CTU's jobs collected
    under its tile's prediction cut (tpu/recon.py _for_each_leaf).
    Output must be byte-identical to the scalar tile decode — the
    SURVEY §2.5 config-5 contract."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from xvc_tpu import engine
    from xvc_tpu.parallel.mesh import make_mesh
    w, h, f = 64, 256, 2  # 4 CTU rows over 8 devices, intra + inter
    yuv = synthetic_yuv420(w, h, f, seed=12)
    data = _frame(_encode(yuv, w, h, f, tile_rows=4, num_ref_pics=1,
                          sub_gop=1))
    plain = decode_stream(data)
    assert all(p.conforming for p in plain)
    monkeypatch.setenv("XVC_DSP", "jax")
    engine.set_mesh(make_mesh(jax.devices()[:8]))
    try:
        sharded = decode_stream(data)
    finally:
        engine.set_mesh(None)
    assert all(p.conforming for p in sharded)
    assert [p.bytes for p in sharded] == [p.bytes for p in plain]
