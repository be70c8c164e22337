"""Public API: encode/decode roundtrip and parameter validation."""
import numpy as np
import pytest

from xvc_tpu import api


def _synth_frame(w, h, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 40, size=(h, w)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (base + 100 + 40 * np.sin(xx / 7.0) + 30 * np.cos(yy / 5.0)) \
        .clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return y.tobytes() + u.tobytes() + v.tobytes()


def test_parameter_check():
    p = api.EncoderParameters(width=0, height=16)
    assert api.encoder_parameters_check(p) == api.ERR_SIZE_TOO_SMALL
    p = api.EncoderParameters(width=16, height=16, internal_bitdepth=20)
    assert api.encoder_parameters_check(p) == api.ERR_BITDEPTH_OUT_OF_RANGE
    p = api.EncoderParameters(width=16, height=16)
    assert api.encoder_parameters_check(p) == api.OK
    with pytest.raises(ValueError):
        api.EncoderSession(api.EncoderParameters(width=1, height=1))


def test_encode_decode_roundtrip():
    w = h = 16
    params = api.EncoderParameters(width=w, height=h, qp=37,
                                   num_ref_pics=0, checksum_mode=1)
    enc = api.EncoderSession(params)
    nals = enc.encode(_synth_frame(w, h))
    nals += enc.flush()
    assert len(nals) >= 2  # segment header + picture

    dec = api.DecoderSession()
    for nal in nals:
        dec.decode_nal(nal)
    dec.flush()
    pic = dec.get_picture()
    assert pic is not None
    assert pic.width == w and pic.height == h
    assert len(pic.bytes) == w * h * 3 // 2
    assert dec.num_corrupted_pics == 0  # in-bitstream checksum validated


def test_encode_planes_matches_packed():
    """encoder_encode2 equivalent: plane-array input produces the same
    bitstream as packed bytes (ref: xvcenc.cc:367-404)."""
    w = h = 16
    packed = _synth_frame(w, h)
    params = api.EncoderParameters(width=w, height=h, qp=37,
                                   num_ref_pics=0, checksum_mode=1)
    enc_a = api.EncoderSession(params)
    nals_a = enc_a.encode(packed) + enc_a.flush()

    y = np.frombuffer(packed[:w * h], np.uint8).reshape(h, w)
    u = np.frombuffer(packed[w * h:w * h * 5 // 4],
                      np.uint8).reshape(h // 2, w // 2)
    v = np.frombuffer(packed[w * h * 5 // 4:],
                      np.uint8).reshape(h // 2, w // 2)
    enc_b = api.EncoderSession(params)
    nals_b = enc_b.encode_planes([y, u, v]) + enc_b.flush()
    assert nals_a == nals_b


def test_leading_pictures_early_flush():
    """Flushing a leading-pictures session before a full sub-GOP must
    renumber the buffered pictures to the normal structure and emit a
    valid stream (ref: encoder.cc:158-167 + RewriteLeadingPictures
    :602-628 — the reference BINARY segfaults on this path; we encode
    a decodable stream instead)."""
    import numpy as np
    from xvc_tpu import api
    from xvc_tpu.codec.decoder import decode_stream
    rng = np.random.RandomState(1)
    w, h = 64, 64
    fs = w * h * 3 // 2
    for nframes in (2, 5, 8):
        p = api.EncoderParameters(width=w, height=h, qp=32,
                                  num_ref_pics=2, sub_gop_length=8,
                                  checksum_mode=1, leading_pictures=1)
        enc = api.EncoderSession(p)
        raw = b"".join(rng.randint(0, 256, fs, dtype=np.uint8).tobytes()
                       for _ in range(nframes))
        nals = []
        for i in range(nframes):
            nals += enc.encode(raw[i * fs:(i + 1) * fs])
        nals += enc.flush()
        data = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
        pics = decode_stream(data)
        assert len(pics) == nframes, (nframes, len(pics))
        assert all(q.conforming for q in pics)
        # the rewritten stream must decode on the reference too
        import os
        import subprocess
        import tempfile
        dec = "/tmp/refbuild/app/xvcdec"
        if os.path.exists(dec):
            with tempfile.TemporaryDirectory() as td:
                bs = os.path.join(td, "s.xvc")
                out = os.path.join(td, "o.yuv")
                open(bs, "wb").write(data)
                r = subprocess.run([dec, "-bitstream-file", bs,
                                    "-output-file", out],
                                   capture_output=True, text=True,
                                   timeout=60)
                assert r.returncode == 0, r.stdout + r.stderr
                ours = b"".join(q.bytes for q in pics)
                assert open(out, "rb").read() == ours
