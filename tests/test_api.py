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
