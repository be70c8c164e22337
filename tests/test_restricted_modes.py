"""Restricted-mode (baseline profile) presets A-D.

Golden streams produced by reference xvcenc -restricted-mode 1..4
(tools/make_golden.py).  Decoding must be bit-exact and encoding must
reproduce the reference bitstream byte-for-byte
(ref: src/xvc_common_lib/restrictions.cc:340-470,
 src/xvc_enc_lib/encoder_settings.cc:75-121,
 test/xvc_test/restrictions_test.cc).
"""
import pytest

from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream
from xvc_tpu.restrictions import (RestrictedMode, Restrictions,
                                  check_baseline_compatibility,
                                  enable_restricted_mode)

from .util import read_data


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_restricted_mode_decode_bit_exact(mode):
    name = f"rm{mode}_64x48"
    pics = decode_stream(read_data(name + ".xvc"))
    assert all(p.conforming for p in pics)
    assert b"".join(p.bytes for p in pics) == read_data(name + "_dec.yuv")


def _encode_restricted(mode):
    raw = read_data("ai64x48_in.yuv")
    fs = 64 * 48 * 3 // 2
    p = api.EncoderParameters(width=64, height=48, qp=32, checksum_mode=1,
                              restricted_mode=mode, sub_gop_length=4,
                              num_ref_pics=2)
    enc = api.EncoderSession(p)
    nals = []
    for i in range(3):
        nals += enc.encode(raw[i * fs:(i + 1) * fs])
    nals += enc.flush()
    out = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    assert out == read_data(f"rm{mode}_64x48.xvc")


def test_restricted_mode_a_encode_byte_exact():
    _encode_restricted(1)


def test_restricted_mode_c_encode_byte_exact():
    _encode_restricted(3)


@pytest.mark.slow
def test_restricted_mode_b_encode_byte_exact():
    _encode_restricted(2)


@pytest.mark.slow
def test_restricted_mode_d_encode_byte_exact():
    _encode_restricted(4)


def test_restriction_switch_at_segment_boundary():
    """Restrictions are reloaded from each segment header; concatenated
    segments with different restricted modes must decode bit-exactly
    (ref: test/xvc_test/restrictions_test.cc:36-105)."""
    bs = read_data("rm1_64x48.xvc") + read_data("rm3_64x48.xvc")
    pics = decode_stream(bs)
    assert all(p.conforming for p in pics)
    want = read_data("rm1_64x48_dec.yuv") + read_data("rm3_64x48_dec.yuv")
    assert b"".join(p.bytes for p in pics) == want


def test_mode_c_is_baseline_compatible():
    r = Restrictions()
    enable_restricted_mode(r, RestrictedMode.MODE_C)
    assert check_baseline_compatibility(r)
    assert not check_baseline_compatibility(Restrictions())
