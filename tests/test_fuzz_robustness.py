"""Decoder robustness: truncated/corrupted/garbage NALs never crash.

Mirrors the reference API contract (ref: test/xvc_test/
decoder_api_test.cc and decoder.cc:480-495): feeding arbitrary bytes to
the decoder must never abort the session; damage surfaces as a
non-conforming state / corrupted-picture count, and a subsequent clean
stream decodes normally.
"""
import random

import pytest

from xvc_tpu import api

from .util import read_data


def _nals_of(stream):
    out = []
    off = 0
    while off + 4 <= len(stream):
        ln = int.from_bytes(stream[off:off + 4], "little")
        off += 4
        out.append(stream[off:off + ln])
        off += ln
    return out


def _run_damaged(nals, damage_idx, mode, rng):
    dec = api.DecoderSession()
    for i, n in enumerate(nals):
        b = bytearray(n)
        if i == damage_idx:
            if mode == "truncate":
                b = b[:max(1, len(b) // 2)]
            elif mode == "corrupt":
                for _ in range(8):
                    b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
            else:  # garbage
                b = bytearray(rng.randbytes(len(b)))
        dec.decode_nal(bytes(b))
    dec.flush()
    while dec.get_picture() is not None:
        pass
    return dec


@pytest.mark.parametrize("mode", ["truncate", "corrupt", "garbage"])
def test_damaged_nals_never_crash(mode):
    rng = random.Random(hash(mode) & 0xFFFF)
    nals = _nals_of(read_data("ra64x48.xvc"))
    for damage_idx in (0, 1, 2, len(nals) // 2, len(nals) - 1):
        _run_damaged(nals, damage_idx, mode, rng)  # must not raise


@pytest.mark.parametrize("mode", ["truncate", "corrupt", "garbage"])
def test_damaged_nals_never_crash_jax_path(monkeypatch, mode):
    """Same contract through the device decode path (XVC_DSP=jax with
    the native parse + replay): damage must surface as parse errors /
    non-conformance, never a crash."""
    monkeypatch.setenv("XVC_DSP", "jax")
    rng = random.Random(hash(mode) & 0xFFFF)
    nals = _nals_of(read_data("ra64x48.xvc"))
    for damage_idx in (0, 1, 2, len(nals) // 2, len(nals) - 1):
        _run_damaged(nals, damage_idx, mode, rng)  # must not raise


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["truncate", "corrupt", "garbage"])
@pytest.mark.parametrize("stream", ["ra64x48", "ld64x48", "ai64x48"])
def test_damaged_nals_never_crash_full(mode, stream):
    rng = random.Random(hash((mode, stream)) & 0xFFFF)
    nals = _nals_of(read_data(stream + ".xvc"))
    for damage_idx in range(len(nals)):
        _run_damaged(nals, damage_idx, mode, rng)  # must not raise


def test_damaged_picture_flags_nonconformance():
    rng = random.Random(7)
    nals = _nals_of(read_data("ra64x48.xvc"))
    dec = _run_damaged(nals, 2, "corrupt", rng)
    ok, n_corrupt = dec.check_conformance()
    assert not ok and n_corrupt >= 1


def test_truncated_segment_header_rejected():
    nals = _nals_of(read_data("ai64x48.xvc"))
    dec = api.DecoderSession()
    dec.decode_nal(nals[0][:6])  # truncated segment header
    dec.decode_nal(b"")          # empty NAL
    dec.decode_nal(b"\xff" * 3)  # tiny garbage
    # a clean stream on the same session must still decode
    got = 0
    for n in nals:
        dec.decode_nal(n)
    dec.flush()
    while dec.get_picture() is not None:
        got += 1
    assert got == 3


def test_pure_garbage_stream():
    rng = random.Random(3)
    dec = api.DecoderSession()
    for ln in (1, 2, 7, 64, 1024, 65536):
        dec.decode_nal(rng.randbytes(ln))
    dec.flush()
    assert dec.get_picture() is None


def test_recovery_after_garbage_then_clean_stream():
    rng = random.Random(11)
    nals = _nals_of(read_data("ld64x48.xvc"))
    dec = api.DecoderSession()
    for ln in (16, 900, 300):
        dec.decode_nal(rng.randbytes(ln))
    got = 0
    for n in nals:
        dec.decode_nal(n)
    dec.flush()
    while dec.get_picture() is not None:
        got += 1
    assert got >= 1  # random access from the next segment header
