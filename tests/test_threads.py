"""Picture-parallel decode: threaded output must equal unthreaded.

The determinism contract of the reference thread pool
(ref: src/xvc_dec_lib/thread_decoder.cc, test/xvc_test/
restrictions_test.cc SupportParallelDecodeWhenRestrictionChanges):
dependency-aware concurrent picture decodes produce bit-identical
output and conformance results.
"""
import pytest

from xvc_tpu import api

from .util import read_data


@pytest.fixture(autouse=True)
def _no_clamp(monkeypatch):
    # On small hosts the sessions clamp a 1-effective-worker pool to
    # the sequential path; these tests exist to exercise the pipeline
    # itself, so disable the clamp.
    monkeypatch.setenv("XVC_THREADS_NO_CLAMP", "1")


def decode_all(bs, threads):
    dec = api.DecoderSession(api.DecoderParameters(threads=threads))
    off = 0
    while off < len(bs):
        ln = int.from_bytes(bs[off:off + 4], "little")
        off += 4
        dec.decode_nal(bs[off:off + ln])
        off += ln
    dec.flush()
    pics = []
    while True:
        p = dec.get_picture()
        if p is None:
            break
        pics.append(p)
    return pics


STREAMS = ["ra64x48", "ld64x48", "ra128x96", "scal16to24", "rm3_64x48"]


@pytest.mark.parametrize("name", STREAMS)
def test_threaded_equals_unthreaded(name):
    bs = read_data(name + ".xvc")
    a = decode_all(bs, 0)
    b = decode_all(bs, 4)
    assert [p.poc for p in a] == [p.poc for p in b]
    for x, y in zip(a, b):
        assert x.conforming == y.conforming
        assert x.bytes == y.bytes


def test_threaded_restriction_switch():
    bs = read_data("rm1_64x48.xvc") + read_data("rm3_64x48.xvc")
    a = decode_all(bs, 0)
    b = decode_all(bs, 4)
    assert b"".join(p.bytes for p in a) == b"".join(p.bytes for p in b)
    assert all(p.conforming for p in b)


def test_threaded_jax_decode_equals_unthreaded(monkeypatch):
    """Picture-parallel decode with the device reconstruction path
    (XVC_DSP=jax, native parse + batched device stages dispatched from
    worker threads) must match the sequential device decode exactly."""
    monkeypatch.setenv("XVC_DSP", "jax")
    bs = read_data("ra64x48.xvc")
    a = decode_all(bs, 0)
    b = decode_all(bs, 4)
    assert [p.poc for p in a] == [p.poc for p in b]
    for x, y in zip(a, b):
        assert x.conforming == y.conforming
        assert x.bytes == y.bytes


def test_threaded_encode_equals_sequential():
    """ThreadEncoder-equivalent determinism (ref: thread_encoder.cc):
    picture-parallel encoding produces a byte-identical bitstream and
    reconstruction output."""
    raw = read_data("sp48x32_in.yuv")
    fs = 48 * 32 * 3 // 2

    def run(threads):
        p = api.EncoderParameters(width=48, height=32, qp=32,
                                  sub_gop_length=4, checksum_mode=1,
                                  threads=threads)
        enc = api.EncoderSession(p)
        nals = []
        for i in range(6):
            nals += enc.encode(raw[i * fs:(i + 1) * fs])
        nals += enc.flush()
        return (b"".join(len(n).to_bytes(4, "little") + n for n in nals),
                list(enc.rec_pictures))

    seq_bs, seq_rec = run(0)
    thr_bs, thr_rec = run(4)
    assert thr_bs == seq_bs
    assert thr_rec == seq_rec
