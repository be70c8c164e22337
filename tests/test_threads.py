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
