"""Regenerate the pre-committed benchmark bitstreams in
tests/data/bench/ from the deterministic synthetic clips.

The streams are made by the *reference* xvcenc (built -O3 from
/root/reference) so bench.py can decode-compare against reference
xvcdec without reference-encoding 1080p/1440p/4K inline on every run
(VERDICT r3 item 1).  Run from the repo root:

    python tools/gen_bench_streams.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    os.makedirs(bench.WORK, exist_ok=True)
    os.makedirs(bench.DATA, exist_ok=True)
    enc, _ = bench.ensure_reference()
    for tag, (fname, w, h, n, bd) in bench.STREAMS.items():
        out = os.path.join(bench.DATA, fname)
        if os.path.exists(out):
            print("exists:", out)
            continue
        yuv_name, gen, dims = bench.STREAM_INPUTS[tag]
        yuv = os.path.join(bench.WORK, yuv_name)
        gen(yuv, *dims)
        print("encoding", tag, "...")
        t = bench.ref_encode(enc, yuv, out, w, h,
                             bench.STREAM_ENC_ARGS[tag])
        print("  %s: %.1fs, %d bytes" % (fname, t,
                                         os.path.getsize(out)))


if __name__ == "__main__":
    main()
