"""Device-compute-only kernel benchmarks + MFU accounting.

The axon tunnel in this environment adds ~70-100 ms per transfer and
does not honor block_until_ready as a fence, so wall-clock full-decode
numbers through the tunnel measure the tunnel, not the TPU.  These
benchmarks amortize: each measurement runs K kernel iterations inside
ONE jitted lax.fori_loop (device-side chain, no host round trips), and
the only fence is reading back a scalar.  device-seconds/iter =
(T_total - T_roundtrip) / K with T_roundtrip measured by the same
readback on a trivial program.

MFU accounting: the MC kernel's MACs are the separable 8-tap filter
taps (ref: inter_prediction.cc:1138-1378 semantics); the inverse
transform's are the two matrix passes (ref: transform.cc).  Both run
in int32 on the VPU/MXU; the reported mfu_vs_bf16_peak compares against
the chip's published bf16 matmul peak (197 TFLOP/s for v5e) — an
upper-bound denominator, since int32 multiply-add has no MXU fast path.
"""
import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12
V5E_INT8_PEAK_OPS = 394e12


def _roundtrip_seconds(reps=5):
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: jnp.sum(x) + 1)
    x = jnp.arange(128, dtype=jnp.int32)
    int(f(x))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def mc_device_bench(batch=4096, iters=64, bitdepth=8, block=16):
    """Batched luma sub-pel MC: device-seconds per call, Mpix/s,
    GMAC/s, MFU."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from . import dsp

    S, Hp, Wp = 6, 512, 768
    rng = np.random.RandomState(0)
    planes = jnp.asarray(
        rng.randint(0, 1 << bitdepth, (S, Hp, Wp)).astype(np.int16))
    core = dsp._mc_core_builder(block, block, True, bitdepth, True, False)
    ridx = jnp.asarray(rng.randint(0, S, batch))
    y0 = jnp.asarray(rng.randint(0, Hp - block - 8, batch))
    x0 = jnp.asarray(rng.randint(0, Wp - block - 8, batch))
    fx = jnp.asarray(rng.randint(1, 16, batch))  # worst case: 2-D filter
    fy = jnp.asarray(rng.randint(1, 16, batch))

    def chain(i, acc):
        out = core(planes, ridx, y0 + (i & 1), x0, fx, fy)
        return acc + jnp.sum(out.astype(jnp.int32))

    run = jax.jit(lambda n: lax.fori_loop(0, n, chain, jnp.int32(0)))
    int(run(2))  # warm/compile
    rt = _roundtrip_seconds()
    t0 = time.perf_counter()
    int(run(iters))
    total = time.perf_counter() - t0
    per_call = max(total - rt, 1e-9) / iters
    pix = batch * block * block
    # separable 8-tap, all four frac cases computed then selected:
    # h pass over (b+7)x b rows + v pass + the hv temp pass (ref core)
    taps = 8
    macs_per_pix = taps * ((block + taps - 1) / block + 2.0)
    macs = pix * macs_per_pix
    return {
        "device_us_per_call": round(per_call * 1e6, 1),
        "mpix_s": round(pix / per_call / 1e6, 1),
        "gmac_s": round(macs / per_call / 1e9, 1),
        # Upper-bound denominators: the kernels run exact int32 (no MXU
        # fast path), so these are honest "fractions of the chip's
        # published matmul peaks", not achievable targets.
        "mfu_vs_bf16_peak": round(2 * macs / per_call /
                                  V5E_BF16_PEAK_FLOPS, 5),
        "mfu_vs_int8_peak": round(2 * macs / per_call /
                                  V5E_INT8_PEAK_OPS, 5),
        "roundtrip_s": round(rt, 3),
    }


def itx_device_bench(batch=4096, iters=64, bitdepth=8, block=16):
    """Batched fused dequant + 2-D inverse DCT-2: device-seconds per
    call, Mpix/s, GMAC/s, MFU."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from . import dsp

    rng = np.random.RandomState(1)
    coeff = jnp.asarray(
        rng.randint(-256, 256, (batch, block, block)).astype(np.int16))
    scale = jnp.asarray(np.full((batch,), 64, np.int32))
    from .. import constants as k

    def one(c, s):
        return dsp._itx_core(c, s, block, block, bitdepth,
                             int(k.TransformType.DCT2),
                             int(k.TransformType.DCT2), "gen", True)

    def chain(i, acc):
        out = one(coeff + (i & 1).astype(jnp.int16), scale)
        return acc + jnp.sum(out.astype(jnp.int32))

    run = jax.jit(lambda n: lax.fori_loop(0, n, chain, jnp.int32(0)))
    int(run(2))
    rt = _roundtrip_seconds()
    t0 = time.perf_counter()
    int(run(iters))
    total = time.perf_counter() - t0
    per_call = max(total - rt, 1e-9) / iters
    pix = batch * block * block
    macs = 2 * batch * block * block * block  # two NxN matrix passes
    return {
        "device_us_per_call": round(per_call * 1e6, 1),
        "mpix_s": round(pix / per_call / 1e6, 1),
        "gmac_s": round(macs / per_call / 1e9, 1),
        # Upper-bound denominators: the kernels run exact int32 (no MXU
        # fast path), so these are honest "fractions of the chip's
        # published matmul peaks", not achievable targets.
        "mfu_vs_bf16_peak": round(2 * macs / per_call /
                                  V5E_BF16_PEAK_FLOPS, 5),
        "mfu_vs_int8_peak": round(2 * macs / per_call /
                                  V5E_INT8_PEAK_OPS, 5),
        "roundtrip_s": round(rt, 3),
    }


if __name__ == "__main__":
    import json
    print(json.dumps({"mc": mc_device_bench(), "itx": itx_device_bench()}))
