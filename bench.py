"""End-to-end benchmark: xvc_tpu vs the reference C++ codec, same host,
same streams (BASELINE.md configs 1-5 shaped).

Sections measured (all full-pipeline, wall-clock, same workload on both
sides):
  ref_*    reference divideon/xvc built -O3 Release (/tmp/refbuild)
  host_*   xvc_tpu host path (Python session + native C++ kernels)
  jax_*    xvc_tpu with XVC_DSP=jax (batched device reconstruction on
           the current JAX backend - the real TPU when attached)
  jaxcpu_* the same device code pinned to the CPU backend (tunnel-free)
  kernel_* stand-alone TPU kernel throughput (not comparable to full
           codec numbers; listed separately)

The headline metric is 720p low-delay decode throughput of the primary
(host) path — a single-call native decode (CABAC parse, MV derivation,
reconstruction, deblock in C++); vs_baseline is ours / reference-xvcdec
on the same stream.  Decode timing uses best-of-2 after a warmup pass
on BOTH sides.  All decodes are verified bit-exact against the
reference decoder before being timed.

Driver-survival contract (VERDICT r3 item 1): the cumulative result
JSON line is printed to stdout after EVERY section (the last complete
line wins), and a global wall-clock budget (XVC_BENCH_BUDGET seconds,
default 1200) gates each section by its estimated cost so a driver
timeout still leaves a parseable result.  The five reference bitstreams
are pre-committed under tests/data/bench/ so the bench never has to
reference-encode 1080p/1440p/4K inline.

Note: in this environment the TPU is behind a network tunnel with
~70-100 ms per transfer and ~10 ms per dispatch; jax_* figures are
tunnel-latency bound, not TPU-compute bound (see extra.tunnel_note).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REF_BUILD = "/tmp/refbuild"
WORK = "/tmp/xvc_bench"
REPO = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(REPO, "tests", "data", "bench")
# prepend the repo but keep the environment's PYTHONPATH (it may carry
# the TPU platform plugin)
PYPATH = os.pathsep.join(
    [REPO] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH")
              else []))

BUDGET = float(os.environ.get("XVC_BENCH_BUDGET", "1200"))
T0 = time.monotonic()


def remaining():
    return BUDGET - (time.monotonic() - T0)


def _log(msg):
    print("[bench %4.0fs] %s" % (time.monotonic() - T0, msg),
          file=sys.stderr, flush=True)


def ensure_reference():
    enc = os.path.join(REF_BUILD, "app", "xvcenc")
    dec = os.path.join(REF_BUILD, "app", "xvcdec")
    if os.path.exists(enc) and os.path.exists(dec):
        return enc, dec
    os.makedirs(REF_BUILD, exist_ok=True)
    subprocess.run(["cmake", "-DCMAKE_BUILD_TYPE=Release",
                    "/root/reference"], cwd=REF_BUILD, check=True,
                   capture_output=True)
    subprocess.run(["make", "-j8", "xvc_enc_app", "xvc_dec_app"],
                   cwd=REF_BUILD, check=True, capture_output=True)
    return enc, dec


def gen_yuv(path, w, h, n, seed=1):
    if os.path.exists(path):
        return
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.randint(-12, 13, (h + 64, w + 64)).astype(np.int32)
    frames = []
    for t in range(n):
        base = (96 + 60 * np.sin(2 * np.pi * (xx + 3 * t) / w) *
                np.cos(2 * np.pi * (yy + 2 * t) / h)).astype(np.int32)
        base = base + tex[2 * t:2 * t + h, 3 * t:3 * t + w]
        y = np.clip(base, 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin(2 * np.pi * (xx[::2, ::2] + 5 * t)
                                      / w), 0, 255).astype(np.uint8)
        v = np.clip(128 - 30 * np.cos(2 * np.pi * (yy[::2, ::2] + 4 * t)
                                      / h), 0, 255).astype(np.uint8)
        frames += [y.tobytes(), u.tobytes(), v.tobytes()]
    with open(path, "wb") as f:
        f.write(b"".join(frames))


def gen_yuv10(path, w, h, n, seed=2):
    """10-bit 4:2:0 noise+structure clip (uint16 LE, values < 1024)."""
    if os.path.exists(path):
        return
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.randint(-40, 41, (h + 64, w + 64)).astype(np.int32)
    frames = []
    for t in range(n):
        base = (384 + 240 * np.sin(2 * np.pi * (xx + 3 * t) / w) *
                np.cos(2 * np.pi * (yy + 2 * t) / h)).astype(np.int32)
        base = base + tex[2 * t:2 * t + h, 3 * t:3 * t + w]
        y = np.clip(base, 0, 1023).astype("<u2")
        u = np.clip(512 + 120 * np.sin(2 * np.pi * (xx[::2, ::2] + 5 * t)
                                       / w), 0, 1023).astype("<u2")
        v = np.clip(512 - 120 * np.cos(2 * np.pi * (yy[::2, ::2] + 4 * t)
                                       / h), 0, 1023).astype("<u2")
        frames += [y.tobytes(), u.tobytes(), v.tobytes()]
    with open(path, "wb") as f:
        f.write(b"".join(frames))


def run_timed(cmd, best_of=1, warm=False):
    """Wall time of a subprocess; best_of>1 re-runs and keeps the
    minimum; warm=True adds an untimed warmup run first (page cache,
    branch predictors) for parity with our in-process decode loop."""
    if warm:
        subprocess.run(cmd, check=True, capture_output=True)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        subprocess.run(cmd, check=True, capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return best


def ref_encode(enc, yuv, out, w, h, args, best_of=1):
    return run_timed([enc, "-input-file", yuv, "-output-file", out,
                      "-input-width", str(w), "-input-height", str(h),
                      "-internal-bitdepth", "8"] + args, best_of=best_of)


def our_decode_timed(bitstream_path, expect_path, dsp, profile=False,
                     cpu_backend=False, best_of=2, threads=0, retries=2,
                     timeout_cap=420):
    """Decode in a fresh process (clean jax state), verify bit-exact,
    return (seconds, frames[, profile dict]) — decode loop only, best of
    `best_of` passes after one warmup pass (compiles/caches/tables),
    mirroring the reference side's warm + best-of-2 treatment."""
    code = (
        "import time,sys\n"
        "bs = open(%r,'rb').read()\n"
        "if %r:\n"
        "    import jax\n"
        "    jax.config.update('jax_platforms','cpu')\n"
        "from xvc_tpu import profiling\n"
        "from xvc_tpu.codec.decoder import decode_stream\n"
        "kw = dict(num_threads=%d) if %d else {}\n"
        "decode_stream(bs, **kw)  # warm caches (imports, compiles)\n"
        "profiling.enable(%r)\n"
        "best = float('inf')\n"
        "for _ in range(%d):\n"
        "    t0 = time.perf_counter()\n"
        "    pics = decode_stream(bs, **kw)\n"
        "    best = min(best, time.perf_counter() - t0)\n"
        "t = best\n"
        "out = b''.join(p.bytes for p in pics)\n"
        "assert all(p.conforming for p in pics), 'non-conforming'\n"
        "assert out == open(%r,'rb').read(), 'not bit-exact'\n"
        "import json\n"
        "print('T=%%.4f N=%%d' %% (t, len(pics)))\n"
        "print('P=' + json.dumps({k: v['seconds'] for k, v in "
        "profiling.report().items()}))\n"
        % (bitstream_path, cpu_backend, threads, threads, profile,
           best_of, expect_path))
    env = dict(os.environ, XVC_DSP=dsp, PYTHONPATH=PYPATH)
    last_err = None
    for _ in range(retries):  # retry: the TPU tunnel can drop or stall
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               cwd=REPO, capture_output=True, text=True,
                               timeout=min(timeout_cap,
                                           max(90, remaining())))
        except subprocess.TimeoutExpired:
            last_err = "timeout (stalled device tunnel?)"
            continue
        if r.returncode == 0:
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("T=")][0]
            prof = {}
            for ln in r.stdout.splitlines():
                if ln.startswith("P="):
                    prof = json.loads(ln[2:])
            return (float(line.split()[0][2:]), int(line.split()[1][2:]),
                    prof)
        last_err = r.stderr[-500:]
    raise RuntimeError("decode bench failed (%s): %s" % (dsp, last_err))


def our_encode_timed(yuv, out, w, h, n_frames, speed_mode=2,
                     num_ref_pics=0, sub_gop_length=1, profile=False,
                     threads=0, bitdepth=8, warm=False, explicit=""):
    """Encode in a fresh process; returns seconds of the encode loop
    only (interpreter/import cost excluded).  With profile=True returns
    (seconds, per-stage dict) — the per-TU native timers add ~10-15%
    overhead, so the profiled pass is separate from the timed one.
    warm=True runs one untimed pass first so jit compiles / caches are
    excluded (needed for the split-DP speed mode whose first call
    compiles the device analysis; VERDICT r4 weak item: the DP speedup
    was recorded against a cold compile)."""
    code = (
        "import time, json\n"
        "from xvc_tpu import api, profiling\n"
        "raw = open(%r,'rb').read()\n"
        "p = api.EncoderParameters(width=%d, height=%d, qp=32,\n"
        "    input_bitdepth=%d, internal_bitdepth=%d,\n"
        "    num_ref_pics=%d, sub_gop_length=%d, speed_mode=%d,\n"
        "    threads=%d, explicit_encoder_settings=%r)\n"
        "fs = %d * %d * 3 // 2 * (2 if %d > 8 else 1)\n"
        "def run():\n"
        "    enc = api.EncoderSession(p)\n"
        "    t0 = time.perf_counter()\n"
        "    nals = []\n"
        "    for i in range(%d):\n"
        "        nals += enc.encode(raw[i*fs:(i+1)*fs])\n"
        "    nals += enc.flush()\n"
        "    return time.perf_counter() - t0, nals\n"
        "if %r:\n"
        "    run()  # warm pass: jit compiles, caches, tables\n"
        "profiling.enable(%r)\n"
        "t, nals = run()\n"
        "data = b''.join(len(n).to_bytes(4,'little') + n\n"
        "                for n in nals)\n"
        "open(%r,'wb').write(data)\n"
        "print('T=%%.4f' %% t)\n"
        "print('P=' + json.dumps({k: round(v['seconds'], 4) for k, v in\n"
        "                         profiling.report().items()}))\n"
        % (yuv, w, h, bitdepth, bitdepth, num_ref_pics,
           sub_gop_length, speed_mode, threads, explicit, w, h, bitdepth,
           n_frames, warm, profile, out))
    env = dict(os.environ, PYTHONPATH=PYPATH)
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1800,
                       check=True)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("T=")][0]
    if profile:
        prof = {}
        for ln in r.stdout.splitlines():
            if ln.startswith("P="):
                prof = json.loads(ln[2:])
        return float(line[2:]), prof
    return float(line[2:])


def kernel_throughput():
    """Stand-alone 67-mode intra SATD analysis kernel (TPU MXU path)."""
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
    # Distinct device-resident inputs per call (defeats any relay-side
    # memoization) and a forced scalar read per call: block_until_ready
    # does NOT wait for remote execution through the axon tunnel, so the
    # only honest timing fence is reading a value back.
    roll = jax.jit(lambda a, i: jnp.roll(a, i, axis=0))
    variants = [(roll(orig, i), roll(top, i), roll(left, i))
                for i in range(6)]
    fsum = jax.jit(lambda o, t, l: jnp.sum(fn(o, t, l)))
    int(fsum(*variants[0]))  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        vals = [fsum(*v) for v in variants[1:]]
        for v in vals:
            int(v)
        best = min(best, (time.perf_counter() - t0) / (len(variants) - 1))
    return (w * h * frames) / best / 1e6


def probe_device_tunnel(retries=1, backoff=20):
    """One cheap round-trip through the default jax backend; False if
    it stalls or errors (a dead tunnel would otherwise cost the full
    per-config timeout several times over).  Retries with backoff: a
    dead tunnel is a bench FAILURE for the device sections, not a
    quiet fallback (VERDICT r4 missing item 1)."""
    code = ("import jax, jax.numpy as jnp\n"
            "assert jax.devices()[0].platform != 'cpu', 'cpu fallback'\n"
            "print('PROBE=%d' % int(jnp.arange(8).sum()))\n")
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               env=dict(os.environ, PYTHONPATH=PYPATH),
                               cwd=REPO, capture_output=True, text=True,
                               timeout=120)
            if "PROBE=28" in r.stdout:
                return True
        except Exception:
            pass
        if attempt + 1 < retries and remaining() > backoff + 60:
            _log("device tunnel down; retrying in %ds" % backoff)
            time.sleep(backoff)
    return False


def reprobe_tunnel():
    """Late re-probe: if the tunnel was down at start, try again before
    each device section (it can come back mid-run)."""
    if not EXTRA.get("device_backend_reachable"):
        EXTRA["device_backend_reachable"] = probe_device_tunnel()
    return EXTRA["device_backend_reachable"]


# ---------------------------------------------------------------------
# Section runner: each section has an estimated cost; a section only
# starts if the remaining budget covers it (plus a 30s safety margin),
# and the cumulative result JSON is printed after every section.
# ---------------------------------------------------------------------

RESULT = {"metric": "decode_720p_ld_host_path", "value": 0.0,
          "unit": "Mpix/s", "vs_baseline": 0.0, "extra": {}}
EXTRA = RESULT["extra"]

# Keys copied verbatim into the trailing summary block (the driver
# stores only the LAST 2000 chars of stdout; the cumulative JSON puts
# the headline first, so without this the headline would be truncated
# away — VERDICT r4 weak item 2).
_SUMMARY_KEYS = (
    "device_backend_reachable",
    "decode_720p_ld_vs_ref", "decode_cif_ai_vs_ref",
    "decode_1080p_ra_vs_ref", "decode_1440p_ra10_vs_ref",
    "decode_4k_ra10_vs_ref",
    "host_decode_1080p_ra_t4_mpixs", "ref_decode_1080p_ra_t4_mpixs",
    "encode_64x48_ai_fast_vs_ref", "encode_64x48_ai_slow_vs_ref",
    "encode_cif_ai_fast_vs_ref", "encode_720p_ld_fast_vs_ref",
    "encode_720p_ra_t4_vs_ref", "encode_720p_ra_t1_vs_ref",
    "encode_1080p_ra_s1_vs_ref", "encode_720p_ld_dp_speedup",
    "encode_cif_ai_txrd_speedup", "encode_txrd_bits_delta_pct",
    "jax_decode_720p_ld_mpixs", "jaxcpu_decode_720p_ld_mpixs",
    "mesh8_sharded_encode_decode_byte_identical",
    "skipped_sections", "elapsed_seconds",
)


def emit(final=False):
    # Rebuild the trailing summary on every emit so it is always the
    # LAST keys of the JSON line and survives tail truncation.  The
    # very last line printed (final=True) is a COMPACT record — just
    # the headline + summary, guaranteed to fit the driver's 2000-char
    # stdout tail whole so it parses as one complete JSON line (the
    # round-4 driver record has parsed:null because the cumulative
    # line outgrew the tail).
    EXTRA.pop("zz_summary", None)
    summary = {"value": RESULT["value"],
               "vs_baseline": RESULT["vs_baseline"]}
    for k2 in _SUMMARY_KEYS:
        if k2 in EXTRA:
            summary[k2] = EXTRA[k2]
    mesh = EXTRA.get("mesh_4k_ra10")
    if isinstance(mesh, dict):
        summary["mesh_t1"] = mesh.get("t1")
        summary["mesh_t8"] = mesh.get("t8")
        summary["mesh_ok"] = bool(mesh.get("ok1")) and bool(mesh.get("ok8"))
    for k2, v in EXTRA.items():
        if k2.startswith(("device_compute_mc", "device_compute_itx",
                          "kernel_satd8_", "kernel_mc16_")):
            summary[k2] = (v.get("mpix_s") if isinstance(v, dict) else v)
    enc_ident = [k2 for k2 in EXTRA
                 if k2.startswith("encode_") and k2.endswith("_identical")]
    if enc_ident:
        summary["all_encodes_byte_identical"] = all(
            EXTRA[k2] for k2 in enc_ident)
    EXTRA["zz_summary"] = summary
    print(json.dumps(RESULT), flush=True)
    if final:
        compact = {k2: RESULT[k2] for k2 in
                   ("metric", "value", "unit", "vs_baseline")}
        compact["extra"] = summary
        out = json.dumps(compact)
        if len(out) > 1950:  # must fit the 2000-char tail whole
            for drop in ("skipped_sections", "jaxcpu_decode_720p_ld_mpixs",
                         "device_backend_reachable"):
                summary.pop(drop, None)
                out = json.dumps(compact)
                if len(out) <= 1950:
                    break
        print(out, flush=True)


# Pre-committed reference bitstreams (made by reference xvcenc from the
# deterministic gen_yuv/gen_yuv10 clips; tools/gen_bench_streams.py).
STREAMS = {
    # tag: (file, w, h, frames, bitdepth)
    "cif_ai":     ("cif_ai.xvc", 352, 288, 16, 8),
    "720p_ld":    ("hd720_ld.xvc", 1280, 720, 8, 8),
    "1080p_ra":   ("fhd1080_ra.xvc", 1920, 1080, 8, 8),
    "1440p_ra10": ("qhd1440_ra10.xvc", 2560, 1440, 5, 10),
    "4k_ra10":    ("uhd2160_ra10.xvc", 3840, 2160, 3, 10),
}

# encode args used to (re)generate each stream when the committed copy
# is absent
STREAM_ENC_ARGS = {
    "cif_ai": ["-qp", "32", "-num-ref-pics", "0", "-sub-gop-length", "1",
               "-speed-mode", "2"],
    "720p_ld": ["-qp", "32", "-num-ref-pics", "1", "-sub-gop-length",
                "1", "-speed-mode", "2"],
    "1080p_ra": ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                 "8", "-speed-mode", "2"],
    "1440p_ra10": ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                   "4", "-speed-mode", "2", "-input-bitdepth", "10",
                   "-internal-bitdepth", "10"],
    "4k_ra10": ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                "2", "-speed-mode", "2", "-input-bitdepth", "10",
                "-internal-bitdepth", "10"],
}

STREAM_INPUTS = {
    "cif_ai": ("cif16.yuv", gen_yuv, (352, 288, 16)),
    "720p_ld": ("hd720_8.yuv", gen_yuv, (1280, 720, 8)),
    "1080p_ra": ("fhd1080_8.yuv", gen_yuv, (1920, 1080, 8)),
    "1440p_ra10": ("qhd1440_10.yuv", gen_yuv10, (2560, 1440, 5)),
    "4k_ra10": ("uhd2160_10.yuv", gen_yuv10, (3840, 2160, 3)),
}


def stream_path(ctx, tag):
    """Committed bitstream if present, else reference-encode it once
    into WORK (fallback keeps the bench self-contained)."""
    fname, w, h, n, bd = STREAMS[tag]
    committed = os.path.join(DATA, fname)
    if os.path.exists(committed):
        return committed
    out = os.path.join(WORK, fname)
    if not os.path.exists(out):
        yuv_name, gen, dims = STREAM_INPUTS[tag]
        yuv = os.path.join(WORK, yuv_name)
        gen(yuv, *dims)
        ref_encode(ctx["enc"], yuv, out, w, h, STREAM_ENC_ARGS[tag])
    return out


def decode_config(ctx, tag, profile_host=False):
    """Reference + host decode of one stream; ref xvcdec's output file
    doubles as the bit-exactness expectation for every later path."""
    fname, w, h, n, bd = STREAMS[tag]
    bs = stream_path(ctx, tag)
    dec_yuv = os.path.join(WORK, tag + "_dec.yuv")
    t = run_timed([ctx["dec"], "-bitstream-file", bs, "-output-file",
                   dec_yuv], best_of=2, warm=True)
    ref = w * h * n / t / 1e6
    EXTRA["ref_decode_%s_mpixs" % tag] = round(ref, 3)
    t, nn, prof = our_decode_timed(bs, dec_yuv, "host",
                                   profile=profile_host, best_of=2)
    host = w * h * nn / t / 1e6
    EXTRA["host_decode_%s_mpixs" % tag] = round(host, 3)
    EXTRA["decode_%s_vs_ref" % tag] = round(host / ref, 4)
    if prof:
        EXTRA["profile_%s_host" % tag] = prof
    return ref, host


def sec_decode_720p(ctx):
    ref, host = decode_config(ctx, "720p_ld", profile_host=True)
    RESULT["value"] = round(host, 3)
    RESULT["vs_baseline"] = round(host / ref, 4)


def sec_decode_rest(ctx):
    decode_config(ctx, "cif_ai")
    decode_config(ctx, "1080p_ra", profile_host=True)
    emit()
    decode_config(ctx, "1440p_ra10")
    decode_config(ctx, "4k_ra10")


def sec_decode_threaded(ctx):
    """Threaded decode, 4 workers both sides (picture-level pipeline vs
    reference ThreadDecoder, ref: src/xvc_dec_lib/thread_decoder.cc)."""
    tag = "1080p_ra"
    fname, w, h, n, bd = STREAMS[tag]
    bs = stream_path(ctx, tag)
    dec_yuv = os.path.join(WORK, tag + "_dec.yuv")
    t = run_timed([ctx["dec"], "-bitstream-file", bs, "-output-file",
                   dec_yuv, "-threads", "4"], best_of=2, warm=True)
    EXTRA["ref_decode_1080p_ra_t4_mpixs"] = round(w * h * n / t / 1e6, 3)
    t, nn, _ = our_decode_timed(bs, dec_yuv, "host", best_of=2, threads=4)
    EXTRA["host_decode_1080p_ra_t4_mpixs"] = round(w * h * nn / t / 1e6, 3)


def sec_device_kernels(ctx):
    """Real-TPU kernel numbers (falls back to CPU backend with _cpu
    suffix when the tunnel is down)."""
    tunnel_ok = reprobe_tunnel()
    kern_suffix = "" if tunnel_ok else "_cpu"
    kern_code = (
        "import json\n"
        + ("" if tunnel_ok else
           "import jax\njax.config.update('jax_platforms','cpu')\n")
        + "import bench\n"
        "out = {}\n"
        "try:\n"
        "    out['kernel_intra67_satd%s_mpixs'] = "
        "round(bench.kernel_throughput(), 1)\n"
        "except Exception as e:\n"
        "    out['kernel_error'] = repr(e)[:120]\n"
        "try:\n"
        "    from xvc_tpu.tpu.pallas_satd import bench_device\n"
        "    r = bench_device(batch=16384, iters=50)\n"
        "    out['kernel_satd8_pallas%s_mpixs'] = round(r['pallas'], 1)\n"
        "    out['kernel_satd8_xla%s_mpixs'] = round(r['xla'], 1)\n"
        "except Exception as e:\n"
        "    out['kernel_pallas_error'] = repr(e)[:120]\n"
        "try:\n"
        "    from xvc_tpu.tpu.pallas_mc import bench_device as mcb\n"
        "    r = mcb(batch=4096, iters=64, block=16, group=16)\n"
        "    out['kernel_mc16_pallas%s_mpixs'] = r['pallas_mpixs']\n"
        "    out['kernel_mc16_xla%s_mpixs'] = r['xla_mpixs']\n"
        "    out['kernel_mc16_pallas_bit_exact'] = r['bit_exact']\n"
        "except Exception as e:\n"
        "    out['kernel_mc_pallas_error'] = repr(e)[:120]\n"
        "try:\n"
        "    from xvc_tpu.tpu import device_bench as db\n"
        "    out['device_compute_mc%s'] = db.mc_device_bench()\n"
        "    out['device_compute_itx%s'] = db.itx_device_bench()\n"
        "except Exception as e:\n"
        "    out['device_compute_error'] = repr(e)[:120]\n"
        "print('KERN=' + json.dumps(out))\n"
        % (kern_suffix, kern_suffix, kern_suffix, kern_suffix,
           kern_suffix, kern_suffix, kern_suffix))
    r = subprocess.run([sys.executable, "-c", kern_code],
                       env=dict(os.environ, PYTHONPATH=PYPATH),
                       cwd=REPO, capture_output=True, text=True,
                       timeout=min(480, max(120, remaining())))
    got = False
    for ln in r.stdout.splitlines():
        if ln.startswith("KERN="):
            EXTRA.update(json.loads(ln[5:]))
            got = True
    if not got:
        EXTRA["kernel_error"] = (r.stderr or r.stdout)[-160:]


def jaxcpu_decode(ctx, tag):
    fname, w, h, n, bd = STREAMS[tag]
    bs = stream_path(ctx, tag)
    dec_yuv = os.path.join(WORK, tag + "_dec.yuv")
    if not os.path.exists(dec_yuv):
        subprocess.run([ctx["dec"], "-bitstream-file", bs,
                        "-output-file", dec_yuv], check=True,
                       capture_output=True)
    t, nn, _ = our_decode_timed(bs, dec_yuv, "jax", cpu_backend=True,
                                best_of=1)
    EXTRA["jaxcpu_decode_%s_mpixs" % tag] = round(w * h * nn / t / 1e6, 3)


def sec_jaxcpu_720p(ctx):
    jaxcpu_decode(ctx, "720p_ld")


def sec_jaxtpu_720p(ctx):
    """Full jax-path decode on the REAL TPU backend when the tunnel is
    up.  Through this environment's tunnel the number is latency-bound
    (see extra.tunnel_note) but it is a measured on-chip end-to-end
    figure — the round must contain at least one (VERDICT r4 item 1)."""
    if not reprobe_tunnel():
        EXTRA["jax_decode_720p_error"] = "device tunnel unreachable"
        return
    tag = "720p_ld"
    fname, w, h, n, bd = STREAMS[tag]
    bs = stream_path(ctx, tag)
    dec_yuv = os.path.join(WORK, tag + "_dec.yuv")
    if not os.path.exists(dec_yuv):
        subprocess.run([ctx["dec"], "-bitstream-file", bs,
                        "-output-file", dec_yuv], check=True,
                       capture_output=True)
    # Hard 170s cap: a stalled tunnel must not starve the sections
    # behind this one (round-5 local run: 420s spent, no number).
    t, nn, _ = our_decode_timed(bs, dec_yuv, "jax", cpu_backend=False,
                                best_of=1, retries=1, timeout_cap=170)
    EXTRA["jax_decode_%s_mpixs" % tag] = round(w * h * nn / t / 1e6, 3)


def sec_jaxcpu_rest(ctx):
    jaxcpu_decode(ctx, "cif_ai")
    jaxcpu_decode(ctx, "1080p_ra")
    emit()
    jaxcpu_decode(ctx, "1440p_ra10")
    jaxcpu_decode(ctx, "4k_ra10")


def encode_pair(ctx, name, yuv, w, h, n, ref_args, our_kw, ref_best_of=1,
                bitdepth=8):
    """Reference + our encode of the same clip/config; records Mpix/s
    both sides + byte-identity of the bitstreams."""
    ref_bs = os.path.join(WORK, "enc_ref_%s.xvc" % name)
    t = ref_encode(ctx["enc"], yuv, ref_bs, w, h, ref_args,
                   best_of=ref_best_of)
    EXTRA["ref_encode_%s_mpixs" % name] = round(w * h * n / t / 1e6, 4)
    our_bs = os.path.join(WORK, "enc_our_%s.xvc" % name)
    t = our_encode_timed(yuv, our_bs, w, h, n, bitdepth=bitdepth,
                         **our_kw)
    EXTRA["host_encode_%s_mpixs" % name] = round(w * h * n / t / 1e6, 4)
    EXTRA["encode_%s_byte_identical" % name] = (
        open(ref_bs, "rb").read() == open(our_bs, "rb").read())
    EXTRA["encode_%s_vs_ref" % name] = round(
        EXTRA["host_encode_%s_mpixs" % name]
        / EXTRA["ref_encode_%s_mpixs" % name], 4)


def _clip(ctx, name, src, w, h, n, bd=8):
    """First n frames of a generated clip, as its own file."""
    path = os.path.join(WORK, name)
    if not os.path.exists(path):
        fs = w * h * 3 // 2 * (2 if bd > 8 else 1)
        with open(src, "rb") as f:
            data = f.read(fs * n)
        with open(path, "wb") as f:
            f.write(data)
    return path


def sec_encode_small(ctx):
    small6 = os.path.join(WORK, "small6.yuv")
    gen_yuv(small6, 64, 48, 6)
    for sm, name in ((2, "fast"), (1, "slow")):
        encode_pair(ctx, "64x48_ai_%s" % name, small6, 64, 48, 6,
                    ["-qp", "32", "-num-ref-pics", "0",
                     "-sub-gop-length", "1", "-speed-mode", str(sm)],
                    dict(speed_mode=sm), ref_best_of=2)
    cif = os.path.join(WORK, "cif16.yuv")
    gen_yuv(cif, 352, 288, 16)
    cif4 = _clip(ctx, "cif4.yuv", cif, 352, 288, 4)
    encode_pair(ctx, "cif_ai_fast", cif4, 352, 288, 4,
                ["-qp", "32", "-num-ref-pics", "0", "-sub-gop-length",
                 "1", "-speed-mode", "2"], dict(speed_mode=2))


def sec_encode_720p(ctx):
    hd = os.path.join(WORK, "hd720_8.yuv")
    gen_yuv(hd, 1280, 720, 8)
    hd4 = _clip(ctx, "hd4.yuv", hd, 1280, 720, 4)
    # flagship INTER encode config (TZ/subpel ME + merge RDO in the
    # native encoder); 4 frames = 1 intra + 3 P
    encode_pair(ctx, "720p_ld_fast", hd4, 1280, 720, 4,
                ["-qp", "32", "-num-ref-pics", "1", "-sub-gop-length",
                 "1", "-speed-mode", "2"],
                dict(speed_mode=2, num_ref_pics=1, sub_gop_length=1))


def gen_yuv_mixed(path, w, h, n):
    """Mixed-region clip (flat band / smooth gradient / moving stripes
    / noise band): representative of real content with skippable flat
    regions, which the bench's all-noise gen_yuv clip has none of."""
    if os.path.exists(path):
        return
    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:h, 0:w]
    q = h // 4
    frames = []
    for t in range(n):
        y = np.zeros((h, w), np.int32)
        y[:q] = 200
        y[q:2 * q] = (60 + (xx[:q] + 2 * t) * 0.1).astype(np.int32)
        y[2 * q:3 * q] = 128 + 80 * (((xx[:q] + 4 * t) >> 3) & 1)
        y[3 * q:] = 128 + rng.randint(-25, 26, (h - 3 * q, w))
        frames += [np.clip(y, 0, 255).astype(np.uint8).tobytes(),
                   np.full((h // 2, w // 2), 120, np.uint8).tobytes(),
                   np.full((h // 2, w // 2), 130, np.uint8).tobytes()]
    with open(path, "wb") as f:
        f.write(b"".join(frames))


def sec_encode_dp(ctx):
    """Device split-DP speed mode (speed 3 = fast + tpu_split_dp, the
    bottom-up batched RDO of SURVEY §7 stage 4) vs speed 2 on mixed
    720p content; records speedup, bitrate delta and PSNR delta.  The
    all-noise clips never trigger decisive forcing by construction, so
    this section uses the mixed-region clip."""
    mix = os.path.join(WORK, "hd720_mixed.yuv")
    gen_yuv_mixed(mix, 1280, 720, 3)
    res = {}
    for sm in (2, 3):
        bs = os.path.join(WORK, "enc_dp_s%d.xvc" % sm)
        # warm=True: the timed pass excludes the one-time jit compile of
        # the DP analysis (both modes warm-timed so the ratio is fair)
        t = our_encode_timed(mix, bs, 1280, 720, 3, speed_mode=sm,
                             num_ref_pics=1, sub_gop_length=1, warm=True)
        res[sm] = (t, os.path.getsize(bs), bs)
    EXTRA["host_encode_720p_dp_s2_mpixs"] = round(
        1280 * 720 * 3 / res[2][0] / 1e6, 4)
    EXTRA["host_encode_720p_dp_s3_mpixs"] = round(
        1280 * 720 * 3 / res[3][0] / 1e6, 4)
    EXTRA["encode_720p_ld_dp_speedup"] = round(res[2][0] / res[3][0], 3)
    EXTRA["encode_720p_dp_bits_delta_pct"] = round(
        100.0 * (res[3][1] / res[2][1] - 1.0), 2)
    # PSNR delta via our decoder
    code = (
        "import numpy as np\n"
        "from xvc_tpu.codec.decoder import decode_stream\n"
        "src = np.frombuffer(open(%r,'rb').read(), np.uint8)"
        ".astype(np.int64)\n"
        "out = []\n"
        "for p in (%r, %r):\n"
        "    pics = decode_stream(open(p,'rb').read())\n"
        "    rec = np.concatenate([np.frombuffer(q.bytes, np.uint8)"
        " for q in pics]).astype(np.int64)\n"
        "    mse = ((src - rec) ** 2).mean()\n"
        "    out.append(10 * np.log10(255.0 ** 2 / mse))\n"
        "print('PSNR=%%.4f %%.4f' %% (out[0], out[1]))\n"
        % (mix, res[2][2], res[3][2]))
    r = subprocess.run([sys.executable, "-c", code],
                       env=dict(os.environ, PYTHONPATH=PYPATH), cwd=REPO,
                       capture_output=True, text=True,
                       timeout=min(300, max(60, remaining())))
    for ln in r.stdout.splitlines():
        if ln.startswith("PSNR="):
            p2, p3 = map(float, ln[5:].split())
            EXTRA["encode_720p_dp_psnr_delta_db"] = round(p3 - p2, 3)


def sec_encode_txrd(ctx):
    """Device transform-RD intra prepass (tpu/txrd_prepass.py, VERDICT
    r4 item 8): batched predict+DCT+quant+rate ranking cuts the native
    RD search's mode list.  Measured on all-intra mixed content where
    intra search dominates; records E2E speedup (prepass cost included,
    on whatever backend jax resolves), the native-side search reduction,
    and bitrate/PSNR deltas."""
    mix = os.path.join(WORK, "cif_mixed.yuv")
    gen_yuv_mixed(mix, 352, 288, 4)
    res = {}
    for tag, exp in (("off", ""), ("on", "tpu_txrd_prepass 1")):
        bs = os.path.join(WORK, "enc_txrd_%s.xvc" % tag)
        t, prof = our_encode_timed(mix, bs, 352, 288, 4, speed_mode=2,
                                   num_ref_pics=0, sub_gop_length=1,
                                   warm=True, profile=True, explicit=exp)
        res[tag] = (t, os.path.getsize(bs), bs, prof)
    EXTRA["encode_cif_ai_txrd_speedup"] = round(
        res["off"][0] / res["on"][0], 3)
    EXTRA["encode_txrd_prepass_s"] = res["on"][3].get(
        "encode.txrd_prepass", 0.0)
    off_is = res["off"][3].get("encode.native.intra_search", 0.0)
    on_is = res["on"][3].get("encode.native.intra_search", 0.0)
    if off_is:
        EXTRA["encode_txrd_intra_search_cut_pct"] = round(
            100.0 * (1.0 - on_is / off_is), 1)
    EXTRA["encode_txrd_bits_delta_pct"] = round(
        100.0 * (res["on"][1] / res["off"][1] - 1.0), 2)
    code = (
        "import numpy as np\n"
        "from xvc_tpu.codec.decoder import decode_stream\n"
        "src = np.frombuffer(open(%r,'rb').read(), np.uint8)"
        ".astype(np.int64)\n"
        "out = []\n"
        "for p in (%r, %r):\n"
        "    pics = decode_stream(open(p,'rb').read())\n"
        "    rec = np.concatenate([np.frombuffer(q.bytes, np.uint8)"
        " for q in pics]).astype(np.int64)\n"
        "    mse = ((src - rec) ** 2).mean()\n"
        "    out.append(10 * np.log10(255.0 ** 2 / mse))\n"
        "print('PSNR=%%.4f %%.4f' %% (out[0], out[1]))\n"
        % (mix, res["off"][2], res["on"][2]))
    r = subprocess.run([sys.executable, "-c", code],
                       env=dict(os.environ, PYTHONPATH=PYPATH), cwd=REPO,
                       capture_output=True, text=True,
                       timeout=min(300, max(60, remaining())))
    for ln in r.stdout.splitlines():
        if ln.startswith("PSNR="):
            p_off, p_on = map(float, ln[5:].split())
            EXTRA["encode_txrd_psnr_delta_db"] = round(p_on - p_off, 3)


def sec_encode_720p_threads(ctx):
    """Threaded encode, 4 workers both sides (picture-level pipeline vs
    reference ThreadEncoder, ref: src/xvc_enc_lib/thread_encoder.cc:
    99-158); sub-GOP 4 so pictures can overlap."""
    hd = os.path.join(WORK, "hd720_8.yuv")
    gen_yuv(hd, 1280, 720, 8)
    encode_pair(ctx, "720p_ra_t4", hd, 1280, 720, 8,
                ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                 "4", "-speed-mode", "2", "-threads", "4"],
                dict(speed_mode=2, num_ref_pics=2, sub_gop_length=4,
                     threads=4))
    # same config single-thread for the scaling ratio
    encode_pair(ctx, "720p_ra_t1", hd, 1280, 720, 8,
                ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                 "4", "-speed-mode", "2"],
                dict(speed_mode=2, num_ref_pics=2, sub_gop_length=4))


def sec_encode_720p_ra(ctx):
    hd = os.path.join(WORK, "hd720_8.yuv")
    gen_yuv(hd, 1280, 720, 8)
    # hierarchical sub-GOP 8, bi-pred/affine-heavy mode mix, speed 1
    encode_pair(ctx, "720p_ra", hd, 1280, 720, 8,
                ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                 "8", "-speed-mode", "1", "-max-pictures", "8"],
                dict(speed_mode=1, num_ref_pics=2, sub_gop_length=8))


def sec_encode_1080p_ra(ctx):
    """1080p RA speed 1 (VERDICT r3 item 5: encode where it hurts)."""
    fhd = os.path.join(WORK, "fhd1080_8.yuv")
    gen_yuv(fhd, 1920, 1080, 8)
    fhd4 = _clip(ctx, "fhd4.yuv", fhd, 1920, 1080, 4)
    encode_pair(ctx, "1080p_ra_s1", fhd4, 1920, 1080, 4,
                ["-qp", "32", "-num-ref-pics", "2", "-sub-gop-length",
                 "4", "-speed-mode", "1"],
                dict(speed_mode=1, num_ref_pics=2, sub_gop_length=4))


def sec_encode_placebo(ctx):
    """Placebo (speed 0) on 2 CIF frames (VERDICT r3 item 5)."""
    cif = os.path.join(WORK, "cif16.yuv")
    gen_yuv(cif, 352, 288, 16)
    cif2 = _clip(ctx, "cif2.yuv", cif, 352, 288, 2)
    encode_pair(ctx, "cif_ai_placebo", cif2, 352, 288, 2,
                ["-qp", "32", "-num-ref-pics", "0", "-sub-gop-length",
                 "1", "-speed-mode", "0"], dict(speed_mode=0))


def sec_encode_profile(ctx):
    """Per-stage profile of the 720p LD encode.  Spans OVERLAP: me /
    intra_search include the nested transform-RD share, and write
    excludes the final CABAC flush — sub-stages neither sum to nor
    partition encode.native (keys are suffixed _incl_nested to say so).
    """
    hd4 = os.path.join(WORK, "hd4.yuv")
    our_bs = os.path.join(WORK, "enc_prof_720p.xvc")
    _, prof = our_encode_timed(hd4, our_bs, 1280, 720, 4, speed_mode=2,
                               num_ref_pics=1, sub_gop_length=1,
                               profile=True)
    EXTRA["profile_encode_720p_ld_incl_nested"] = {
        k2: v for k2, v in sorted(prof.items(), key=lambda kv: -kv[1])
        if k2.startswith("encode.")}


def sec_mesh_4k(ctx):
    """8-virtual-device mesh decode of the 4K stream vs 1 device (same
    code, CPU backend): sharded == unsharded byte equality + wall-clock
    (one host cannot demonstrate pod-slice ICI scaling)."""
    bs = stream_path(ctx, "4k_ra10")
    dec_yuv = os.path.join(WORK, "4k_ra10_dec.yuv")
    if not os.path.exists(dec_yuv):
        subprocess.run([ctx["dec"], "-bitstream-file", bs,
                        "-output-file", dec_yuv], check=True,
                       capture_output=True)
    mesh_code = (
        "import os, time, json\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "from jax.sharding import Mesh\n"
        "from xvc_tpu import engine\n"
        "from xvc_tpu.codec.decoder import decode_stream\n"
        "from xvc_tpu.tpu import dsp\n"
        "bs = open(%r,'rb').read()\n"
        "want = open(%r,'rb').read()\n"
        "os.environ['XVC_DSP'] = 'jax'\n"
        "res = {}\n"
        "for n in (1, 8):\n"
        "    engine.set_mesh(Mesh(np.array(jax.devices()[:n]), ('blk',)))\n"
        "    try:\n"
        "        decode_stream(bs)  # warm compile for this mesh\n"
        "        best = None\n"
        "        for _ in range(2):  # best-of-2, like the reference side\n"
        "            dsp.stats_reset()\n"
        "            t0 = time.perf_counter()\n"
        "            pics = decode_stream(bs)\n"
        "            dt = round(time.perf_counter() - t0, 3)\n"
        "            if best is None or dt < best:\n"
        "                best = dt\n"
        "                res['xfer%%d' %% n] = dsp.stats_snapshot()\n"
        "        res['t%%d' %% n] = best\n"
        "        out = b''.join(p.bytes for p in pics)\n"
        "        res['ok%%d' %% n] = (out == want and\n"
        "                           all(p.conforming for p in pics))\n"
        "    finally:\n"
        "        engine.set_mesh(None)\n"
        "print('MESHRES=' + json.dumps(res))\n"
        % (bs, dec_yuv))
    env_mesh = dict(os.environ, PYTHONPATH=PYPATH,
                    XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", mesh_code], env=env_mesh,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=min(900, max(180, remaining())))
    for ln in r.stdout.splitlines():
        if ln.startswith("MESHRES="):
            EXTRA["mesh_4k_ra10"] = json.loads(ln[8:])
    if "mesh_4k_ra10" not in EXTRA:
        EXTRA["mesh_4k_ra10_error"] = (r.stderr or r.stdout)[-200:]


def sec_mesh_dryrun(ctx):
    """8 virtual CPU devices; sharded==unsharded byte equality contract
    asserted by __graft_entry__.dryrun_multichip."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('MESH_OK')\n")
    env = dict(os.environ, PYTHONPATH=PYPATH,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True,
                       timeout=min(900, max(180, remaining())))
    EXTRA["mesh8_sharded_encode_decode_byte_identical"] = \
        "MESH_OK" in r.stdout


def main():
    os.makedirs(WORK, exist_ok=True)
    _log("building reference (-O3 Release)")
    enc, dec = ensure_reference()
    ctx = {"enc": enc, "dec": dec}
    _log("probing device backend")
    EXTRA["device_backend_reachable"] = probe_device_tunnel(
        retries=3, backoff=30)
    EXTRA["budget_seconds"] = BUDGET
    EXTRA["tunnel_note"] = (
        "jax_* numbers include ~70-100ms/transfer tunnel latency "
        "(jaxcpu_* re-runs the same device path on the CPU backend, "
        "tunnel-free); bit-exactness verified vs reference xvcdec on "
        "every timed stream")
    emit()

    # (name, est seconds, fn); ordered by evidentiary value — a driver
    # timeout truncates the tail, never the head.
    # Estimates are the round-5 local measured actuals + margin; order
    # is by evidentiary value (VERDICT r4: mesh_4k and the on-chip
    # sections must never be budget-starved behind tail sections).
    sections = [
        ("decode_720p", 15, sec_decode_720p),
        ("decode_rest", 40, sec_decode_rest),
        ("decode_threaded", 15, sec_decode_threaded),
        ("encode_small", 35, sec_encode_small),
        ("encode_720p", 50, sec_encode_720p),
        ("device_kernels", 240, sec_device_kernels),
        ("mesh_4k", 210, sec_mesh_4k),
        ("jaxtpu_720p", 180, sec_jaxtpu_720p),
        ("encode_dp", 240, sec_encode_dp),
        ("encode_txrd", 120, sec_encode_txrd),
        ("encode_720p_threads", 150, sec_encode_720p_threads),
        ("jaxcpu_720p", 75, sec_jaxcpu_720p),
        ("encode_placebo", 45, sec_encode_placebo),
        ("encode_profile", 30, sec_encode_profile),
        ("encode_1080p_ra", 260, sec_encode_1080p_ra),
        ("encode_720p_ra", 220, sec_encode_720p_ra),
        ("jaxcpu_rest", 200, sec_jaxcpu_rest),
        ("mesh_dryrun", 240, sec_mesh_dryrun),
    ]
    skipped = []
    for name, est, fn in sections:
        if remaining() < est + 30:
            skipped.append(name + " (budget)")
            continue
        _log("section %s (est %ds, %.0fs left)" % (name, est,
                                                   remaining()))
        try:
            fn(ctx)
        except Exception as e:
            EXTRA[name + "_error"] = repr(e)[:200]
        EXTRA["skipped_sections"] = skipped
        EXTRA["elapsed_seconds"] = round(time.monotonic() - T0, 1)
        emit()
    EXTRA["skipped_sections"] = skipped
    EXTRA["elapsed_seconds"] = round(time.monotonic() - T0, 1)
    emit(final=True)


if __name__ == "__main__":
    main()
