"""Native host runtime: build + ctypes bindings for xvcn.cpp.

The C++ library implements the sequential entropy-coding tail (CABAC
engines, residual coefficient read/write, RDO quantization) as an exact
mirror of the Python reference implementation.  It is compiled lazily
with g++ on first import and cached next to the source; if compilation
fails the framework transparently falls back to the Python path.

Set XVC_NATIVE=0 to force the Python path (used by the native-vs-python
bit-exactness tests, the analog of the reference's SIMD determinism
contract in test/xvc_test/simd_test.cc).
"""
import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "xvcn.cpp")

# Restriction-flag bit order; must match enum RestrBit in xvcn.cpp.
RESTR_FLAG_ORDER = [
    "disable_ext2_cabac_alt_residual_ctx",
    "disable_cabac_coeff_sig_ctx",
    "disable_cabac_coeff_greater1_ctx",
    "disable_cabac_coeff_greater2_ctx",
    "disable_cabac_coeff_last_pos_ctx",
    "disable_cabac_subblock_csbf_ctx",
    "disable_ext_cabac_alt_last_pos_ctx",
    "disable_transform_cbf",
    "disable_transform_subblock_csbf",
    "disable_transform_last_position",
    "disable_transform_residual_greater_than_flags",
    "disable_transform_residual_greater2",
    "disable_transform_sign_hiding",
    "disable_transform_adaptive_exp_golomb",
]

# Context family order; must match enum FamIdx in xvcn.cpp.
FAMILY_ORDER = [
    "coeff_csbf_luma", "coeff_csbf_chroma",
    "coeff_sig_luma", "coeff_sig_chroma",
    "coeff_greater1_luma", "coeff_greater1_chroma",
    "coeff_greater2_luma", "coeff_greater2_chroma",
    "coeff_ext_csbf_luma", "coeff_ext_csbf_chroma",
    "coeff_ext_sig_luma", "coeff_ext_sig_chroma",
    "coeff_ext_greater1_luma", "coeff_ext_greater1_chroma",
    "coeff_last_pos_x_luma", "coeff_last_pos_x_chroma",
    "coeff_last_pos_y_luma", "coeff_last_pos_y_chroma",
]


def restr_bits(restr) -> int:
    bits = getattr(restr, "_xvcn_mask", None)
    if bits is None:
        bits = 0
        for i, name in enumerate(RESTR_FLAG_ORDER):
            if getattr(restr, name):
                bits |= 1 << i
        try:
            restr._xvcn_mask = bits
        except AttributeError:
            pass
    return bits


# Deblock restriction flag order; must match enum DeblockFlagBit in
# xvcn.cpp.
DEBLOCK_FLAG_ORDER = [
    "disable_deblock_strong_filter",
    "disable_deblock_weak_filter",
    "disable_deblock_boundary_strength_zero",
    "disable_deblock_boundary_strength_one",
    "disable_deblock_initial_sample_decision",
    "disable_deblock_weak_sample_decision",
    "disable_deblock_two_samples_weak_filter",
    "disable_deblock_depending_on_qp",
]


def deblock_bits(restr) -> int:
    bits = 0
    for i, name in enumerate(DEBLOCK_FLAG_ORDER):
        if getattr(restr, name):
            bits |= 1 << i
    return bits


def family_offsets() -> np.ndarray:
    from ..cabac.contexts import OFFSETS
    return np.array([OFFSETS[f] for f in FAMILY_ORDER], dtype=np.int32)


def _build() -> str:
    """Compile the native runtime.  XVC_NATIVE_SANITIZE=1 builds with
    UBSan in trap-on-error mode (no runtime library needed, so it works
    under ctypes): any undefined behavior aborts the process instead of
    silently corrupting — the analog of the reference's SANITIZE_BUILD
    cmake option (ref: CMakeLists.txt:22), exercised by
    tests/test_sanitize_native.py."""
    sanitize = os.environ.get("XVC_NATIVE_SANITIZE", "0") == "1"
    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    for name in ("xvcn_pic.inc", "xvcn_enc.inc",
                 "xvcn_enc_inter.inc"):
        inc = os.path.join(_DIR, name)
        if os.path.exists(inc):
            with open(inc, "rb") as f:
                h.update(f.read())
    # Profile-guided build: measured neutral on this codebase (the hot
    # loops are already branch-predictable or vectorized), so opt-in.
    pgo = (not sanitize and
           os.environ.get("XVC_NATIVE_PGO", "0") == "1")
    digest = h.hexdigest()[:16]
    tag = "_ubsan" if sanitize else ("_pgo" if pgo else "")
    so_path = os.path.join(_DIR, f"_xvcn_{digest}{tag}.so")
    if os.path.exists(so_path):
        return so_path
    if pgo:
        try:
            return _build_pgo(so_path)
        except Exception:
            # fall through to the plain build (different cache name so a
            # later import can retry PGO)
            so_path = os.path.join(_DIR, f"_xvcn_{digest}.so")
            if os.path.exists(so_path):
                return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    base = ["g++", "-std=c++14", "-O3", "-g", "-fPIC", "-shared",
            "-fvisibility=hidden"]
    if sanitize:
        # memory/control-flow UB only: the arithmetic set
        # (signed-overflow, shift-base) is excluded because the codec
        # intentionally mirrors the reference's wrapping int semantics
        base += ["-fsanitize=bounds,null,object-size,return,vla-bound,"
                 "alignment,nonnull-attribute",
                 "-fsanitize-undefined-trap-on-error"]
    # -march=native roughly doubles the MC/transform throughput (the
    # compiler vectorizes the filter loops); -mtls-dialect=gnu2 (TLSDESC)
    # removes the __tls_get_addr call from every thread_local scratch
    # buffer access (~4% of encode).  Fall back progressively if the
    # toolchain rejects either.
    for extra in (["-march=native", "-mtls-dialect=gnu2"],
                  ["-march=native"], []):
        cmd = base + extra + [_SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            break
        except subprocess.CalledProcessError:
            if not extra:
                raise
    os.replace(tmp, so_path)
    return so_path


# Training workload for the profile-guided build: a tiny end-to-end
# encode (AI + low-delay inter) and decode pair touching every hot
# native path (CABAC parse/write, intra search, ME, RDO quant, MC,
# transforms, deblock, checksum/postprocess).
_PGO_TRAIN = r"""
import numpy as np
from xvc_tpu import api
from xvc_tpu.codec.decoder import decode_stream
rng = np.random.RandomState(3)
w, h, n = 96, 64, 3
frames = []
yy, xx = np.mgrid[0:h, 0:w]
for t in range(n):
    y = np.clip(120 + 50*np.sin((xx+5*t)/9.0) + rng.randint(-9, 10, (h, w)),
                0, 255).astype(np.uint8)
    u = np.clip(128 + 20*np.cos((yy[::2, ::2]+3*t)/7.0), 0,
                255).astype(np.uint8)
    v = np.clip(128 - 20*np.sin((xx[::2, ::2]+2*t)/8.0), 0,
                255).astype(np.uint8)
    frames.append(y.tobytes() + u.tobytes() + v.tobytes())
for kw in (dict(num_ref_pics=0, sub_gop_length=1, speed_mode=2),
           dict(num_ref_pics=1, sub_gop_length=1, speed_mode=2),
           dict(num_ref_pics=2, sub_gop_length=4, speed_mode=1)):
    p = api.EncoderParameters(width=w, height=h, qp=30, input_bitdepth=8,
                              internal_bitdepth=8, **kw)
    enc = api.EncoderSession(p)
    nals = []
    for f in frames:
        nals += enc.encode(f)
    nals += enc.flush()
    bs = b"".join(len(x).to_bytes(4, "little") + x for x in nals)
    pics = decode_stream(bs)
    assert all(pc.conforming for pc in pics)
print("PGO-TRAIN-OK")
"""


def _build_pgo(so_path):
    """Two-stage profile-guided build: instrumented compile -> tiny
    encode/decode training run in a subprocess -> optimized recompile
    with the recorded branch/count profile.  The CABAC/RDO hot loops are
    branch-dominated, where PGO's value lies."""
    import sys
    import tempfile
    flags = ["g++", "-std=c++14", "-O3", "-fPIC", "-shared",
             "-fvisibility=hidden", "-march=native",
             "-mtls-dialect=gnu2"]
    with tempfile.TemporaryDirectory(prefix="xvcn_pgo_") as pgo_dir:
        instr = os.path.join(pgo_dir, "xvcn_instr.so")
        subprocess.run(
            flags + [f"-fprofile-generate={pgo_dir}", _SRC, "-o", instr],
            check=True, capture_output=True)
        env = dict(os.environ)
        env["XVC_NATIVE_SO"] = instr
        env["XVC_NATIVE_PGO"] = "0"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_DIR))
        r = subprocess.run(
            [sys.executable, "-c", _PGO_TRAIN], env=env,
            capture_output=True, text=True, timeout=600)
        if r.returncode != 0 or "PGO-TRAIN-OK" not in r.stdout:
            raise RuntimeError("PGO training failed: %s" % r.stderr[-500:])
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            flags + [f"-fprofile-use={pgo_dir}", "-fprofile-correction",
                     _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def _bind(lib):
    c = ctypes
    u8p = c.c_void_p
    i32p = c.c_void_p
    # decoder
    lib.xvcn_dec_create.restype = c.c_void_p
    lib.xvcn_dec_create.argtypes = [c.c_char_p, c.c_int64, c.c_int64, c.c_int]
    lib.xvcn_dec_destroy.argtypes = [c.c_void_p]
    lib.xvcn_dec_get_pos.restype = c.c_int64
    lib.xvcn_dec_get_pos.argtypes = [c.c_void_p]
    lib.xvcn_dec_get_error.restype = c.c_int
    lib.xvcn_dec_get_error.argtypes = [c.c_void_p]
    lib.xvcn_dec_decode_bin.restype = c.c_int
    lib.xvcn_dec_decode_bin.argtypes = [c.c_void_p, u8p, c.c_int]
    lib.xvcn_dec_decode_bypass.restype = c.c_int
    lib.xvcn_dec_decode_bypass.argtypes = [c.c_void_p]
    lib.xvcn_dec_decode_bypass_bins.restype = c.c_uint32
    lib.xvcn_dec_decode_bypass_bins.argtypes = [c.c_void_p, c.c_int]
    lib.xvcn_dec_decode_bin_trm.restype = c.c_int
    lib.xvcn_dec_decode_bin_trm.argtypes = [c.c_void_p]
    lib.xvcn_dec_finish.argtypes = [c.c_void_p]
    lib.xvcn_read_coefficients.restype = c.c_int
    lib.xvcn_read_coefficients.argtypes = [
        c.c_void_p, u8p, i32p, c.c_uint64, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, i32p, c.c_int]
    # encoder
    lib.xvcn_enc_create.restype = c.c_void_p
    lib.xvcn_enc_create.argtypes = [c.c_int, c.c_int, c.c_int64]
    lib.xvcn_enc_destroy.argtypes = [c.c_void_p]
    lib.xvcn_enc_get_frac_bits.restype = c.c_uint64
    lib.xvcn_enc_get_frac_bits.argtypes = [c.c_void_p]
    lib.xvcn_enc_set_frac_bits.argtypes = [c.c_void_p, c.c_uint64]
    lib.xvcn_enc_get_error.restype = c.c_int
    lib.xvcn_enc_get_error.argtypes = [c.c_void_p]
    lib.xvcn_enc_get_out_len.restype = c.c_int64
    lib.xvcn_enc_get_out_len.argtypes = [c.c_void_p]
    lib.xvcn_enc_copy_out.argtypes = [c.c_void_p, u8p]
    lib.xvcn_enc_encode_bin.argtypes = [c.c_void_p, u8p, c.c_int, c.c_int]
    lib.xvcn_enc_encode_bypass.argtypes = [c.c_void_p, c.c_int]
    lib.xvcn_enc_encode_bypass_bins.argtypes = [c.c_void_p, c.c_uint32,
                                                c.c_int]
    lib.xvcn_enc_encode_bin_trm.argtypes = [c.c_void_p, c.c_int]
    lib.xvcn_enc_finish.argtypes = [c.c_void_p]
    lib.xvcn_write_coefficients.restype = c.c_int
    lib.xvcn_write_coefficients.argtypes = [
        c.c_void_p, u8p, i32p, c.c_uint64, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, i32p, c.c_int]
    # rdo quant
    lib.xvcn_quant_rdo.restype = c.c_int
    lib.xvcn_quant_rdo.argtypes = [
        u8p, i32p, c.c_uint64, c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_int64, c.c_int64, c.c_int, c.c_int64,
        i32p, i32p, c.c_int]
    lib.xvcn_deblock_pass.argtypes = [
        c.c_void_p, c.c_int64, c.c_void_p, c.c_int64, c.c_void_p, c.c_int64,
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_uint64, c.c_int,
        c.c_void_p, c.c_int, c.c_void_p]
    lib.xvcn_metric.restype = c.c_int64
    lib.xvcn_metric.argtypes = [
        c.c_int, c.c_void_p, c.c_int64, c.c_void_p, c.c_int64,
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_double]
    lib.xvcn_intra_filter_ref.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_void_p, c.c_void_p]
    lib.xvcn_intra_pred_dc.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_intra_pred_planar.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_intra_pred_angular.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_to_i16.argtypes = [c.c_void_p, c.c_int64, c.c_void_p]
    lib.xvcn_mc_unipred.argtypes = [
        c.c_int, c.c_void_p, c.c_int64, c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_int, c.c_void_p, c.c_int64]
    lib.xvcn_inv_transform.argtypes = [
        c.c_void_p, c.c_int, c.c_int, c.c_void_p, c.c_void_p,
        c.c_int, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_fwd_transform.argtypes = [
        c.c_void_p, c.c_int, c.c_int, c.c_void_p, c.c_void_p,
        c.c_int, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_intra_prepass_satd.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
        c.c_void_p, c.c_int64, c.c_int, c.c_int, c.c_void_p]
    lib.xvcn_recon_dist.restype = c.c_int64
    lib.xvcn_recon_dist.argtypes = [
        c.c_void_p, c.c_int, c.c_int,               # levels, h, w
        c.c_int, c.c_int, c.c_int,                  # dq scale/shift, kind
        c.c_void_p, c.c_void_p,                     # m1, m2
        c.c_int, c.c_int, c.c_int,                  # shift1/2, zo
        c.c_int, c.c_int, c.c_int,                  # skip sh/sc, dc sh
        c.c_void_p, c.c_int64,                      # pred, stride
        c.c_void_p, c.c_int64,                      # orig, stride
        c.c_void_p, c.c_int64,                      # rec, stride
        c.c_void_p, c.c_int, c.c_int, c.c_int,      # resi, bd, metric, qp
        c.c_double]
    lib.xvcn_version.restype = c.c_int
    if hasattr(lib, "xvcn_decode_picture"):
        lib.xvcn_decode_picture.restype = c.c_int
        lib.xvcn_decode_picture.argtypes = [c.c_void_p]
    if hasattr(lib, "xvcn_encode_picture_intra"):
        lib.xvcn_encode_picture_intra.restype = c.c_int
        lib.xvcn_encode_picture_intra.argtypes = [c.c_void_p]
    return lib


LIB = None
if os.environ.get("XVC_NATIVE", "1") != "0":
    try:
        # XVC_NATIVE_SO: load a pre-built library instead of building
        # (used by the PGO training stage to run the instrumented build)
        _so = os.environ.get("XVC_NATIVE_SO") or _build()
        LIB = _bind(ctypes.CDLL(_so))
    except Exception as _e:  # noqa: BLE001 - fall back to the Python path
        # The Python twin is bit-identical, so a silent fallback would
        # hide a broken native build (and a ~20x slowdown): warn loudly.
        import warnings
        _msg = str(_e)
        if isinstance(_e, subprocess.CalledProcessError):
            _msg = (_e.stderr or b"").decode(errors="replace")[-2000:]
        warnings.warn("xvc_tpu native build unavailable, using the "
                      "pure-Python path: %s" % _msg, RuntimeWarning)
        LIB = None


def available() -> bool:
    return LIB is not None


def ctx_ptr(state: np.ndarray) -> int:
    return state.ctypes.data


def i32_ptr(arr: np.ndarray) -> int:
    return arr.ctypes.data
