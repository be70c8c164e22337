"""DSP engine selection for the reconstruction path.

XVC_DSP=host  (default) — NumPy / native C++ per-CU host loop
XVC_DSP=jax   — batched JAX device reconstruction (bit-identical; see
                xvc_tpu/tpu/recon.py).  This is the determinism contract
                the reference pins between its SIMD and scalar paths
                (ref: test/xvc_test/simd_test.cc:149-176).
"""
import os
import threading

_mesh = None
_tls = threading.local()


def dsp_engine():
    return os.environ.get("XVC_DSP", "host").lower()


def use_jax_dsp():
    return dsp_engine() == "jax"


def use_pallas_mc():
    """Pallas MC kernel for the flat decode path's window gathers
    (tpu/pallas_mc.py, 6-8x the XLA gather formulation on chip,
    bit-exact at the kernel level).  Opt-in via XVC_MC_PALLAS=1 for
    now: each (shape, variant) costs one Mosaic compile, and through
    this environment's remote-compile relay a cold decode's kernel set
    can take minutes to build; flip the default once the end-to-end
    on-chip decode has been timed with a warm cache.  Requires a
    non-CPU backend (Mosaic is TPU-only)."""
    import os
    if os.environ.get("XVC_MC_PALLAS") != "1":
        return False
    try:
        import jax
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform != "cpu"


def set_mesh(mesh):
    """Install a jax.sharding.Mesh: the device reconstruction stages
    shard their block batches over its 'blk' axis (data parallelism
    over CU blocks — the in-picture scaling axis of SURVEY.md §2.5)."""
    global _mesh
    _mesh = mesh


def get_mesh():
    return _mesh


def set_pin_device(dev):
    """Pin this thread's device dispatches to one mesh device.

    The GOP-across-devices pipeline (the mesh analog of the reference's
    picture-level thread pool, ref: src/xvc_enc_lib/thread_encoder.cc:
    99-158) assigns each in-flight picture one device of the mesh; the
    picture's batched device stages (intra lookahead SATD, ME SAD
    sweeps) then run on that device while other pictures' stages run
    concurrently on their own chips.  Thread-local so worker threads
    carry independent pins.  A pin takes precedence over block-level
    mesh sharding: with N pictures in flight, the scale-out axis is the
    picture, not the block batch."""
    _tls.dev = dev


def get_pin_device():
    return getattr(_tls, "dev", None)


def use_jax_intra_prepass():
    """XVC_INTRA_PREPASS=jax routes the encoder's 67-mode SATD pre-pass
    (intra_search.cc DetermineSlowIntraModes analog) through the batched
    device kernel — byte-identical bitstreams, pinned by tests."""
    return os.environ.get("XVC_INTRA_PREPASS", "").lower() == "jax" or \
        use_jax_dsp()


def use_native_pic_decode():
    """XVC_PIC_NATIVE=1 (default when the native runtime is available)
    routes whole-picture decode through xvcn_decode_picture: CABAC
    parse, MV derivation, reconstruction and deblocking in one C++
    call — the compiled-decoder role of the reference
    (ref: src/xvc_dec_lib/cu_decoder.cc:47-138).  Set XVC_PIC_NATIVE=0
    to force the per-CU Python host path (validation twin)."""
    if os.environ.get("XVC_PIC_NATIVE", "1") == "0":
        return False
    from .native import pic as native_pic
    return native_pic.available()


def use_jax_me():
    """XVC_ME=jax batches the TZ fullpel-SAD sweeps as device dispatches
    (xvc_tpu/tpu/me.py) on the Python encoder path — byte-identical
    bitstreams; the candidate axis is the encode-side scale-out axis."""
    return os.environ.get("XVC_ME", "").lower() == "jax"
