"""DSP engine selection for the reconstruction path.

XVC_DSP=host  (default) — NumPy / native C++ per-CU host loop
XVC_DSP=jax   — batched JAX device reconstruction (bit-identical; see
                xvc_tpu/tpu/recon.py).  This is the determinism contract
                the reference pins between its SIMD and scalar paths
                (ref: test/xvc_test/simd_test.cc:149-176).
"""
import os

_mesh = None


def dsp_engine():
    return os.environ.get("XVC_DSP", "host").lower()


def use_jax_dsp():
    return dsp_engine() == "jax"


def set_mesh(mesh):
    """Install a jax.sharding.Mesh: the device reconstruction stages
    shard their block batches over its 'blk' axis (data parallelism
    over CU blocks — the in-picture scaling axis of SURVEY.md §2.5)."""
    global _mesh
    _mesh = mesh


def get_mesh():
    return _mesh


def use_jax_intra_prepass():
    """XVC_INTRA_PREPASS=jax routes the encoder's 67-mode SATD pre-pass
    (intra_search.cc DetermineSlowIntraModes analog) through the batched
    device kernel — byte-identical bitstreams, pinned by tests."""
    return os.environ.get("XVC_INTRA_PREPASS", "").lower() == "jax" or \
        use_jax_dsp()
