"""DSP engine selection for the reconstruction path.

XVC_DSP=host  (default) — NumPy / native C++ per-CU host loop
XVC_DSP=jax   — batched JAX device reconstruction (bit-identical; see
                xvc_tpu/tpu/recon.py).  This is the determinism contract
                the reference pins between its SIMD and scalar paths
                (ref: test/xvc_test/simd_test.cc:149-176).
"""
import os


def dsp_engine():
    return os.environ.get("XVC_DSP", "host").lower()


def use_jax_dsp():
    return dsp_engine() == "jax"
