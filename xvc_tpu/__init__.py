"""xvc_tpu: a TPU-native video codec framework with the capabilities of xvc.

Compute path: JAX/XLA/Pallas integer kernels for prediction, transforms,
quantization, deblocking and metrics; host-side (C++-accelerated) CABAC and
bitstream plumbing.  Bitstream-compatible with xvc version 2.
"""

__version__ = "0.1.0"
