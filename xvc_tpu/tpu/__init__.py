"""TPU (JAX/XLA) compute path: batched, MXU-native formulations of the
codec's hot analysis/compute loops.

Exact-integer semantics are preserved: every op here is validated
bit-exactly against the host reference path in xvc_tpu/ops/.
"""
