"""Multi-chip parallelism: device meshes and sharded analysis steps.

The reference scales with picture-level worker threads
(ref: src/xvc_enc_lib/thread_encoder.cc); the TPU design instead shards
the batched analysis/compute steps over a jax.sharding.Mesh — blocks
over the 'data' axis and the intra mode dimension over the 'mode' axis —
and lets XLA insert the collectives.
"""
from .mesh import make_mesh, make_sharded_analysis_step  # noqa: F401
