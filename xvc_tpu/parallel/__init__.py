"""Multi-chip parallelism: device meshes and sharded analysis steps.

The reference scales with picture-level worker threads
(ref: src/xvc_enc_lib/thread_encoder.cc); the TPU design instead shards
the batched analysis/compute steps over a jax.sharding.Mesh — blocks
over the 'data' axis and the intra mode dimension over the 'mode' axis —
and lets XLA insert the collectives.

Imports are lazy: the host decode/encode path must not pay the jax
import cost (several seconds) unless a device feature is actually used.
"""


def __getattr__(name):
    if name in ("make_mesh", "make_sharded_intra_satd_fn",
                "shard_count"):
        from . import mesh
        return getattr(mesh, name)
    if name in ("init", "global_mesh", "is_multiprocess"):
        from . import multihost
        return getattr(multihost, name)
    raise AttributeError(name)
