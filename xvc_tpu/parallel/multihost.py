"""Multi-host scale-out: process-spanning meshes for the codec.

The reference is a single-process codec; its scale ceiling is one
host's threads (ref: src/xvc_enc_lib/thread_encoder.cc:29-159,
src/xvc_dec_lib/thread_decoder.cc:109-176).  The TPU design extends the
same two scale-out axes across hosts via JAX's multi-controller
runtime:

* **block-batch sharding** (decode reconstruction, encode lookahead):
  the batched device stages shard their 'blk' axis over a global mesh
  that spans every process's devices; XLA lowers the replicated
  reference-plane reads and the sharded gathers onto ICI/DCN
  collectives.  Every stage is an exact integer computation, so the
  sharded==unsharded byte-equality contract holds across hosts exactly
  as it does on one host (tests/test_sharding.py).
* **GOP-across-devices pipelining** (encode): each in-flight picture of
  a sub-GOP pins its device stages to one device of the global mesh
  (xvc_tpu/parallel/pipeline.py); with a process-spanning mesh the
  pictures of a burst spread over hosts while CABAC stays host-local.

Usage (one call per process, before any jax computation):

    from xvc_tpu.parallel import multihost
    multihost.init()                      # env-driven (JAX_COORDINATOR..)
    mesh = multihost.global_mesh()        # spans all processes' devices
    from xvc_tpu import engine
    engine.set_mesh(mesh)

This module only wires the runtime up; it deliberately adds no new
communication pattern — the codec's device stages are already written
against an abstract Mesh and do not care whether its devices are local.
"""
import os


def init(coordinator_address=None, num_processes=None, process_id=None,
         local_device_ids=None):
    """Initialize the JAX multi-controller runtime for this process.

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID), which
    cluster launchers (SLURM/GKE) set automatically — with none present
    this is a no-op and the codec stays single-process.  Returns True
    if a multi-process runtime was initialized."""
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes:
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def global_mesh(axis="blk"):
    """1-axis data-parallel mesh over every device of every process.

    The same 'blk' axis name the single-host paths use, so
    engine.set_mesh(global_mesh()) upgrades block-batch sharding and the
    GOP pipeline to multi-host without further changes."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_multiprocess():
    import jax
    return jax.process_count() > 1
