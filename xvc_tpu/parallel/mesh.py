"""Device mesh construction + the mesh-sharded intra analysis.

The encoder's whole-frame intra lookahead (xvc_tpu/tpu/lookahead.py) is
the batched device stage of the encode path; this module shards it over
a jax.sharding.Mesh: blocks of the frame are data-parallel over the
mesh's first axis, the per-mode weight tensor is replicated, and XLA
inserts any collectives.  Sharded and unsharded runs are bit-identical
(every block's cost map is an independent integer computation), so a
sharded-lookahead encode produces byte-identical bitstreams — the
reference's determinism contract (ref: test/xvc_test/simd_test.cc:
149-176) lifted to the mesh, with picture-level thread parallelism
(ref: src/xvc_enc_lib/thread_encoder.cc) layered on top by
xvc_tpu/parallel/pipeline.py.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis="blk"):
    """Build a 1-axis data-parallel mesh over the given (or all)
    devices; the same axis shards decode block batches
    (xvc_tpu/tpu/recon.py) and encode lookahead block batches."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_count(mesh):
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def make_sharded_intra_satd_fn(mesh, n, bitdepth, mode_step=1):
    """Mesh-sharded twin of analysis.make_intra_satd_fn: blocks are
    split over every mesh axis (data parallel); returns
    fn(orig [B,n,n], top [B,2n+1], left [B,2n]) -> [B,67] int32 with B
    a multiple of the device count.  Bit-identical to the unsharded
    function."""
    import jax.numpy as jnp

    from ..tpu import intra_batch as ib
    from ..tpu import satd as satd_mod

    axes = P(mesh.axis_names)
    dspec = NamedSharding(mesh, axes)
    rep = NamedSharding(mesh, P())
    # On a process-spanning mesh (multihost.global_mesh) the caller
    # device_gets the result, so ask XLA to all-gather it (replicated
    # output = fully addressable in every process); single-process
    # meshes keep the sharded output and let device_get assemble it.
    multiproc = jax.process_count() > 1

    def step(orig, top, left, weights):
        post_filter = n <= 16 and mode_step == 1
        preds = ib.predict_all_modes(n, top, left, weights, bitdepth,
                                     post_filter)
        diff = orig[:, None].astype(jnp.int32) - preds
        return satd_mod.satd_square(diff, bitdepth)

    jitted = jax.jit(step, in_shardings=(dspec, dspec, dspec, rep),
                     out_shardings=rep if multiproc else dspec)
    weights = np.asarray(ib.angular_weight_tensor(n)[::mode_step])

    def fn(orig, top, left):
        if multiproc:
            # Each process holds the identical full numpy input; build
            # the global sharded jax.Arrays from the local copies.
            orig, top, left = (
                jax.make_array_from_callback(np.shape(x), dspec,
                                             lambda idx, x=x: x[idx])
                for x in (np.asarray(orig), np.asarray(top),
                          np.asarray(left)))
        return jitted(orig, top, left, weights)

    return fn
