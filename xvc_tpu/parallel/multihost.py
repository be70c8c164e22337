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


# ---------------------------------------------------------------------------
# Cross-host GOP pipelining (encode)
#
# The reference's peak deployment is one host's picture-per-thread pool
# (ref: src/xvc_enc_lib/thread_encoder.cc:99-158).  The multi-host analog
# splits a sub-GOP's pictures over PROCESSES by DOC ownership: each
# process runs the full (deterministic) session logic but encodes only
# the pictures it owns; after a picture finishes, its NAL bytes and its
# final reconstruction planes are broadcast to every process over the
# global mesh (an XLA psum across DCN), so later pictures on other hosts
# predict from them exactly as on one host.  Cross-picture state beyond
# the recon planes (TMVP motion fields) stays host-local, so the mode
# requires the signaled tmvp restrictions (a planes-only-cross-host
# profile): EncoderSettings.explicit_restrictions = GOP_PIPELINE_PROFILE.
# Within that profile the bitstream is byte-identical to a single-host
# encode (tests/test_multihost.py).
# ---------------------------------------------------------------------------

GOP_PIPELINE_PROFILE = ("disable_inter_tmvp_mvp",
                        "disable_inter_tmvp_merge",
                        "disable_inter_tmvp_ref_list_derivation")

_BCAST_FNS = {}


def _bcast(arr, owner):
    """Return OWNER's `arr` on every process (all processes call this
    with the same shape/dtype; non-owners' data is ignored).  Lowered as
    a psum over the global mesh: the owner's first device contributes
    the data, every other device contributes zeros."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = global_mesh()
    devlist = list(mesh.devices.flat)
    ndev = len(devlist)
    me = jax.process_index()
    owner_first = next(i for i, d in enumerate(devlist)
                       if d.process_index == owner)
    arr = np.ascontiguousarray(arr, np.int32)
    sh = NamedSharding(mesh, P("blk"))

    def cb(idx):
        i = idx[0].start or 0
        if i == owner_first and me == owner:
            return arr[None]
        return np.zeros((1,) + arr.shape, np.int32)

    garr = jax.make_array_from_callback((ndev,) + arr.shape, sh, cb)
    key = (mesh, arr.shape)
    fn = _BCAST_FNS.get(key)
    if fn is None:
        fn = jax.jit(lambda x: x.sum(0),
                     out_shardings=NamedSharding(mesh, P()))
        _BCAST_FNS[key] = fn
    return np.asarray(jax.device_get(fn(garr)))


def _pad_pow2(n):
    p = 64
    while p < n:
        p <<= 1
    return p


def exchange_picture(pic_enc, nal_bytes, owner):
    """Broadcast one finished picture from its owner process: NAL bytes
    plus the final (deblocked) reconstruction planes.  Non-owners
    install the recon into their picture buffer (the DPB write a local
    encode would have produced) and return the received NAL bytes."""
    import jax
    import numpy as np
    me = jax.process_index()
    hdr = np.zeros(1, np.int32)
    if me == owner:
        hdr[0] = len(nal_bytes)
    n = int(_bcast(hdr, owner)[0])
    buf = np.zeros(_pad_pow2(n), np.int32)
    if me == owner:
        buf[:n] = np.frombuffer(nal_bytes, np.uint8)
    buf = _bcast(buf, owner)
    if me != owner:
        nal_bytes = bytes(buf[:n].astype(np.uint8))
    rec = pic_enc.rec_pic
    from .. import constants as k
    ncomp = 1 if rec.chroma_format == k.ChromaFormat.MONOCHROME else 3
    for comp in range(ncomp):
        pl = pic_enc.rec_pic.plane_view(comp)
        send = pl if me == owner else np.zeros(pl.shape, pl.dtype)
        got = _bcast(send, owner)
        if me != owner:
            pl[:] = got.astype(pl.dtype)
    if me != owner:
        rec.pad_border()
        # The recycled buffer may carry the PREVIOUS occupant's device
        # caches (deblock tail attaches _dev_planes / flat-recon slots
        # under XVC_DSP=jax); a non-owner never deblocks a received
        # picture, so invalidate here exactly as the decoder does when
        # a buffer is recycled (codec/picture_decoder.py:163-168).
        rec._dev_planes = None
        rec._dev_pre_deblock = None
        if getattr(rec, "_dev_slots", None):
            from ..tpu.flat_recon import release_slot
            release_slot(rec)
        rec.invalidate_shadow16()
    return nal_bytes


def encode_or_receive(session, pic_enc, segment_header, owner):
    """One picture of the cross-host GOP pipeline: the owner process
    encodes it, everyone else receives it (Encoder._encode_one_picture
    calls this when session.multihost_gop is set)."""
    import jax
    nal_bytes = None
    if jax.process_index() == owner:
        nal_bytes = pic_enc.encode(
            segment_header, session.segment_qp,
            1 if pic_enc.buffer_flag else 0, session.settings)
    return exchange_picture(pic_enc, nal_bytes, owner)
