"""Dependency-aware picture-parallel decode pipeline.

Behavioral equivalent of the reference thread pool
(ref: src/xvc_dec_lib/thread_decoder.cc:29-176): pictures decode
concurrently on worker threads once their reference pictures have
finished reconstruction; postprocessing (checksum + output conversion)
also runs on the worker so dependents wake as soon as samples are
ready.  The hot loops (native CABAC parse via ctypes, numpy DSP)
release the GIL, so picture-level threads scale on the host CPU.

The threaded and unthreaded paths are bit-identical by construction —
every picture sees exactly the reference pictures the sequential
decoder would have used (pinned by tests/test_threads.py, the analog of
test/xvc_test/restrictions_test.cc SupportParallelDecode*).
"""
import os
import threading
from concurrent.futures import ThreadPoolExecutor


def _pool_size(num_threads):
    """Clamp workers to hardware concurrency: the reference C++ threads
    oversubscribe almost for free (thread_encoder.cc:29), but Python
    workers pay GIL hand-offs around every native call, so on a loaded
    or small host extra workers only add contention.  Output is
    identical for any worker count by construction
    (tests/test_threads.py).  XVC_THREADS_NO_CLAMP=1 disables the
    clamp so the pipeline machinery itself stays testable on small
    hosts (sessions route a clamped pool of 1 to the sequential
    path)."""
    if os.environ.get("XVC_THREADS_NO_CLAMP"):
        return max(1, num_threads)
    hw = os.cpu_count() or num_threads
    return max(1, min(num_threads, hw))


class PictureJob:
    """One in-flight picture decode (ref: thread_decoder.h work item)."""

    __slots__ = ("pic_dec", "deps", "future")

    def __init__(self, pic_dec, deps):
        self.pic_dec = pic_dec
        self.deps = deps
        self.future = None


class DecodePipeline:
    """Executes picture decodes with inter-prediction dependencies."""

    def __init__(self, num_threads):
        self.executor = ThreadPoolExecutor(
            max_workers=_pool_size(num_threads),
            thread_name_prefix="xvc-dec")

    def submit(self, pic_dec, deps, segment_header, prev_segment_header,
               bit_reader):
        pic_dec._pipelined = True  # mesh pin rotation only pays when
        #                            pictures actually overlap
        if not hasattr(pic_dec, "recon_done"):
            pic_dec.recon_done = threading.Event()
        pic_dec.recon_done.clear()
        job = PictureJob(pic_dec, deps)

        def work():
            for dep in deps:
                ev = getattr(dep, "recon_done", None)
                if ev is not None:
                    ev.wait()
            try:
                ok = pic_dec.decode(segment_header, prev_segment_header,
                                    bit_reader, post_process=False)
            except ValueError:
                ok = False
            finally:
                # Dependents only need the reconstruction; wake them
                # before postprocessing (ref: thread_decoder.cc:152-170).
                pic_dec.recon_done.set()
            if ok:
                try:
                    ok = pic_dec.postprocess(segment_header, bit_reader)
                except ValueError:
                    ok = False
            return ok

        job.future = self.executor.submit(work)
        return job

    def shutdown(self):
        self.executor.shutdown(wait=True)


class EncodePipeline:
    """Picture-parallel encoding within a sub-gop burst.

    Behavioral equivalent of the reference encoder pool
    (ref: src/xvc_enc_lib/thread_encoder.cc:29-159): a picture encode
    starts once all reference pictures it predicts from have finished
    reconstruction; NAL harvesting stays in DOC order on the session
    thread so the bitstream is byte-identical to the sequential path.

    With a mesh installed (engine.set_mesh) this doubles as the
    GOP-across-devices pipeline — the TPU-mesh analog of the reference
    thread pool (SURVEY.md §2.5 mapping): each submitted picture is
    assigned one mesh device (round-robin over DOC) and its batched
    device stages (intra-lookahead SATD, ME SAD sweeps) run pinned to
    that chip, so concurrent pictures occupy different devices while
    CABAC stays on host worker threads.  Every device stage is a
    bit-exact integer computation, so device placement cannot change
    the bitstream: mesh-pipelined == threaded == sequential, byte for
    byte (tests/test_sharding.py).
    """

    def __init__(self, num_threads):
        self.executor = ThreadPoolExecutor(
            max_workers=_pool_size(num_threads),
            thread_name_prefix="xvc-enc")

    def submit(self, pic_enc, deps, segment_header, segment_qp, buffer_flag,
               settings, device=None):
        if not hasattr(pic_enc, "recon_done"):
            pic_enc.recon_done = threading.Event()
        pic_enc.recon_done.clear()
        job = PictureJob(pic_enc, deps)

        def work():
            for dep in deps:
                ev = getattr(dep, "recon_done", None)
                if ev is not None:
                    ev.wait()
            from .. import engine
            engine.set_pin_device(device)
            try:
                return pic_enc.encode(segment_header, segment_qp,
                                      buffer_flag, settings)
            finally:
                engine.set_pin_device(None)
                pic_enc.recon_done.set()

        job.future = self.executor.submit(work)
        return job

    def shutdown(self):
        self.executor.shutdown(wait=True)
