"""Lightweight per-stage profiling + jax.profiler trace hooks.

The reference exposes only wall-clock + per-NAL stats in its apps
(ref: app/xvc_enc_app/encoder_app.cc:465,542,559-591); this module adds
the per-stage breakdown (SURVEY.md §5 tracing bullet) for both the host
and device paths:

    from xvc_tpu import profiling
    profiling.enable()
    ... encode/decode ...
    print(profiling.report())

Set XVC_PROFILE=1 to enable at import, XVC_TRACE_DIR=<dir> to also
capture a jax.profiler trace (viewable in TensorBoard / Perfetto).
"""
import collections
import contextlib
import os
import time

_stats = collections.defaultdict(float)
_counts = collections.defaultdict(int)
_enabled = bool(int(os.environ.get("XVC_PROFILE", "0") or 0))
_trace_dir = os.environ.get("XVC_TRACE_DIR", "")
_tracing = False


def enable(on=True):
    global _enabled
    _enabled = on


def enabled():
    return _enabled


def reset():
    _stats.clear()
    _counts.clear()


@contextlib.contextmanager
def span(name):
    """Accumulate wall-clock for a named stage (no-op when disabled)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _stats[name] += time.perf_counter() - t0
        _counts[name] += 1


def add_span_time(name, seconds, calls=1):
    """Fold an externally measured duration (e.g. native-side timers)
    into the span table (no-op when disabled)."""
    if not _enabled:
        return
    _stats[name] += seconds
    _counts[name] += calls


def report():
    """{stage: {"seconds": s, "calls": n}} sorted by time desc."""
    return {name: {"seconds": round(_stats[name], 4),
                   "calls": _counts[name]}
            for name in sorted(_stats, key=_stats.get, reverse=True)}


def format_report():
    lines = ["%-28s %10s %8s" % ("stage", "seconds", "calls")]
    for name, row in report().items():
        lines.append("%-28s %10.3f %8d" % (name, row["seconds"],
                                           row["calls"]))
    return "\n".join(lines)


def start_trace(trace_dir=None):
    """Begin a jax.profiler trace (device timeline, HLO ops)."""
    global _tracing
    import jax
    jax.profiler.start_trace(trace_dir or _trace_dir or "/tmp/xvc_trace")
    _tracing = True


def stop_trace():
    global _tracing
    if _tracing:
        import jax
        jax.profiler.stop_trace()
        _tracing = False


if _trace_dir:
    try:
        start_trace(_trace_dir)
    except Exception:
        pass
