"""Label-based timing registry — TPU analog of the reference's
TimerOutputs @⌛ macros (src/util.jl:332-390). Wraps jitted calls with
block_until_ready so timings are real device times; also integrates
with the jax profiler for deep traces."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_timers = defaultdict(lambda: [0.0, 0])
_enabled = True


def set_timing_enabled(flag: bool):
    global _enabled
    _enabled = flag


@contextlib.contextmanager
def timed(label: str, sync=True):
    """Context manager accumulating wall time under label.

    Yields a sync function — pass the block's outputs through it
    (``state = s(compute(...))``) so the timing blocks on the actual
    device work. Pure jitted programs dispatch asynchronously, so
    without it the exit can only jax.effects_barrier() (which waits for
    *effectful* computations only) and the block's device time would be
    attributed to whichever later block first blocks on the result."""
    if not _enabled:
        yield lambda x: x
        return
    synced = [False]

    def _sync(x):
        synced[0] = True
        return jax.block_until_ready(x)

    t0 = time.perf_counter()
    try:
        yield _sync
    finally:
        if sync and not synced[0]:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        _timers[label][0] += dt
        _timers[label][1] += 1


def timed_fn(label: str):
    def deco(fn):
        def wrapper(*a, **kw):
            with timed(label):
                out = fn(*a, **kw)
                out = jax.block_until_ready(out) if _enabled else out
            return out
        return wrapper
    return deco


def timers_snapshot():
    """Copy of the registry, for delta reports (timer_report(since=...))."""
    return {k: tuple(v) for k, v in _timers.items()}


def timer_report(since=None):
    """Formatted table of accumulated timings; pass since= an earlier
    timers_snapshot() to report only the delta (the analog of the
    reference's per-step merged worker timers, src/sampling.jl:296-328)."""
    lines = ["label                              total(s)   calls    avg(ms)"]
    for k, (tot, n) in sorted(_timers.items(), key=lambda kv: -kv[1][0]):
        if since is not None:
            t0, n0 = since.get(k, (0.0, 0))
            tot, n = tot - t0, n - n0
            if n == 0 and tot <= 0:
                continue
        lines.append(f"{k:<34s} {tot:8.3f} {n:7d} {1e3 * tot / max(n, 1):9.2f}")
    return "\n".join(lines)


def reset_timers():
    _timers.clear()


@contextlib.contextmanager
def profiler_trace(logdir="/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
