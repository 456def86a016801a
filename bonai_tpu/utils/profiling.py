"""Profiling helpers.

reference: ``mmdet/utils/profiling.py:9-40`` (``profile_time`` via CUDA
events) and ``tools/benchmark.py`` synchronised timing.  TPU equivalents:
``block_until_ready``-bracketed wall timing plus ``jax.profiler`` traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(trace_name, name, enabled=True, stream=None, end_stream=None):
    """Print elapsed wall time for a block, synchronising device work."""
    if not enabled:
        yield
        return
    import jax
    t0 = time.perf_counter()
    yield
    # synchronise all live arrays cheaply by a trivial device op
    jax.block_until_ready(jax.numpy.zeros(()))
    elapsed = time.perf_counter() - t0
    print(f"{trace_name} {name} elapsed_time: {elapsed * 1000:.2f} ms")


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a jax.profiler trace (xplane + perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters=10, warmup=2, **kwargs):
    """Measure steady-state latency of a jitted fn (blocking each call)."""
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
