"""Profiling and timing utilities.

The reference's observability is a per-frame cudaEvent TSV
(src/camera.cu:333-346). The TPU equivalents here: a `jax.profiler`
trace context for op-level analysis, and a reliable frame timer (a tiny
host fetch — `block_until_ready` does not block on some tunneled
backends; see tracer.render.driver).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x):
    """Force completion of a device array (fetch one element)."""
    return float(x.ravel()[0])


def time_fn(fn, *args, iters: int = 3, **kwargs):
    """Median wall time of fn(*args) with completion forced. Returns
    (seconds, last_result)."""
    out = fn(*args, **kwargs)
    sync(out)  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def mrays_per_s(width: int, height: int, spp: int, seconds: float) -> float:
    """reference camera.cu:344-345 convention: W*H*spp rays per frame."""
    return width * height * spp / seconds / 1e6
