"""Profiling hooks (reference had only a wall-clock Timer, SURVEY §5).

Thin wrappers around jax.profiler: a trace context for capturing device
profiles viewable in TensorBoard/XProf, and a block-timer that synchronizes
on device work.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@jax.jit
def _barrier_probe(x):
    return x + 1.0


@contextlib.contextmanager
def device_timer(name: str, results: dict | None = None):
    """Times a block including device completion.

    The barrier is a tiny jit computation: blocking on a bare device_put
    only waits for that one transfer (the H2D stream), not previously
    dispatched compute — it would report dispatch latency, not step time.
    Compute streams execute in dispatch order, so blocking on a later
    computation's result waits for the block's work too."""
    start = time.perf_counter()
    yield
    # module-level jitted barrier: a fresh lambda per call would never hit
    # the trace cache and the retrace cost would be billed to the block
    jax.block_until_ready(_barrier_probe(0.0))
    dt = time.perf_counter() - start
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    else:
        print(f"[timer] {name}: {dt * 1000:.2f} ms")


def annotate(name: str):
    """Named trace annotation decorator for profiler visibility."""
    def deco(fn):
        def wrapped(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)

        return wrapped

    return deco
