"""Profiling / tracing utilities (SURVEY.md §5: the reference has none beyond
tqdm; this supplies the TPU-native observability layer)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chain_bench(fn, x, n1: int = 5, n2: int = 25):
    """Wall-time per iteration via data-dependent chaining + host read.

    Plain ``block_until_ready`` timing is unreliable on tunneled platforms
    (it can return before execution); the two-length slope cancels the fixed
    dispatch/round-trip latency.
    """
    import jax.numpy as jnp

    z = fn(x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(z)[0])[0])

    def run(n):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def throughput_gbs(seconds: float, bytes_moved: int) -> float:
    return bytes_moved / seconds / 1e9 if seconds > 0 else float("inf")


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.3f}s")
