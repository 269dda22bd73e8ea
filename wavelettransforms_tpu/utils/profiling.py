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


def chain_bench(fn, x, n1: int = 10, n2: int = 110, repeats: int = 5,
                warmup: int = 2, spread_out: list | None = None):
    """Wall-time per iteration via data-dependent chaining + host read.

    Plain ``block_until_ready`` timing is unreliable on tunneled platforms
    (it can return before execution); the two-length slope cancels the fixed
    dispatch/round-trip latency (~25-30 ms per chain on this host's tunnel).

    Robustness (the fixed overhead is noisy, so a single slope pair is not
    steady-state — round-1 driver runs saw 2x outliers and even negative
    slopes): run ``warmup`` throwaway chains first, then ``repeats``
    independent (n1, n2) slope pairs and return the median slope. With the
    default 100-step delta, per-chain noise of a few ms contributes
    <0.05 ms/step. If ``spread_out`` is given, the relative spread
    (max-min)/median across repeats is appended to it.
    """
    import statistics

    import jax.numpy as jnp

    def host_read(v):
        return float(jnp.ravel(jax.tree_util.tree_leaves(v)[0])[0])

    host_read(fn(x))  # compile

    def run(n):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        host_read(y)
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(max(n1, n2 // 5))
    slopes = [(lambda t1, t2: (t2 - t1) / (n2 - n1))(run(n1), run(n2))
              for _ in range(repeats)]
    med = statistics.median(slopes)
    if spread_out is not None:
        spread_out.append((max(slopes) - min(slopes)) / med if med > 0
                          else float("inf"))
    return med


def throughput_gbs(seconds: float, bytes_moved: int) -> float:
    return bytes_moved / seconds / 1e9 if seconds > 0 else float("inf")


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.3f}s")
