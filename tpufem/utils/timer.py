"""Wall-clock section timing with device synchronization.

Reference analogue: ``dealii::Timer``/``TimerOutput`` wall-clock sections
plus CUDA-event kernel timing in the benchmarks (SURVEY.md §5 "Tracing /
profiling").  Device work is bracketed with block_until_ready; for kernel-
level profiles use jax.profiler traces (see tpufem.utils.metrics).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timer:
    """Accumulating section timer (TimerOutput analogue)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync: object | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["+---------------------------+----------+-------+"]
        lines.append("| section                   | total s  | calls |")
        lines.append("+---------------------------+----------+-------+")
        for k in sorted(self.totals):
            lines.append(
                f"| {k:<25} | {self.totals[k]:8.3f} | {self.counts[k]:5d} |"
            )
        lines.append("+---------------------------+----------+-------+")
        return "\n".join(lines)


def _sync(out):
    """Force completion.  On this machine's remote-TPU runtime
    block_until_ready can return before a Pallas-chain program finishes;
    a scalar D2H fetch is the only reliable barrier (docs/ROOFLINE.md
    round 3) — cheap after the process's first fetch."""
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.abs(leaf.ravel()[:1])))


def time_fn(fn, *args, reps: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call with a reliable device sync (CUDA-event
    analogue for benchmarking kernels)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps
