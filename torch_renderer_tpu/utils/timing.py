"""Device-accurate timing + profiling harness.

Rebuild of the reference's ad-hoc `time.time()` brackets around every hot
region (SURVEY.md §5: batch_rendering_test.py:245-249, myrenderer.py:154-163,
pytorch3d_icp_registeration.py:158-171): a small utility that compiles,
warms, synchronizes (`block_until_ready`) and reports per-stage statistics,
plus a hook into jax.profiler for real traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax


@dataclasses.dataclass
class TimingResult:
    name: str
    mean_s: float
    min_s: float
    max_s: float
    reps: int
    compile_s: float

    def __str__(self) -> str:
        return (
            f"{self.name}: mean {self.mean_s * 1e3:.3f} ms  "
            f"min {self.min_s * 1e3:.3f} ms  max {self.max_s * 1e3:.3f} ms  "
            f"(n={self.reps}, compile {self.compile_s:.2f} s)"
        )


def time_fn(
    fn: Callable, *args, reps: int = 20, warmup: int = 1, name: str = "fn",
) -> TimingResult:
    """Time a (usually jitted) function with proper device synchronization."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args))

    samples: List[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    return TimingResult(
        name=name, mean_s=sum(samples) / len(samples),
        min_s=min(samples), max_s=max(samples), reps=reps, compile_s=compile_s,
    )


class StageTimer:
    """Per-stage wall-clock breakdown (H2D, render, backward, ...) — the
    reference prints exactly this kind of table from its scripts."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [
            f"  {k}: {v * 1e3:.2f} ms ({100 * v / total:.1f}%)"
            for k, v in self.stages.items()
        ]
        return "\n".join([f"total {total * 1e3:.2f} ms"] + lines)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (the TPU answer to the reference's
    commented-out #@profile hooks, batch_rendering_test.py:262)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
