"""Small shared utilities: profiling and timing.

The reference's observability is wall-clock prints (SURVEY §5.1); here the
same summaries exist in the drivers plus real profiler traces on demand.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(outdir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) around
    the wrapped block when ``outdir`` is given; no-op otherwise."""
    if not outdir:
        yield
        return
    import jax
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {outdir}")


class StepTimer:
    """Wall-clock section timer with the reference's summary format."""

    def __init__(self):
        self.t0 = time.time()
        self.marks: dict[str, float] = {}

    def mark(self, name: str):
        self.marks[name] = time.time()

    def summary(self, num_steps: int) -> str:
        total = time.time() - self.t0
        lines = ["--- Timing Summary ---", f"Total time: {total:.2f} s"]
        prev = self.t0
        for name, t in self.marks.items():
            lines.append(f"{name}: {t - prev:.2f} s")
            prev = t
        if num_steps:
            lines.append(f"Average time per step: {total / num_steps:.4f} s")
        lines.append("----------------------")
        return "\n".join(lines)


def pad_to_multiple(arr, m: int):
    """Pad a 1D batch array to a multiple of m by repeating its last element
    (padded lanes recompute the last config and are sliced away by callers —
    the sweep/fit/multihost batch-sharding convention)."""
    import numpy as np
    arr = np.asarray(arr)
    pad = (-len(arr)) % m
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad)])
    return arr
