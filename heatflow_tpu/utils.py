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


def resolve_recording_precondition(record_gradient: bool, dtype,
                                   *, unstructured_xla: bool = False,
                                   fixed_iters=None,
                                   batched: bool = False,
                                   unstructured: bool = False) -> str:
    """Driver-default CG preconditioner: a line preconditioner for f32
    gradient-recording runs, 'jacobi' otherwise.

    At f32, jacobi-CG's unconverged error concentrates in exactly the
    near-axis radial modes the gradient artifacts amplify by ~1/h_r — the
    raw-axis CSV (ref run_no_diamond.py:610-617) picks up spurious spikes
    ~44x the rline engine's at the same rtol, while rline is also the
    faster VMEM recording engine (measured, BENCHMARKS.md "recording
    engines"). f64 runs converge past the artifact's sensitivity either
    way. The unstructured rline path is the overlay VMEM engine
    (``unstructured_xla=True`` keeps jacobi), and vmem rline is
    tolerance-based (a fixed iteration budget keeps jacobi).

    Structured SINGLE-RUN recording (``batched=False, unstructured=False``)
    gets 'adi' (split-additive r-line + z-line): +53% steps/s at
    same-class artifact error vs rline on the flagship recording point
    (interleaved A/B, benchmarks/expt_adi_record.py — under wrt-r0
    stopping with extrapolated seeds rline grinds near the f32 floor).
    Batched sweeps and overlay meshes keep 'rline': adi measured 15-19%
    SLOWER on every batched sweep row (the batched kernels re-factor the
    stacks per config per solve, where the single-problem kernel pays
    once per transient — BENCHMARKS.md "ADI in the batched sweep
    kernels"); it stays available as an explicit opt-in there.
    """
    import jax.numpy as jnp
    if not (record_gradient and jnp.dtype(dtype) == jnp.float32
            and fixed_iters is None and not unstructured_xla):
        return "jacobi"
    return "rline" if (batched or unstructured) else "adi"
