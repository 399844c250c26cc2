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
                                   unstructured: bool = False,
                                   f64_refine: int = 0,
                                   vmem_single: bool = False,
                                   rtol_wrt: str = "r0") -> str:
    """Driver-default CG preconditioner per regime (all measured,
    BENCHMARKS.md "ADI regime map" / "adaptive rline/adi switch").

    Structured SINGLE runs at f32 with tolerance stopping get a line
    preconditioner regardless of recording (round 4 — previously only
    recording runs were upgraded):

    - plain pure-f32: **'adi'** — under wrt-r0 stopping with extrapolated
      seeds rline grinds near the f32 floor on late steps (171-274
      iters/step) while adi converges before the floor bites (+64%
      steps/s measured; the adaptive switch would oscillate back into
      the grinding rline steps here, so static adi is right). Measured
      ONLY under the driver's wrt-'r0' stopping: a non-default
      ``rtol_wrt`` falls back to rline (recording) / jacobi, since adi's
      unconverged error under loose wrt-'b' stopping is ~20x
      jacobi/rline's at equal rtol;
    - with ``f64_refine`` (inner solves unit-normalized — no floor
      grind): **'adaptive'** when the VMEM path will engage
      (``vmem_single=True``) — the per-step rline/adi switch, +4.4% over
      static rline at identical accuracy (the promoted official point);
      'rline' otherwise (the adaptive switch exists only as the two VMEM
      kernel variants).

    Recording runs additionally NEED the line preconditioner for
    artifact quality: jacobi-CG's unconverged f32 error concentrates in
    exactly the near-axis radial modes the gradient artifacts amplify by
    ~1/h_r — the raw-axis CSV (ref run_no_diamond.py:610-617) picks up
    spurious spikes ~44x the rline engine's at the same rtol.

    Batched sweeps and overlay meshes keep 'rline' when recording (adi
    measured 15-19% SLOWER on every batched sweep row — the batched
    kernels re-factor the stacks per config per solve) and 'jacobi' for
    plain sweeps (rline measured accuracy-matched neutral in the
    wrt-‖b‖ sweep regime). f64 runs converge past every such
    sensitivity and keep 'jacobi'; a fixed iteration budget keeps
    'jacobi' (the vmem line kernels are tolerance-based); the
    unstructured XLA path keeps 'jacobi' (its rline engine is the
    overlay VMEM kernel, ``unstructured_xla=True``).
    """
    import jax.numpy as jnp
    if not (jnp.dtype(dtype) == jnp.float32 and fixed_iters is None
            and not unstructured_xla):
        return "jacobi"
    if batched or unstructured:
        return "rline" if record_gradient else "jacobi"
    if f64_refine:
        return "adaptive" if vmem_single else "rline"
    if rtol_wrt != "r0":
        # the 'adi' single-run default is measured only under the driver's
        # increment-relative (wrt-'r0') stopping; with a user-specified
        # loose wrt-'b' rule adi's unconverged error is ~20x jacobi/rline's
        # at equal rtol (cg_vmem_batched_tol docstring) — keep the
        # accuracy-safe preconditioners there
        return "rline" if record_gradient else "jacobi"
    return "adi"
