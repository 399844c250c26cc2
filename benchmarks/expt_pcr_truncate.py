#!/usr/bin/env python
"""Iteration-count experiment: TRUNCATED-PCR r-line preconditioning.

The rline preconditioner's per-application cost is ~ceil(log2(Nr)) = 11
levels of shifted multiply-adds (ops/linesolve.pcr_apply). From the
measured VMEM numbers (BENCHMARKS.md): rline iteration ~14.8 us vs plain
CG's 6.9, i.e. the PCR rhs phase costs ~0.72 us/level. Stopping the rhs
recursion after k < 11 levels leaves the stride-2^k couplings unsolved —
an INEXACT line solve, but preconditioners don't need exactness. If the
iteration count at k levels grows by less than the per-iteration saving
(win condition: iters(k)/iters(11) < 14.8 / (6.9 + 0.72k)), truncation is
free speed with a one-line kernel change.

Two caveats this script measures directly:
  * truncated PCR is NOT symmetric (the exact solve is T^{-1}, which is;
    the partial product of level transforms isn't) — report the asymmetry
    and whether PCG still converges cleanly;
  * the couplings that survive k levels are the near-axis radial ones
    (slowest decay), exactly the modes rline exists to kill.

Protocol: flagship scaled operator (expt_mg_rline.build_scaled_operator),
cold physical first-step rhs, PCG iterations to rtol.

Usage: python benchmarks/expt_pcr_truncate.py [--rtol 1e-5] [--levels 4,6,8,11]
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from expt_mg_rline import build_scaled_operator, pcg  # noqa: E402


def shift(v, d, axis):
    out = np.zeros_like(v)
    if d > 0:
        sl_dst = [slice(None)] * v.ndim; sl_src = [slice(None)] * v.ndim
        sl_dst[axis] = slice(0, v.shape[axis] - d)
        sl_src[axis] = slice(d, None)
    else:
        sl_dst = [slice(None)] * v.ndim; sl_src = [slice(None)] * v.ndim
        sl_dst[axis] = slice(-d, None)
        sl_src[axis] = slice(0, v.shape[axis] + d)
    out[tuple(sl_dst)] = v[tuple(sl_src)]
    return out


def pcr_factor(l, u, axis=-1):
    n = l.shape[axis]
    levels = []
    s = 1
    while s < n:
        alpha = 1.0 - l * shift(u, -s, axis) - u * shift(l, s, axis)
        inv_a = 1.0 / alpha
        l_new = -l * shift(l, -s, axis) * inv_a
        u_new = -u * shift(u, s, axis) * inv_a
        levels.append((l, u, inv_a))
        l, u = l_new, u_new
        s *= 2
    return levels


def pcr_apply(levels, d, axis=-1, k=None):
    s = 1
    for l_k, u_k, inv_a in (levels if k is None else levels[:k]):
        d = (d - l_k * shift(d, -s, axis) - u_k * shift(d, s, axis)) * inv_a
        s *= 2
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--levels", default="4,5,6,7,8,9,10,11")
    args = ap.parse_args()

    Ah, bh, shape, free, mesh = build_scaled_operator()
    nz, nr = shape
    print(f"# operator {shape}", file=sys.stderr)

    # r-line couplings of the scaled lattice operator (unit free diagonal):
    # the +-1 in-line couplings, zeroed across line ends
    n = nz * nr
    c = Ah.tocoo()
    up = np.zeros(n); lo = np.zeros(n)
    sel = c.col == c.row + 1
    up[c.row[sel]] = c.data[sel]
    sel = c.col == c.row - 1
    lo[c.row[sel]] = c.data[sel]
    up2 = up.reshape(nz, nr); lo2 = lo.reshape(nz, nr)
    up2[:, -1] = 0.0; lo2[:, 0] = 0.0
    levels = pcr_factor(lo2, up2, axis=-1)
    K = len(levels)
    fm = free.reshape(nz, nr)

    def make_pre(k):
        def pre(r):
            return (pcr_apply(levels, r.reshape(nz, nr), -1, k) * fm).ravel()
        return pre

    # asymmetry probe: |<Pr1, r2> - <r1, Pr2>| / |<Pr1, r2>|
    rng = np.random.default_rng(0)
    r1 = rng.normal(size=n) * free
    r2 = rng.normal(size=n) * free

    base = None
    for k in [int(s) for s in args.levels.split(",") if int(s) <= K]:
        pre = make_pre(k)
        a = pre(r1) @ r2
        asym = abs(a - r1 @ pre(r2)) / abs(a)
        x, it = pcg(Ah, bh, pre, args.rtol)
        res = np.linalg.norm(bh - Ah @ x) / np.linalg.norm(bh)
        if k == K:
            base = it
        # cost model from the measured VMEM numbers (BENCHMARKS.md):
        # 6.9 us/iter plain CG + 0.72 us per PCR level
        cost = (6.9 + 0.72 * k) * it
        print(f"k={k:2d}/{K} PCG @ {args.rtol:g}: {it:4d} iters  "
              f"(final rel-res {res:.1e}, asym {asym:.1e}, "
              f"model cost {cost/1000:.2f} ms/solve)")
    if base is not None:
        print(f"# full-depth baseline: {base} iters, model "
              f"{(6.9 + 0.72 * K) * base / 1000:.2f} ms/solve")


if __name__ == "__main__":
    main()
