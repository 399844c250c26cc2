#!/usr/bin/env python
"""Decision probe: can Ritz-vector deflation cut the official point's
inner-CG iteration bill?

Two measurements on the flagship (geballe_with_diamond) operator:

1. ``--mode iters`` (TPU): the per-step inner-iteration distribution at the
   official bench point (rline + extrapolate + refine1 @ inner 1e-4).
   If a few cold early steps carry the bill, asymptotic-rate fixes
   (deflation) won't move the mean; if the bill is flat, they can.

2. ``--mode spectrum`` (CPU f64): PCG-Lanczos Ritz values of the
   rline-preconditioned scaled operator M^{-1}(sAs) restricted to free
   rows. The standard CG<->Lanczos identity builds the tridiagonal T from
   the PCG alphas/betas; eig(T) approximates the preconditioned spectrum
   (ghost duplicates possible without reorthogonalization — read the low
   tail as "modes at/below this value exist", not exact multiplicity).
   Reports the deflated condition number k(lam_max/lam_{k+1}) and the
   sqrt-kappa CG-bound iteration ratio for k in {4, 8, 16, 32, 64}: the
   upper bound on what PERFECT deflation of k modes buys.

Run:  python benchmarks/expt_deflation_probe.py --mode spectrum --iters 600

MEASURED (flagship, CPU f64; full log values in BENCHMARKS.md item (4)):
  spectrum: lam in [2.54e-4, 2.0], kappa 7.9e3; PERFECT-deflation bounds
    /1.6 (k=4) /2.3 (k=8) /4.0 (k=16) /7.7 (k=32) — but the low tail is
    a quasi-continuum (600 distinct Ritz values, gap ratios -> 1).
  deflate (m=400 CGS2-reorthogonalized Lanczos, M-inner): NO cut —
    0.91-1.00x at k in {8,16}; basis unconverged by construction.
  refine (2 subspace-iteration rounds through the production rline-PCG,
    ~28k CG its): Ritz rel-residuals only reach min 2.0e-2 / med 0.17;
    deflation still 0.88-1.00x at k in {8,16,24}.
  Verdict: TRUE NEGATIVE — converging any useful basis costs orders of
  magnitude more CG work than a whole transient's iteration bill, and
  unconverged bases inject error (slightly negative). Closed.
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def flagship():
    sys.path.insert(0, ROOT)
    import bench
    return bench.build_flagship()


def mode_iters():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from heatflow_tpu.sim.stepper import make_simulate_fn
    problem = flagship()
    fn = make_simulate_fn(problem, dtype=jnp.float32, rtol=1e-4,
                          maxiter=8000, record_gradient=False,
                          rtol_wrt="r0", solver="auto",
                          precondition="rline", warm_start="extrapolate",
                          f64_refine=1)
    ys = fn()
    it = np.asarray(ys["cg_iters"])
    print("per-step inner iters (official point):")
    print(np.array2string(it, max_line_width=78))
    print(f"mean {it.mean():.1f}  median {np.median(it):.0f}  "
          f"p90 {np.percentile(it, 90):.0f}  max {it.max()}")
    print(f"first 5 steps carry {it[:5].sum() / it.sum():.1%} of the bill; "
          f"steps above 2x median carry "
          f"{it[it > 2 * np.median(it)].sum() / it.sum():.1%}")


def mode_spectrum(n_lanczos):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from heatflow_tpu.ops.linesolve import line_preconditioner
    from heatflow_tpu.ops.stencil import apply_stencil, combine_operator

    problem = flagship()
    dev = problem.device_arrays(jnp.float64)
    dt = jnp.asarray(problem.dt, jnp.float64)
    A, _ = combine_operator(dev["K"], dev["M"], dev["kappas"],
                            dev["rho_cvs"], dt)
    free = dev["free"]
    dirich = dev["dirichlet"]
    diag_a = A[..., 0, :, :]
    s = jax.lax.rsqrt(jnp.where(diag_a > 0, diag_a, 1.0)) * free + dirich
    apply_A_s = lambda y: s * apply_stencil(A, s * y)
    pre = line_preconditioner(A, s, free, axis=-1)

    nz, nr = problem.mesh.shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((nz, nr))) * free

    # PCG on the free-masked scaled system, collecting alpha_k and beta_k.
    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = apply_A_s(p) * free
        pAp = jnp.vdot(p, Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = pre(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new), (alpha, beta, jnp.sqrt(
            jnp.vdot(r, r).real))

    r0 = b
    z0 = pre(r0)
    init = (jnp.zeros_like(b), r0, z0, z0, jnp.vdot(r0, z0))
    t0 = time.time()
    _, (alphas, betas, rnorms) = jax.lax.scan(body, init, None,
                                              length=n_lanczos)
    alphas = np.asarray(alphas)
    betas = np.asarray(betas)
    print(f"{n_lanczos} PCG-Lanczos iterations in {time.time() - t0:.1f} s; "
          f"residual drop {rnorms[-1] / rnorms[0]:.2e}")

    # Lanczos tridiagonal from CG coefficients (Saad, Iterative Methods,
    # eq. 6.106): T[0,0]=1/a0; T[k,k]=1/a_k + b_{k-1}/a_{k-1};
    # offdiag[k] = sqrt(b_k)/a_k.
    k = n_lanczos
    diag = np.empty(k)
    diag[0] = 1.0 / alphas[0]
    diag[1:] = 1.0 / alphas[1:] + betas[:-1] / alphas[:-1]
    off = np.sqrt(betas[:-1]) / alphas[:-1]
    ritz = np.linalg.eigvalsh(np.diag(diag) + np.diag(off, 1)
                              + np.diag(off, -1))
    lam_max = ritz[-1]
    # dedupe ghost copies: cluster Ritz values closer than 1e-6 relative
    uniq = [ritz[0]]
    for v in ritz[1:]:
        if v - uniq[-1] > 1e-6 * lam_max:
            uniq.append(v)
    uniq = np.asarray(uniq)
    print(f"lam_min {uniq[0]:.4e}  lam_max {lam_max:.4e}  "
          f"kappa {lam_max / uniq[0]:.3e}; {len(uniq)} distinct Ritz values")
    print("low tail:", np.array2string(uniq[:24], precision=3,
                                       max_line_width=78))
    base = np.sqrt(lam_max / uniq[0])
    print("\nperfect-deflation upper bounds (CG sqrt-kappa ratio):")
    for kd in (4, 8, 16, 32, 64):
        if kd < len(uniq):
            red = base / np.sqrt(lam_max / uniq[kd])
            print(f"  deflate {kd:3d} lowest modes: kappa -> "
                  f"{lam_max / uniq[kd]:.3e}, iteration bound / {red:.2f}")


def _flagship_ops(jnp, jax):
    """Scaled flagship operator pieces shared by the CPU-f64 modes."""
    from heatflow_tpu.ops.linesolve import line_couplings, line_preconditioner
    from heatflow_tpu.ops.stencil import apply_stencil, combine_operator

    problem = flagship()
    dev = problem.device_arrays(jnp.float64)
    dt = jnp.asarray(problem.dt, jnp.float64)
    A, M_op = combine_operator(dev["K"], dev["M"], dev["kappas"],
                               dev["rho_cvs"], dt)
    free = dev["free"]
    dirich = dev["dirichlet"]
    diag_a = A[..., 0, :, :]
    s = jax.lax.rsqrt(jnp.where(diag_a > 0, diag_a, 1.0)) * free + dirich
    apply_A_s = jax.jit(lambda y: s * apply_stencil(A, s * y) * free)
    pre = line_preconditioner(A, s, free, axis=-1)
    l, u = line_couplings(A, s * free, axis=-1)

    def shift(v, d):
        cfg = [(0, 0, 0)] * v.ndim
        cfg[-1] = (-d, d, 0)
        return jax.lax.pad(v, jnp.zeros((), v.dtype), cfg)

    # M = I + L + U on free rows (the line-tridiagonal part of sAs);
    # convention: (M y)_i = y_i + l_i y_{i-1} + u_i y_{i+1} (pcr docstring)
    apply_M = jax.jit(lambda y: (y + l * shift(y, -1) + u * shift(y, 1))
                      * free)
    return problem, apply_A_s, jax.jit(pre), apply_M, free, s


def lanczos_basis(jnp, jax, apply_A_s, pre, apply_M, free, m, k, seed=0):
    """m-step Lanczos in the M-inner product for the pencil
    A_s y = lam M y (equivalently eigenmodes of the preconditioned
    operator M^{-1}A_s), with FULL reorthogonalization (CGS2); returns the
    k lowest Ritz pairs (lam (k,), W (k, nz, nr) M-orthonormal).

    Basis storage and the reorthogonalization gemvs run in numpy (BLAS);
    the operator/preconditioner applies run through the jitted jnp fns."""
    nz, nr = free.shape
    n = nz * nr
    rng = np.random.default_rng(seed)
    v = np.array(pre(jnp.asarray(rng.standard_normal((nz, nr)))
                     * free)).ravel()
    Mv = np.asarray(apply_M(jnp.asarray(v.reshape(nz, nr)))).ravel()
    v /= np.sqrt(v @ Mv)
    V = np.zeros((m, n))
    MV = np.zeros((m, n))
    V[0] = v
    MV[0] = np.asarray(apply_M(jnp.asarray(v.reshape(nz, nr)))).ravel()
    alphas, betas = [], []
    for j in range(m):
        Av = np.asarray(apply_A_s(jnp.asarray(V[j].reshape(nz, nr))))
        alpha = float(Av.ravel() @ V[j])
        w = np.array(pre(jnp.asarray(Av))).ravel()
        # CGS2 reorthogonalization against all prior vectors (M-inner)
        for _ in range(2):
            coef = MV[:j + 1] @ w
            w -= coef @ V[:j + 1]
        Mw = np.asarray(apply_M(jnp.asarray(w.reshape(nz, nr)))).ravel()
        beta = float(np.sqrt(max(w @ Mw, 0.0)))
        alphas.append(alpha)
        betas.append(beta)
        if beta < 1e-14 or j == m - 1:
            break
        V[j + 1] = w / beta
        MV[j + 1] = Mw / beta
    mm = len(alphas)
    T = (np.diag(alphas) + np.diag(betas[:mm - 1], 1)
         + np.diag(betas[:mm - 1], -1))
    lam, Y = np.linalg.eigh(T)
    W = (Y[:, :k].T @ V[:mm]).reshape(k, nz, nr)
    return lam[:k], jnp.asarray(W)


def mode_deflate(m_lanczos, rtol_list=(1e-4, 1e-5)):
    """Measured PCG iteration counts with/without a Galerkin deflation
    seed built from Lanczos Ritz vectors of the preconditioned pencil."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from heatflow_tpu.ops.cg import pcg

    problem, apply_A_s, pre, apply_M, free, s = _flagship_ops(jnp, jax)
    nz, nr = free.shape
    t0 = time.time()
    lam, W = lanczos_basis(jnp, jax, apply_A_s, pre, apply_M, free,
                           m_lanczos, 64)
    print(f"Lanczos {m_lanczos} its in {time.time() - t0:.0f} s; "
          f"lowest Ritz values {np.asarray(lam[:8])}")

    # representative rhs set: the cold first-step rhs (b - A u_ic scaled),
    # and a mid-transient-like random rhs
    dev = problem.device_arrays(jnp.float64)
    ic = jnp.asarray(problem.ic_temp, jnp.float64)
    rng = np.random.default_rng(1)
    rhs_set = {
        "random": jnp.asarray(rng.standard_normal((nz, nr))) * free,
        "smooth": pre(pre(jnp.asarray(
            rng.standard_normal((nz, nr))) * free)),
    }

    for k in (8, 16, 32, 64):
        Wk = W[:k]
        AW = jnp.stack([apply_A_s(Wk[i]) for i in range(k)])
        E = jnp.einsum("inr,jnr->ij", Wk, AW)
        Einv = jnp.linalg.inv(E)

        def correct(b):
            c = Einv @ jnp.einsum("inr,nr->i", Wk, b)
            return jnp.einsum("i,inr->nr", c, Wk)

        for name, b in rhs_set.items():
            row = [f"k={k:2d} rhs={name:6s}"]
            for rt in rtol_list:
                base = pcg(apply_A_s, b, jnp.zeros_like(b), precond=pre,
                           mask=free, rtol=rt, maxiter=20000, rtol_wrt="b")
                y0 = correct(b)
                defl = pcg(apply_A_s, b, y0, precond=pre, mask=free,
                           rtol=rt, maxiter=20000, rtol_wrt="b")
                row.append(f"rtol {rt:g}: {int(base.iters)} -> "
                           f"{int(defl.iters)} "
                           f"(/{int(base.iters) / max(int(defl.iters), 1):.2f})")
            print("  ".join(row))


def mode_refine(m_lanczos, k=24, rounds=2):
    """Subspace-iteration refinement of the Lanczos basis (solve
    A_s X = M W per column with the production PCG, Rayleigh-Ritz on the
    pencil each round), with Ritz-residual quality tracking, then the
    deflation measurement re-run with the refined basis. Decides whether
    the mode_deflate null result is basis quality or a true negative."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from heatflow_tpu.ops.cg import pcg

    problem, apply_A_s, pre, apply_M, free, s = _flagship_ops(jnp, jax)
    nz, nr = free.shape
    n = nz * nr
    t0 = time.time()
    lam, W = lanczos_basis(jnp, jax, apply_A_s, pre, apply_M, free,
                           m_lanczos, k)
    print(f"Lanczos {m_lanczos} its in {time.time() - t0:.0f} s")

    def ritz_quality(Wk):
        AW = np.stack([np.asarray(apply_A_s(Wk[i])) for i in range(k)])
        MW = np.stack([np.asarray(apply_M(Wk[i])) for i in range(k)])
        lam_r = np.einsum("inr,inr->i", np.asarray(Wk), AW)
        res = np.sqrt(np.einsum(
            "inr,inr->i",
            AW - lam_r[:, None, None] * MW,
            AW - lam_r[:, None, None] * MW))
        scale = np.sqrt(np.einsum("inr,inr->i", MW, MW))
        return lam_r, res / (lam_r * scale)

    lam_r, rq = ritz_quality(W)
    print(f"round 0 Ritz rel-residuals: min {rq.min():.2e} "
          f"med {np.median(rq):.2e} max {rq.max():.2e}")

    for r in range(rounds):
        t0 = time.time()
        X = []
        its_total = 0
        for i in range(k):
            b = apply_M(W[i])
            sol = pcg(apply_A_s, b, jnp.zeros_like(b), precond=pre,
                      mask=free, rtol=1e-6, maxiter=4000, rtol_wrt="b")
            X.append(np.array(sol.x).ravel())
            its_total += int(sol.iters)
        # M-orthonormalize (CGS2) then Rayleigh-Ritz on the pencil
        Q = np.zeros((k, n))
        MQ = np.zeros((k, n))
        nq = 0
        for i in range(k):
            w = X[i]
            for _ in range(2):
                if nq:
                    w = w - (MQ[:nq] @ w) @ Q[:nq]
            Mw = np.asarray(apply_M(jnp.asarray(
                w.reshape(nz, nr)))).ravel()
            nrm = np.sqrt(max(w @ Mw, 0.0))
            if nrm < 1e-12:
                continue
            Q[nq] = w / nrm
            MQ[nq] = Mw / nrm
            nq += 1
        AQ = np.stack([np.asarray(apply_A_s(jnp.asarray(
            Q[i].reshape(nz, nr)))).ravel() for i in range(nq)])
        T = Q[:nq] @ AQ.T
        T = 0.5 * (T + T.T)
        lam_r, Y = np.linalg.eigh(T)
        W = jnp.asarray((Y.T @ Q[:nq]).reshape(nq, nz, nr))
        k = nq
        lam_r, rq = ritz_quality(W)
        print(f"round {r + 1}: {its_total} CG its in {time.time() - t0:.0f}"
              f" s; lam [{lam_r[0]:.3e} .. {lam_r[-1]:.3e}]; Ritz "
              f"rel-res min {rq.min():.2e} med {np.median(rq):.2e} "
              f"max {rq.max():.2e}")

    # deflation measurement with the refined basis
    rng = np.random.default_rng(1)
    rhs_set = {
        "random": jnp.asarray(rng.standard_normal((nz, nr))) * free,
        "smooth": pre(pre(jnp.asarray(
            rng.standard_normal((nz, nr))) * free)),
    }
    for kd in (8, 16, k):
        Wk = W[:kd]
        AW = jnp.stack([apply_A_s(Wk[i]) for i in range(kd)])
        E = jnp.einsum("inr,jnr->ij", Wk, AW)
        Einv = jnp.linalg.inv(E)

        def correct(b, Wk=Wk, Einv=Einv):
            c = Einv @ jnp.einsum("inr,nr->i", Wk, b)
            return jnp.einsum("i,inr->nr", c, Wk)

        for name, b in rhs_set.items():
            row = [f"k={kd:2d} rhs={name:6s}"]
            for rt in (1e-4, 1e-5):
                base = pcg(apply_A_s, b, jnp.zeros_like(b), precond=pre,
                           mask=free, rtol=rt, maxiter=20000, rtol_wrt="b")
                defl = pcg(apply_A_s, b, correct(b), precond=pre,
                           mask=free, rtol=rt, maxiter=20000, rtol_wrt="b")
                row.append(f"rtol {rt:g}: {int(base.iters)} -> "
                           f"{int(defl.iters)} (/"
                           f"{int(base.iters) / max(int(defl.iters), 1):.2f})")
            print("  ".join(row))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["iters", "spectrum", "deflate",
                                       "refine"],
                    required=True)
    ap.add_argument("--iters", type=int, default=600,
                    help="Lanczos length for --mode spectrum/deflate")
    args = ap.parse_args()
    if args.mode == "iters":
        mode_iters()
    elif args.mode == "spectrum":
        mode_spectrum(args.iters)
    elif args.mode == "refine":
        mode_refine(args.iters)
    else:
        mode_deflate(args.iters)
