"""Micro-timing of the line-search evaluate() components at the bench
batch size, same slope methodology as phase_timing.py.

The line search is the dominant phase of a warm MPC iterate (15.6 of
22.2 ms at B=512 after the split-Schur work) — each ladder trial
evaluates three trajectory-wide quantities at the candidate:
  * total_cost_diff      (EE kinematics per knot)
  * total_violation      (dynamics rollout: RNEA + Minv per knot)
  * directional_derivative (cost gradient per knot: J + jacobian_tot_state)

Run:  python analysis/ls_breakdown.py            (TPU under axon)
      JAX_PLATFORMS=cpu python analysis/ls_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)
    jax.config.update("jax_default_matmul_precision", "highest")

    from __graft_entry__ import _flagship

    B = int(os.environ.get("PHASE_BATCH", "512"))
    N = 64
    plant, cost, solver = _flagship(N=N)
    nx, nu, bs = plant.nx, plant.nu, solver.kkt.bs
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    X = jnp.asarray(0.1 * rng.standard_normal((B, nx, N)), dtype)
    U = jnp.asarray(0.1 * rng.standard_normal((B, nu, N - 1)), dtype)
    Xc = X + jnp.asarray(0.01 * rng.standard_normal(X.shape), dtype)
    Uc = U + jnp.asarray(0.01 * rng.standard_normal(U.shape), dtype)
    dxu = jnp.asarray(0.01 * rng.standard_normal((B, N, nx + nu)), dtype)
    xs = X[:, :, 0]
    cp = jax.vmap(lambda g: cost.default_params._replace(xg=g))(
        jnp.asarray(np.concatenate(
            [np.array([3.0, 2.0, 0.0]) + 0.1 * rng.standard_normal((B, 3)),
             np.zeros((B, 3))], axis=1), dtype))
    cstate = jax.vmap(lambda _: solver.cset.init_state(dtype=dtype))(
        jnp.arange(B))
    J0 = jax.vmap(lambda x, u, p, cs: solver.total_cost(x, u, p, cs))(
        X, U, cp, cstate)
    c0 = jax.vmap(lambda x, u, x0: solver.total_violation(x, u, x0))(X, U, xs)
    mu = jax.vmap(solver.merit_weight)(J0, c0)
    merit0 = J0 + mu * c0

    eps = jnp.asarray(1e-12, dtype)

    def ph_cost_diff(t):
        d = jax.vmap(lambda x, u, xc, uc, p, cs:
                     solver.total_cost_diff(x, u, xc, uc, p, cs))(
            X + t * eps, U, Xc, Uc, cp, cstate)
        return jnp.sum(d)

    def ph_violation(t):
        c = jax.vmap(lambda x, u, x0: solver.total_violation(x, u, x0))(
            Xc + t * eps, Uc, xs)
        return jnp.sum(c)

    def ph_dirderiv(t):
        D = jax.vmap(lambda xc, uc, d, p, cs:
                     solver.directional_derivative(xc, uc, d, p, cs))(
            Xc + t * eps, Uc, dxu, cp, cstate)
        return jnp.sum(D)

    def ph_line_search(t):
        ls = jax.vmap(lambda x, u, d, J, c, m, x0, p, cs, w:
                      solver.line_search(x, u, d, J, c, m, x0, p, cs, mu=w))(
            X + t * eps, U, dxu, J0, c0, merit0, xs, cp, cstate, mu)
        return jnp.sum(ls.alpha)

    phases = {
        "total_cost_diff (1 trial)": ph_cost_diff,
        "total_violation rollout (1 trial)": ph_violation,
        "directional_derivative (1 trial)": ph_dirderiv,
        "full line_search (while_loop)": ph_line_search,
    }

    def timed(fn, reps):
        def outer(_):
            def body(i, t):
                return t + fn(t) * jnp.asarray(1e-30, dtype) + 1.0
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))
        f = jax.jit(outer)
        float(f(0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(0))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = 2, 10
    for name, fn in phases.items():
        t1 = timed(fn, r1)
        t2 = timed(fn, r2)
        per_call_ms = (t2 - t1) / (r2 - r1) * 1e3
        print(f"{name}: {per_call_ms:.2f} ms  (B={B})", flush=True)


if __name__ == "__main__":
    main()
