"""Measured per-phase wall time of the flagship solve on the live backend.

The op-accounting study (op_accounting.py) bounds each phase with the XLA
cost model; this script MEASURES them, batched at the bench batch size, to
show where a real MPC step's time goes.  Methodology: each phase runs
inside a lax.fori_loop whose scalar carry perturbs the inputs (forcing
serial execution, like a warm MPC step's data dependence), timed at two
rep counts; the slope cancels dispatch overhead (the axon remote
round-trip is ~30 ms and block_until_ready does not wait — only a host
transfer does, hence the float() syncs).

Run:  python analysis/phase_timing.py          (TPU under axon)
      JAX_PLATFORMS=cpu python analysis/phase_timing.py
"""

import json
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
    backend = jax.default_backend()

    from __graft_entry__ import _flagship

    B = int(os.environ.get("PHASE_BATCH", "512"))
    N = 64
    plant, cost, solver = _flagship(N=N)
    nx, nu, bs = plant.nx, plant.nu, solver.kkt.bs
    dtype = jnp.float32
    o = solver.options

    rng = np.random.default_rng(0)
    X = jnp.asarray(0.1 * rng.standard_normal((B, nx, N)), dtype)
    U = jnp.asarray(0.1 * rng.standard_normal((B, nu, N - 1)), dtype)
    xs = X[:, :, 0]
    cp = jax.vmap(lambda g: cost.default_params._replace(xg=g))(
        jnp.asarray(np.concatenate(
            [np.array([3.0, 2.0, 0.0]) + 0.1 * rng.standard_normal((B, 3)),
             np.zeros((B, 3))], axis=1), dtype))
    cstate = jax.vmap(lambda _: solver.cset.init_state(dtype=dtype))(
        jnp.arange(B))
    rho = jnp.full((B,), 1e-3, dtype)
    guess = jnp.zeros((B, N, bs), dtype)

    # reference state for the line search / iterate phases
    J0 = jax.vmap(lambda x, u, p, cs: solver.total_cost(x, u, p, cs))(
        X, U, cp, cstate)
    c0 = jax.vmap(lambda x, u, x0: solver.total_violation(x, u, x0))(X, U, xs)
    mu = jax.vmap(solver.merit_weight)(J0, c0)
    merit0 = J0 + mu * c0
    blocks0 = jax.vmap(
        lambda x, u, x0, p, cs: solver.kkt.form_blocks(x, u, x0, p, cs))(
        X, U, xs, cp, cstate)
    dxu0, _, _, _ = jax.vmap(
        lambda x, u, x0, p, cs, r, g: solver.solve_qp(x, u, x0, p, cs, r, g))(
        X, U, xs, cp, cstate, rho, guess)

    eps = jnp.asarray(1e-12, dtype)

    def phase_form_blocks(t):
        b = jax.vmap(lambda x, u, x0, p, cs: solver.kkt.form_blocks(
            x, u, x0, p, cs))(X + t * eps, U, xs, cp, cstate)
        return jnp.sum(b.g[:, 0, 0])

    def phase_schur_pcg(t):
        perturbed = blocks0._replace(g=blocks0.g + t * eps)
        dxu, lam, stats = jax.vmap(
            lambda b, r, g: solver.kkt.solve_schur(
                b, r, use_pcg=True, pcg_tol=o.exit_tolerance_linSys,
                pcg_max_iter=o.max_iter_linSys, precond="SS", guess=g,
                pcg_relative=o.pcg_relative))(perturbed, rho, guess)
        return jnp.sum(dxu[:, 0, 0])

    def phase_schur_exact(t):
        perturbed = blocks0._replace(g=blocks0.g + t * eps)
        dxu, lam, stats = jax.vmap(
            lambda b, r: solver.kkt.solve_schur(b, r, use_pcg=False))(
            perturbed, rho)
        return jnp.sum(dxu[:, 0, 0])

    def phase_line_search(t):
        ls = jax.vmap(lambda x, u, d, J, c, m, x0, p, cs, w:
                      solver.line_search(x, u, d, J, c, m, x0, p, cs, mu=w))(
            X + t * eps, U, dxu0, J0, c0, merit0, xs, cp, cstate, mu)
        return jnp.sum(ls.alpha)

    def _ladder(dtype):
        ladder = [1.0]
        while ladder[-1] > o.alpha_min:
            ladder.append(ladder[-1] * o.alpha_factor)
        return jnp.asarray(ladder, dtype)

    def phase_ls_cost_diff(t):
        """The ladder's cost-diff half: K-rung stage_value_diff sweeps."""
        alphas = _ladder(dtype)
        nx = plant.nx

        def one(x, u, d, p, cs):
            dX = d[:, :nx].T
            dU = d[:-1, nx:].T
            return jnp.sum(jax.vmap(lambda a: solver.total_cost_diff(
                x, u, x - a * dX, u - a * dU, p, cs))(alphas))

        return jnp.sum(jax.vmap(one)(X + t * eps, U, dxu0, cp, cstate))

    def phase_ls_violation(t):
        """The ladder's violation half: K-rung fd defect rollouts."""
        alphas = _ladder(dtype)
        nx = plant.nx

        def one(x, u, d, x0):
            dX = d[:, :nx].T
            dU = d[:-1, nx:].T
            return jnp.sum(jax.vmap(lambda a: solver.total_violation(
                x - a * dX, u - a * dU, x0))(alphas))

        return jnp.sum(jax.vmap(one)(X + t * eps, U, dxu0, xs))

    # split the exact-Schur phase: assembly (blocks -> S, gamma) vs the CR
    # solve on a prebuilt operator — locates the XLA-glue share
    S0, gam0, _, _ = jax.vmap(
        lambda b, r: solver.kkt._schur_blocks_split(b, r))(blocks0, rho)

    def phase_schur_assembly(t):
        perturbed = blocks0._replace(g=blocks0.g + t * eps)
        S, gam, iGxx, iGuu = jax.vmap(
            lambda b, r: solver.kkt._schur_blocks_split(b, r))(perturbed, rho)
        return jnp.sum(gam[:, 0, 0])

    def phase_cr_only(t):
        from trajoptmpcreference_tpu.ops.btridiag import btd_cyclic_reduction
        lam = jax.vmap(btd_cyclic_reduction)(
            S0._replace(diag=S0.diag + t * eps), gam0)
        return jnp.sum(lam[:, 0, 0])

    # lean-RTI iterate: form blocks + QP solve + fixed-step axpy, no
    # line search and no merit metrics — the floor of one SQP iteration
    import dataclasses as _dc
    lean_solver = _dc.replace(
        solver, options=_dc.replace(o, ls_fixed_alpha=1.0, rti_lean=True))

    def phase_iterate_lean(t):
        out = jax.vmap(
            lambda x, u, J, c, m, r, d, g, w, x0, p, cs:
            lean_solver.sqp_iterate(x, u, J, c, m, r, d, g, w, x0, p, cs,
                                    jnp.array(False)))(
            X + t * eps, U, J0, c0, merit0, rho,
            jnp.ones((B,), dtype), guess, mu, xs, cp, cstate)
        return jnp.sum(out[0][:, 0, 0])

    def phase_iterate(t):
        out = jax.vmap(
            lambda x, u, J, c, m, r, d, g, w, x0, p, cs:
            solver.sqp_iterate(x, u, J, c, m, r, d, g, w, x0, p, cs,
                               jnp.array(False)))(
            X + t * eps, U, J0, c0, merit0, rho,
            jnp.ones((B,), dtype), guess, mu, xs, cp, cstate)
        return jnp.sum(out[0][:, 0, 0])

    def phase_solve(t):
        res = jax.vmap(lambda x, u, p, cs: solver.solve(x, u, p, cs))(
            X + t * eps, U, cp, cstate)
        return jnp.sum(res.U[:, 0, 0])

    phases = {
        "kkt form_blocks (dyn grad + cost grad/hess)": phase_form_blocks,
        "schur + PCG-SS solve (warm guess)": phase_schur_pcg,
        f"schur + exact solve ({solver.kkt.exact_schur})": phase_schur_exact,
        "line search": phase_line_search,
        "ls cost-diff half (K rungs)": phase_ls_cost_diff,
        "ls violation half (K rungs, fd rollout)": phase_ls_violation,
        "schur assembly only (blocks -> S, gamma)": phase_schur_assembly,
        "cr solve only (prebuilt S)": phase_cr_only,
        "sqp_iterate lean-RTI (form + QP + axpy)": phase_iterate_lean,
        "sqp_iterate (QP + LS + schedules)": phase_iterate,
        f"full solve ({o.max_iter} iters, cold)": phase_solve,
    }

    only = os.environ.get("PHASE_ONLY", "")
    if only:
        phases = {k: v for k, v in phases.items() if only in k}

    def timed(fn, reps):
        def outer(_):
            def body(i, t):
                # 1e-30 scaling (not *0: XLA could fold that away) keeps
                # the data dependence between reps without drifting inputs
                return t + fn(t) * jnp.asarray(1e-30, dtype) + 1.0
            return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))
        f = jax.jit(outer)
        float(f(0))                       # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(0))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = 2, 10
    rows = []
    for name, fn in phases.items():
        t1 = timed(fn, r1)
        t2 = timed(fn, r2)
        per_call_ms = (t2 - t1) / (r2 - r1) * 1e3
        rows.append((name, per_call_ms))
        print(f"{name}: {per_call_ms:.2f} ms  (B={B})", flush=True)

    if only:
        return            # filtered probe runs don't overwrite the artifact
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"phase_timing_{backend}.md")
    with open(out_path, "w") as f:
        f.write(f"# Flagship phase timing ({backend}, B={B}, N={N}, "
                f"measured slope over {r2 - r1} serialized reps)\n\n")
        f.write("Where one batched MPC step's wall time goes.  Methodology "
                "in analysis/phase_timing.py; dispatch overhead cancels in "
                "the two-rep-count slope.\n\n")
        f.write("| phase | ms per batched call | us per solve |\n|---|---|---|\n")
        for name, ms in rows:
            f.write(f"| {name} | {ms:.2f} | {ms / B * 1e3:.1f} |\n")
        f.write("\nJSON:\n\n```\n")
        for name, ms in rows:
            f.write(json.dumps({"phase": name, "ms_per_call": round(ms, 3),
                                "batch": B}) + "\n")
        f.write("```\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
