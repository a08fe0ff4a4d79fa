"""Per-phase op accounting for the flagship solve — the analogue of the
reference's accelerator-sizing study (ref: analysis/operation_analysis.ipynb,
which re-counts ndarray ops via an intercepting subclass; here XLA's own
post-fusion cost model reports flops / transcendentals / bytes with zero
runtime overhead, utils/flops.cost_analysis).

Emits a markdown table + one JSON line per phase to
analysis/op_accounting_<backend>.md, with roofline time bounds for a
v5e chip (197 TFLOP/s bf16, 819 GB/s HBM) next to each phase.

Run:  JAX_PLATFORMS=cpu python analysis/op_accounting.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

V5E_FLOPS = 197e12 / 2      # f32 MXU rate ~ half the bf16 peak
V5E_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    from __graft_entry__ import _flagship, _flagship_mpc
    from trajoptmpcreference_tpu.utils.flops import cost_analysis

    B = int(os.environ.get("OPACC_BATCH", "8"))
    N = 64
    plant, cost, solver = _flagship(N=N)
    nx, nu = plant.nx, plant.nu
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    X = jnp.asarray(0.1 * rng.standard_normal((nx, N)), dtype)
    U = jnp.asarray(0.1 * rng.standard_normal((nu, N - 1)), dtype)
    xs = X[:, 0]
    cp = cost.default_params
    rho = jnp.asarray(1e-3, dtype)
    guess = jnp.zeros((N, solver.kkt.bs), dtype)

    ks = jnp.arange(N - 1)
    phases = {}

    # L1: dynamics gradients over the horizon (the GRiD-layer hot op)
    phases["dyn_grad (N-1 knots)"] = lambda: cost_analysis(
        lambda X, U: jax.vmap(
            lambda x, u, k: plant.step_gradient(x, u, solver.dt)
        )(X[:, :-1].T, U.T, ks), X, U)
    # L3: cost gradients + Hessians over the horizon
    phases["cost_grad+hess"] = lambda: cost_analysis(
        lambda X, U: (
            jax.vmap(lambda x, u, k: cost.stage_gradient(cp, x, u, k))(
                X[:, :-1].T, U.T, ks),
            jax.vmap(lambda x, u, k: cost.stage_hessian(cp, x, u, k))(
                X[:, :-1].T, U.T, ks)), X, U)
    # L4: KKT block assembly (dynamics + cost + constraint rows)
    phases["kkt_blocks"] = lambda: cost_analysis(
        lambda X, U: solver.kkt.form_blocks(X, U, xs, cp, ()), X, U)
    # L4: Schur assembly + PCG-SS solve
    blocks = solver.kkt.form_blocks(X, U, xs, cp, ())
    phases["schur+pcg_ss"] = lambda: cost_analysis(
        lambda b, r, g: solver.kkt.solve_schur(
            b, r, use_pcg=True,
            pcg_tol=solver.options.exit_tolerance_linSys,
            pcg_max_iter=solver.options.max_iter_linSys,
            precond="SS", guess=g,
            pcg_relative=solver.options.pcg_relative),
        blocks, rho, guess)
    # L4: line search (merit evaluations)
    dxu = jnp.zeros((N, solver.kkt.n), dtype)
    J0 = solver.total_cost(X, U, cp, ())
    c0 = solver.total_violation(X, U, xs)
    phases["line_search"] = lambda: cost_analysis(
        lambda X, U, dxu: solver.line_search(
            X, U, dxu, J0, c0, J0 + 10.0 * c0, xs, cp, ()), X, U, dxu)
    # full cold SQP solve
    phases["sqp_solve (cold)"] = lambda: cost_analysis(
        lambda x0, u0: solver.solve(x0, u0), X, U)
    # one full warm MPC step, batched as benched
    _, _, ctrl = _flagship_mpc(N=N)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx)), dtype)
    cps = jax.vmap(lambda _: cp)(jnp.arange(B))
    phases[f"mpc_step x{B} (warm, batched)"] = lambda: cost_analysis(
        lambda x0s: jax.vmap(
            lambda x0, c: ctrl.run(x0, steps=1, cost_params=c))(x0s, cps),
        x0s)

    backend = jax.default_backend()
    rows = []
    for name, fn in phases.items():
        try:
            ca = fn()
        except Exception as e:      # keep the study robust to API drift
            rows.append({"phase": name, "error": repr(e)[:120]})
            continue
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        rows.append({
            "phase": name,
            "flops": flops,
            "transcendentals": ca.get("transcendentals", 0.0),
            "bytes_accessed": bytes_,
            "arith_intensity": (flops / bytes_) if bytes_ else float("nan"),
            "t_compute_us": flops / V5E_FLOPS * 1e6,
            "t_memory_us": bytes_ / V5E_BW * 1e6,
            "temp_bytes": ca.get("temp_size_in_bytes", 0),
        })

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"op_accounting_{backend}.md")
    with open(out, "w") as f:
        f.write(f"# Flagship op accounting ({backend} backend, XLA "
                f"post-fusion cost model)\n\n"
                f"6-DoF arm, N={N}, SQP-PCG-SS.  Roofline bounds for one "
                f"v5e chip ({V5E_FLOPS/1e12:.0f} f32 TFLOP/s, "
                f"{V5E_BW/1e9:.0f} GB/s).  A phase is memory-bound when "
                f"t_memory > t_compute (arith intensity < "
                f"{V5E_FLOPS/V5E_BW:.0f} flops/byte).\n\n")
        f.write("| phase | Mflops | transc. | MB accessed | flops/byte | "
                "t_comp (us) | t_mem (us) |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                f.write(f"| {r['phase']} | err: {r['error']} | | | | | |\n")
                continue
            f.write(f"| {r['phase']} | {r['flops']/1e6:.2f} | "
                    f"{r['transcendentals']:.0f} | "
                    f"{r['bytes_accessed']/1e6:.2f} | "
                    f"{r['arith_intensity']:.2f} | "
                    f"{r['t_compute_us']:.1f} | {r['t_memory_us']:.1f} |\n")
        f.write("\nJSON:\n\n```\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"wrote {out}")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
