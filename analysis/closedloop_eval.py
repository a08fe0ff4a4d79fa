"""Closed-loop accuracy eval: the flagship 6-DoF N=64 MPC loop run for a
long episode (default 300 control steps) over a fixed scenario set, in a
chosen dtype — the instrument for the f32-vs-f64 accuracy gap
(VERDICT round 1, item 1).

Run twice to compare precisions:
    JAX_PLATFORMS=cpu python analysis/closedloop_eval.py --dtype f32
    JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python analysis/closedloop_eval.py --dtype f64

Semantics bar (ref: TrajoptMPCReference.py:636-666): the closed loop must
actually track the goal, not merely stay finite.  "stable" here = final EE
position error < --stable-below (default 1.0 m; initial distance ~5 m).
Prints one JSON line with per-scenario errors and the summary.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--scenarios", type=int, default=16)
    ap.add_argument("--scenario-offset", type=int, default=0,
                    help="slice [offset:offset+B] of the seed-0 scenario "
                    "stream — split a big set into chunks whose smaller "
                    "compiled graph dodges the r4 TPU compiler crash "
                    "(bench_history_r4.md finding 14)")
    ap.add_argument("--scenario-total", type=int, default=0,
                    help="size of the full scenario stream the chunks "
                    "slice (default offset+scenarios); set it to the big "
                    "set's size on EVERY chunk so the draws match")
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--method", default="S",
                    help="flagship solver: S / PCG-SS / ... / iLQR "
                    "(the reference's peer-method menu, ref: README.md:17)")
    ap.add_argument("--max-iter", type=int, default=5)
    ap.add_argument("--stable-below", type=float, default=1.0)
    ap.add_argument("--matmul-precision", default=None,
                    help="jax default_matmul_precision (e.g. highest)")
    ap.add_argument("--vel-weight", type=float, default=0.1)
    ap.add_argument("--r-weight", type=float, default=0.01)
    ap.add_argument("--qf-weight", type=float, default=100.0)
    ap.add_argument("--integrator", type=int, default=1)
    ap.add_argument("--pcg-iters", type=int, default=40)
    ap.add_argument("--pcg-tol", type=float, default=1e-4)
    ap.add_argument("--torque-limit", type=float, default=0.0,
                    help="> 0: box-limit u in the solver (constrained "
                    "flagship variant; ref: examples/pendulum.py:17-24)")
    ap.add_argument("--torque-mode", default="AUGMENTED_LAGRANGIAN",
                    choices=["AUGMENTED_LAGRANGIAN", "QUADRATIC_PENALTY",
                             "ACTIVE_SET", "FULL_SET", "ACTIVE_SET+AL"])
    ap.add_argument("--torque-band", type=float, default=0.2,
                    help="active-set chatter-damping activation band")
    ap.add_argument("--watchdog", type=float, default=float("inf"),
                    help="MPCController.watchdog_u_max: coast + cold-reset "
                    "the warm carry when a solve returns a plan whose "
                    "first control exceeds this bound (or is non-finite)")
    ap.add_argument("--step-clip", type=float, default=float("inf"),
                    help="trust-region clip on max|dU| in the line-searched "
                    "path (constrained-MPC bound-jump guard)")
    ap.add_argument("--soft-iters", type=int, default=None,
                    help="cap the AL/penalty outer rounds per solve "
                    "(AL-in-MPC budget; None = solver default 10)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable the Pallas fd/task kernels (fault "
                    "scoping on TPU)")
    ap.add_argument("--cold-steps", type=int, default=0,
                    help="> 0: the bench's iteration schedule — a deep "
                    "cold phase (--cold-iters x deep ladder) for the "
                    "first K control steps, then the --max-iter config")
    ap.add_argument("--cold-iters", type=int, default=6)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    if args.scenario_offset > 0 and not args.scenario_total:
        ap.error("--scenario-total is required with --scenario-offset > 0: "
                 "without the full stream size, each chunk draws a "
                 "different-sized stream and the chunked scenarios diverge "
                 "from the unchunked set")

    if args.dtype == "f64":
        os.environ.setdefault("JAX_ENABLE_X64", "1")

    import jax
    import jax.numpy as jnp

    # sitecustomize may have imported jax and latched the axon TPU platform
    # before our env var is honored — pin the live config (see tests/conftest)
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    if args.dtype == "f64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    from __graft_entry__ import _flagship_mpc

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    pk = ({"use_pallas": False, "use_pallas_fd": False,
           "use_pallas_task": False} if args.no_pallas else {})
    plant, cost, ctrl = _flagship_mpc(
        N=args.N, method=args.method, max_iter=args.max_iter, dtype=dtype,
        max_iter_soft=args.soft_iters, ls_step_clip=args.step_clip, **pk,
        vel_weight=args.vel_weight, r_weight=args.r_weight,
        qf_weight=args.qf_weight, integrator_type=args.integrator,
        pcg_iters=args.pcg_iters, pcg_tol=args.pcg_tol,
        torque_limit=args.torque_limit, torque_mode=args.torque_mode,
        torque_band=args.torque_band)
    if args.watchdog != float("inf"):
        import dataclasses as _dc
        ctrl = _dc.replace(ctrl, watchdog_u_max=args.watchdog)
    ctrl_cold = None
    if args.cold_steps > 0:
        _, _, ctrl_cold = _flagship_mpc(
            N=args.N, method=args.method, max_iter=args.cold_iters,
            dtype=dtype, max_iter_soft=args.soft_iters,
            ls_step_clip=args.step_clip, **pk,
            alpha_min=0.005, alpha_factor=0.5,
            vel_weight=args.vel_weight, r_weight=args.r_weight,
            qf_weight=args.qf_weight, integrator_type=args.integrator,
            pcg_iters=args.pcg_iters, pcg_tol=args.pcg_tol,
            torque_limit=args.torque_limit, torque_mode=args.torque_mode,
            torque_band=args.torque_band)
    nx = plant.nx
    B = args.scenarios

    # fixed scenario set (same seed across dtypes => identical scenarios);
    # with an offset, draw the FULL stream then slice, so chunked runs
    # cover exactly the scenarios one big run would
    rng = np.random.default_rng(0)
    Btot = args.scenario_total or (args.scenario_offset + B)
    o = args.scenario_offset
    x0s_np = 0.1 * rng.standard_normal((Btot, nx))
    goals_all = np.concatenate([
        np.array([3.0, 2.0, 0.0]) + 0.3 * rng.standard_normal((Btot, 3)) * [1, 1, 0],
        np.zeros((Btot, 3))], axis=1)
    x0s = jnp.asarray(x0s_np[o:o + B], dtype=dtype)
    goals_np = goals_all[o:o + B]
    goals = jnp.asarray(goals_np, dtype=dtype)
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=g))(goals)

    if ctrl_cold is not None:
        from trajoptmpcreference_tpu.solvers.mpc import run_scheduled
        nc = min(args.cold_steps, args.steps)
        phases = [(ctrl_cold, nc)] + (
            [(ctrl, args.steps - nc)] if args.steps > nc else [])
        fn = jax.jit(jax.vmap(
            lambda x0, cp: run_scheduled(phases, x0, cost_params=cp)))
    else:
        fn = jax.jit(jax.vmap(
            lambda x0, cp: ctrl.run(x0, steps=args.steps, cost_params=cp)))
    t0 = time.perf_counter()
    res = fn(x0s, cps)
    jax.block_until_ready(res.X_applied)
    wall = time.perf_counter() - t0

    q_final = res.X_applied[:, :plant.nq, -1]
    ee = jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2])(q_final)
    err = np.asarray(jnp.linalg.norm(ee - goals[:, :2], axis=1), dtype=np.float64)
    finite = np.isfinite(err)
    stable = finite & (err < args.stable_below)
    med_all = float(np.median(np.where(finite, err, np.inf)))
    med_stable = float(np.median(err[stable])) if stable.any() else float("nan")
    exit_codes = np.asarray(res.exit_codes)  # (B, steps)

    # applied-torque stats: peak per scenario (sizes a meaningful limit
    # for the constrained variant) and, when limited, the max violation of
    # the APPLIED controls — the physical gate, not the solver's own
    # internal feasibility number
    u_abs = np.abs(np.asarray(res.U_applied))           # (B, nu, steps)
    u_peak = u_abs.max(axis=(1, 2))
    viol = (float(np.maximum(u_abs - args.torque_limit, 0.0).max())
            if args.torque_limit > 0 else 0.0)
    # transient/steady split: violations concentrate in the first cold
    # solves before the AL carry / activity masks settle — report the
    # steady-state number separately (steps >= 20)
    viol_steady = (float(np.maximum(
        u_abs[:, :, 20:] - args.torque_limit, 0.0).max())
        if args.torque_limit > 0 and u_abs.shape[2] > 20 else 0.0)
    u_sat_frac = (float((u_abs >= 0.999 * args.torque_limit).mean())
                  if args.torque_limit > 0 else 0.0)

    print(json.dumps({
        "tag": args.tag,
        "dtype": args.dtype,
        "backend": jax.default_backend(),
        "matmul_precision": args.matmul_precision,
        "steps": args.steps,
        "scenarios": B,
        "stable": int(stable.sum()),
        "finite": int(finite.sum()),
        "median_err_all": round(med_all, 4),
        "median_err_stable": round(med_stable, 4),
        "cold_steps": args.cold_steps,
        "torque_limit": args.torque_limit,
        "torque_mode": args.torque_mode if args.torque_limit > 0 else None,
        "u_peak_median": round(float(np.median(u_peak)), 3),
        "u_peak_max": round(float(u_peak.max()), 3),
        "max_violation": round(viol, 5),
        "max_violation_steady": round(viol_steady, 5),
        "u_at_limit_frac": round(u_sat_frac, 4),
        "errors": [round(float(e), 3) for e in err],
        "exit_code_hist": {str(k): int(v) for k, v in
                           zip(*np.unique(exit_codes, return_counts=True))},
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
