"""Config-grid experiment driver — the reference's test_settings.csv grid
(ref: examples/test_multiple.py:31-131, test_settings.csv:1) re-imagined
TPU-first: each grid row (cost type x Hessian mode x integrator x linear
method x horizon x constraint mode) jit-specializes one solver, and the
goal sweep within a row runs as ONE vmapped program instead of a
multiprocessing.Pool of Python processes.

Outputs a CSV (one row per config x goal) and a per-config summary table
(markdown to stdout) — feed the CSV to analysis/plot_sweep.py for the
goal-disc heatmaps (the reference's plot_multiple.py analogue).
"""

import argparse
import csv
import itertools
import time

import numpy as np

import jax
import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    ConstraintSet,
    QuadraticCost,
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_sqp,
    serial_arm,
)

INTEGRATORS = {0: "euler", 1: "semi-implicit", 2: "midpoint", 3: "rk3",
               4: "rk4"}
HESS_NAMES = {0: "approx-GN", 1: "exact", 2: "gradTgrad", 3: "none"}


def build_cost(kind, plant, n, hess_mode):
    """Cost per the reference grid's 'type of Cost' column
    (ref: test_multiple.py:85-103): URDF task-space (4 Hessian modes) or
    Quadratic state-space.  (The reference's 'Symbolic' ArmCost is the
    2-link sympy twin of UrdfCost — solvers.costs.ArmCost — equal to URDF
    hess_mode 0 here, so the grid folds it in.)"""
    nu = plant.nu
    kdim = min(3, n)
    if kind == "URDF":
        Q = jnp.eye(kdim + n)
        QF = 100.0 * jnp.eye(kdim + n)
        R = 0.1 * jnp.eye(nu)
        xg = jnp.zeros(kdim + n)
        return UrdfCost(plant, Q, QF, R, xg, hess_mode=hess_mode), True
    assert kind == "Quadratic"
    nx = plant.nx
    Q = jnp.eye(nx)
    QF = 100.0 * jnp.eye(nx)
    R = 0.1 * jnp.eye(nu)
    return QuadraticCost(Q, QF, R, jnp.zeros(nx)), False


def goal_params(cost, task_space, goals_xy, plant, n):
    """Per-goal cost params: task-space goals go in the EE slot; for the
    quadratic cost the goal is the 2-link IK-free surrogate [x, y] mapped
    onto the first two joint angles (matches the reference's state-space
    rows, which sweep xg directly)."""
    B = goals_xy.shape[0]
    kdim = min(3, n)
    if task_space:
        g = np.zeros((B, kdim + n))
        g[:, :2] = goals_xy
        return jax.vmap(lambda gg: cost.default_params._replace(
            xg=jnp.asarray(gg)))(jnp.asarray(g))
    g = np.zeros((B, plant.nx))
    g[:, :2] = goals_xy
    return jax.vmap(lambda gg: cost.default_params._replace(
        xg=jnp.asarray(gg)))(jnp.asarray(g))


def run_config(cfg, goals_xy, args):
    (kind, hess, integ, method, N, cmode) = cfg
    n = args.links
    plant = URDFPlant(robot=serial_arm(n), integrator_type=integ)
    cost, task_space = build_cost(kind, plant, n, hess)
    cset = None
    if cmode != "none":
        cset = ConstraintSet(plant.nq, plant.nv, plant.nu, N)
        cset = cset.with_torque_limits(
            args.torque_limit, -args.torque_limit, cmode)
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=args.max_iter,
                      exit_tolerance_linSys=1e-8, max_iter_linSys=100)
    solver = make_sqp(plant, cost, cset, N, args.dt, method=method,
                      options=opts)
    cps = goal_params(cost, task_space, goals_xy, plant, n)
    B = goals_xy.shape[0]
    x0s = jnp.zeros((B, plant.nx, N))
    u0s = jnp.zeros((B, plant.nu, N - 1))
    fn = jax.jit(jax.vmap(lambda a, b, c: solver.solve(a, b, cost_params=c)))
    t0 = time.perf_counter()
    res = fn(x0s, u0s, cps)
    jax.block_until_ready(res.X)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = fn(x0s, u0s, cps)
    float(jnp.sum(res.U))                    # host barrier
    t_run = time.perf_counter() - t0

    qf = res.X[:, :plant.nq, -1]
    ee = jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2])(qf)
    if task_space:
        err = np.linalg.norm(np.asarray(ee) - goals_xy, axis=1)
    else:
        err = np.linalg.norm(
            np.asarray(res.X[:, :2, -1]) - goals_xy, axis=1)
    return res, err, t_compile, t_run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=2)
    ap.add_argument("--n-goals", type=int, default=16)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--torque-limit", type=float, default=7.0,
                    help="the reference drivers' +/-7 (ref: pendulum.py:17)")
    ap.add_argument("--costs", nargs="+", default=["URDF", "Quadratic"])
    ap.add_argument("--hess", nargs="+", type=int, default=[0, 2],
                    help="UrdfCost Hessian modes (ref: TrajoptCost.py:391)")
    ap.add_argument("--integrators", nargs="+", type=int, default=[0, 1])
    ap.add_argument("--methods", nargs="+", default=["S", "PCG-SS"])
    ap.add_argument("--N", nargs="+", type=int, default=[10])
    ap.add_argument("--constraints", nargs="+", default=["none"],
                    choices=["none", "AUGMENTED_LAGRANGIAN", "ACTIVE_SET",
                             "QUADRATIC_PENALTY", "FULL_SET"])
    ap.add_argument("--out", default=None, help="per-goal results CSV")
    args = ap.parse_args()

    # goal sweep over the reachable disc (the reference filters a square
    # grid to the circle, ref: test_multiple.py:25-29)
    n = args.links
    side = int(np.ceil(np.sqrt(2 * args.n_goals)))
    xs = np.linspace(-0.9 * n, 0.9 * n, side)
    pts = np.array([[x, y] for x in xs for y in xs
                    if x * x + y * y <= (0.9 * n) ** 2])
    while pts.size == 0:
        # a too-coarse square grid can put every point outside the disc
        # (e.g. --n-goals 2): densify until at least one point lands inside,
        # so the padding loop below can terminate
        side *= 2
        xs = np.linspace(-0.9 * n, 0.9 * n, side)
        pts = np.array([[x, y] for x in xs for y in xs
                        if x * x + y * y <= (0.9 * n) ** 2])
    goals_xy = pts[:args.n_goals]
    # vmap wants a fixed batch; pad by repeating the last goal
    while goals_xy.shape[0] < args.n_goals:
        goals_xy = np.vstack([goals_xy, goals_xy[-1:]])

    grid = []
    for kind in args.costs:
        hmodes = args.hess if kind == "URDF" else [0]
        for hess, integ, method, N, cmode in itertools.product(
                hmodes, args.integrators, args.methods, args.N,
                args.constraints):
            grid.append((kind, hess, integ, method, N, cmode))

    print(f"| cost | hess | integrator | method | N | constraints "
          f"| conv | med err [m] | max err | mean iters | compile [s] "
          f"| run [s] |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    rows = []
    for cfg in grid:
        kind, hess, integ, method, N, cmode = cfg
        res, err, t_c, t_r = run_config(cfg, goals_xy, args)
        exits = np.asarray(res.exit_sqp)
        iters = np.asarray(res.sqp_iters)
        conv = int((exits == 1).sum())
        print(f"| {kind} | {HESS_NAMES[hess] if kind == 'URDF' else '-'} "
              f"| {INTEGRATORS[integ]} | {method} | {N} | {cmode} "
              f"| {conv}/{len(err)} | {np.median(err):.4f} "
              f"| {np.max(err):.3f} | {iters.mean():.1f} | {t_c:.1f} "
              f"| {t_r:.2f} |", flush=True)
        for i in range(len(err)):
            rows.append({
                "cost": kind, "hess": hess, "integrator": integ,
                "method": method, "N": N, "constraints": cmode,
                "goal_x": goals_xy[i, 0], "goal_y": goals_xy[i, 1],
                "ee_err": err[i], "exit": int(exits[i]),
                "iters": int(iters[i])})
    if args.out:
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
