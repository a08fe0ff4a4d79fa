"""Goal sweep over the reachable disc — the reference's parameterized grid
driver (ref: examples/test_multiple.py + test_settings.csv) re-imagined:
instead of a multiprocessing.Pool over configs, the whole sweep is ONE
vmapped jit program (and shards over a device mesh with --shard)."""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_sqp,
    serial_arm,
)
from trajoptmpcreference_tpu.parallel import batch_solve, make_mesh, shard_solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=2)
    ap.add_argument("--n-goals", type=int, default=64)
    ap.add_argument("--N", type=int, default=10)
    ap.add_argument("--method", default="PCG-SS")
    ap.add_argument("--shard", action="store_true",
                    help="shard the sweep over all devices")
    ap.add_argument("--out", default=None, help="write results CSV")
    args = ap.parse_args()

    n = args.links
    plant = URDFPlant(robot=serial_arm(n))
    nx, nu = plant.nx, plant.nu
    kdim = min(3, n)
    Q = jnp.eye(kdim + n)
    QF = 100.0 * jnp.eye(kdim + n)
    R = 0.1 * jnp.eye(nu)
    xg0 = jnp.zeros(kdim + n)
    cost = UrdfCost(plant, Q, QF, R, xg0)
    solver = make_sqp(plant, cost, None, args.N, 0.1, method=args.method,
                      options=SQPOptions(expected_reduction_min=-100.0))

    # goals on rings of the reachable disc (radius < n links)
    rng = np.random.default_rng(0)
    radii = 0.2 * n + 0.7 * n * rng.random(args.n_goals)
    angs = 2 * np.pi * rng.random(args.n_goals)
    goals = np.zeros((args.n_goals, kdim + n))
    goals[:, 0] = radii * np.cos(angs)
    goals[:, 1] = radii * np.sin(angs)
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=jnp.asarray(g)))(
        jnp.asarray(goals))

    B = args.n_goals
    x0s = jnp.zeros((B, nx, args.N))
    u0s = jnp.zeros((B, nu, args.N - 1))

    if args.shard:
        ndev = len(jax.devices())
        mesh = make_mesh((ndev,), ("batch",))
        fn = jax.jit(shard_solve(solver, mesh))
    else:
        fn = jax.jit(batch_solve(solver))

    res = fn(x0s, u0s, cps)
    jax.block_until_ready(res.X)
    t0 = time.perf_counter()
    res = fn(x0s, u0s, cps)
    jax.block_until_ready(res.X)
    wall = time.perf_counter() - t0

    kin = plant.kinematics
    ee = jax.vmap(lambda X: kin.ee_pos_xyz(X[:n, -1])[:kdim])(res.X)
    err = np.linalg.norm(np.asarray(ee) - goals[:, :kdim], axis=1)
    ok = np.asarray(res.exit_sqp) == 1
    print(f"{B} goal solves in {wall*1e3:.1f}ms ({B/wall:.1f} solves/s)  "
          f"converged {ok.sum()}/{B}  median EE err {np.median(err):.4f} m")
    if args.out:
        import csv
        with open(args.out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["goal_x", "goal_y", "J", "iters", "exit", "ee_err"])
            for i in range(B):
                w.writerow([goals[i, 0], goals[i, 1], float(res.J[i]),
                            int(res.sqp_iters[i]), int(res.exit_sqp[i]),
                            err[i]])
        print("wrote", args.out)


if __name__ == "__main__":
    main()
