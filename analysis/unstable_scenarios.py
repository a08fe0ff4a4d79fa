"""Characterize the scenarios the flagship bench marks unstable.

Runs the bench-identical B=512 150-step episode at the flagship defaults,
extracts the scenarios with final EE error >= 1 m, and probes each
hypothesis the round-2/3 logs raised:

  * are the failing goals geometrically harder (further / closer to the
    workspace fringe / nearer a fold singularity)?
  * do the same scenarios fail with a bigger solver budget (more SQP
    iterations, deeper ladder) — i.e. is it a solve-tightness problem or
    a problem-instance property?
  * do they fail from step 0 (cold-start transient) or drift later?

Writes analysis/unstable_scenarios.md.

Run on the TPU (the failure set is an f32/TPU artifact):
  python analysis/unstable_scenarios.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def episode_errors(ctrl, plant, cost, x0s, goals_np, steps, ctrl_cold=None,
                   cold_steps=0):
    import jax
    import jax.numpy as jnp
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=g))(
        jnp.asarray(goals_np, jnp.float32))
    if ctrl_cold is not None and steps > cold_steps:
        from trajoptmpcreference_tpu.solvers.mpc import run_scheduled
        phases = [(ctrl_cold, cold_steps), (ctrl, steps - cold_steps)]
        run = jax.jit(jax.vmap(
            lambda x0, cp: run_scheduled(phases, x0, cost_params=cp)))
    else:
        run = jax.jit(jax.vmap(lambda x0, cp: ctrl.run(x0, steps=steps,
                                                       cost_params=cp)))
    res = run(x0s, cps)
    q_traj = res.X_applied[:, :plant.nq, :]          # (B, nq, steps)
    ee = jax.vmap(jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2],
                           in_axes=1, out_axes=1))(q_traj)  # (B, 2, steps)
    err_t = jnp.linalg.norm(
        ee - jnp.asarray(goals_np[:, :2], jnp.float32)[:, :, None], axis=1)
    return np.asarray(err_t, dtype=np.float64)       # (B, steps)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_mpc

    B, N, steps = 512, 64, 150
    plant, cost, ctrl = _flagship_mpc(N=N)
    # the bench default's front-loaded cold phase (r4: 4 steps x 4 iters)
    cold_steps = int(os.environ.get("UNSTABLE_COLD_STEPS", "4"))
    cold_iters = int(os.environ.get("UNSTABLE_COLD_ITERS", "4"))
    ctrl_cold = None
    if cold_steps:
        _, _, ctrl_cold = _flagship_mpc(N=N, max_iter=cold_iters,
                                        alpha_min=0.005,
                                        alpha_factor=0.5)
    nx = plant.nx

    seed = int(os.environ.get("UNSTABLE_SEED", "0"))  # bench.py BENCH_SEED
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx)), jnp.float32)
    goals_np = np.concatenate([
        np.array([3.0, 2.0, 0.0]) + 0.3 * rng.standard_normal((B, 3)) * [1, 1, 0],
        np.zeros((B, 3))], axis=1)

    err_t = episode_errors(ctrl, plant, cost, x0s, goals_np, steps,
                           ctrl_cold=ctrl_cold, cold_steps=cold_steps)
    final = err_t[:, -1]
    bad = ~(np.isfinite(final) & (final < 1.0))
    idx = np.nonzero(bad)[0]
    print(f"unstable: {len(idx)}/{B} -> {idx.tolist()}")

    lines = ["# Flagship unstable-scenario forensics (tpu, B=512, "
             f"{steps}-step episodes, scenario seed {seed}, "
             f"cold {cold_steps}x{cold_iters})\n"]
    lines.append(f"{len(idx)}/{B} scenarios end with EE error >= 1 m "
                 f"(median of the rest: "
                 f"{np.median(final[~bad]):.3f} m).\n")

    # geometry: goal radius (reach limit = 6 m for the 6x1 m arm)
    r_goal = np.linalg.norm(goals_np[:, :2], axis=1)
    lines.append("## Geometry\n")
    lines.append(f"goal radius: failing {np.sort(r_goal[bad]).round(3).tolist()}")
    lines.append(f"vs all: min {r_goal.min():.3f}, median "
                 f"{np.median(r_goal):.3f}, max {r_goal.max():.3f}\n")

    # time profile: first step the error exceeded 1 m for good
    lines.append("## Failure onset (last step with error < 1 m)\n")
    onset = []
    for i in idx:
        below = np.nonzero(err_t[i] < 1.0)[0]
        onset.append(int(below[-1]) if len(below) else -1)
    lines.append(f"{dict(zip(idx.tolist(), onset))}\n")
    lines.append("-1 = never got below 1 m (pure cold-start divergence); "
                 "late values = tracked then lost it.\n")

    # budget probe: same scenarios, 6 SQP iters + 9-rung ladder
    if len(idx):
        _, _, ctrl_big = _flagship_mpc(N=N, max_iter=6, alpha_min=0.005)
        xb = x0s[idx]
        gb = goals_np[idx]
        err_big = episode_errors(ctrl_big, plant, cost, xb, gb, steps)
        fixed = (np.isfinite(err_big[:, -1]) & (err_big[:, -1] < 1.0))
        lines.append("## Solver-budget probe (6 SQP iters, 9-rung ladder)\n")
        lines.append(f"fixed {int(fixed.sum())}/{len(idx)}; final errors "
                     f"{err_big[:, -1].round(3).tolist()}\n")
    else:
        lines.append("## Solver-budget probe\n")
        lines.append("skipped: no unstable scenarios at this config.\n")

    # f64-CPU probe of the same scenarios would need the CPU backend; the
    # closedloop_eval harness covers that cross-check on its fixed 16.
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "unstable_scenarios.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
