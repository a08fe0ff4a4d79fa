"""Flagship closed-loop MPC: 6-DoF arm, horizon 64, warm-started SQP-PCG
(BASELINE.json config 4: 'full MPC loop, horizon 64, warm-started SQP-PCG
at control rate').

Optional flags showcase the round-5 production features:
  --torque-limit L   box-limit |u| <= L via hard ACTIVE_SET rows (the
                     condensed Schur path)
  --watchdog W       closed-loop plan watchdog: coast + cold-reset the
                     warm carry when a solve goes bad (hard actuation
                     envelope)
"""

import argparse
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_mpc,
    serial_arm,
)

N, dt = 64, 0.015
steps = 100

plant = URDFPlant(robot=serial_arm(6))
cost = UrdfCost(
    plant,
    jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 0.1, 0.1, 0.1])),
    100.0 * jnp.eye(6),
    0.01 * jnp.eye(6),
    jnp.asarray([3.0, 2.0, 0.0, 0.0, 0.0, 0.0]),
)
options = SQPOptions(expected_reduction_min=-100.0, exit_tolerance=1e-4,
                     exit_tolerance_linSys=1e-4, max_iter=5,
                     max_iter_linSys=40)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--torque-limit", type=float, default=0.0)
    ap.add_argument("--watchdog", type=float, default=float("inf"))
    args = ap.parse_args()
    cset = None
    if args.torque_limit > 0:
        from trajoptmpcreference_tpu import ConstraintSet
        cset = ConstraintSet(6, 6, 6, N).with_torque_limits(
            args.torque_limit, -args.torque_limit, "ACTIVE_SET",
            activation_band=0.2)
    ctrl = make_mpc(plant, cost, cset, N, dt, method="QP-PCG-SS",
                    options=options)
    if args.watchdog != float("inf"):
        ctrl = dataclasses.replace(ctrl, watchdog_u_max=args.watchdog)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.1 * rng.standard_normal(12))
    fn = jax.jit(lambda x: ctrl.run(x, steps=steps))
    res = fn(x0)
    jax.block_until_ready(res.X_applied)
    t0 = time.perf_counter()
    res = fn(x0)
    jax.block_until_ready(res.X_applied)
    wall = time.perf_counter() - t0
    ee = plant.kinematics.ee_pos_xyz(res.X_applied[:6, -1])[:2]
    print(f"{steps} MPC steps in {wall:.3f}s  ({steps / wall:.1f} Hz control rate)")
    print(f"final EE {np.asarray(ee).round(4)}  goal [3. 2.]  "
          f"err {float(jnp.linalg.norm(ee - jnp.asarray([3.0, 2.0]))):.4f} m")
    if args.torque_limit > 0:
        print(f"max |u| applied {float(jnp.max(jnp.abs(res.U_applied))):.3f} "
              f"(limit {args.torque_limit:g})")
