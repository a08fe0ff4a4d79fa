"""Pendulum swing-up: iLQR + SQP MPC with torque limits.

Restores the reference's broken example (ref: examples/pendulum.py — it
calls PendulumPlant and runMPCExample which the snapshot dropped) with the
same configuration: N=20, dt=0.1, goal [pi, 0], torque limit +-7 as hard
active-set (SQP) / soft AL (both).
"""

import numpy as np

import jax
import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    ConstraintSet,
    PendulumPlant,
    QuadraticCost,
    SQPOptions,
)
from example_helpers import runMPCExample, runSQPExample

N, dt = 20, 0.1
plant = PendulumPlant()
Q = jnp.diag(jnp.array([1.0, 1.0]))
QF = jnp.diag(jnp.array([100.0, 100.0]))
R = 0.1 * jnp.eye(1)
xg = jnp.array([np.pi, 0.0])
cost = QuadraticCost(Q, QF, R, xg)

# soft AL torque limits (ref: examples/pendulum.py:22-25)
soft = ConstraintSet(1, 1, 1, N).with_torque_limits(
    [7.0], [-7.0], "AUGMENTED_LAGRANGIAN")
# hard active-set limits with the chatter-damping knobs (see
# solvers/constraints.py BoxLimitSpec.activation_band and
# SQPOptions.hard_violation_exit_tol): reference-parity defaults can exit
# 'converged' mid-oscillation with the bound still violated
hard = ConstraintSet(1, 1, 1, N).with_torque_limits(
    [7.0], [-7.0], "ACTIVE_SET", activation_band=0.2)
hard_opts = SQPOptions(expected_reduction_min=-100.0, max_iter=40,
                       hard_violation_exit_tol=1e-3)

if __name__ == "__main__":
    print("== single solves, soft AL torque limits ==")
    runSQPExample(plant, cost, soft, N, dt, ["N", "S", "PCG-SS"])
    print("== single solves, hard ACTIVE_SET torque limits ==")
    runSQPExample(plant, cost, hard, N, dt, ["S", "PCG-SS"],
                  options=hard_opts)
    print("== closed-loop MPC (40 steps) ==")
    runMPCExample(plant, cost, soft, N, dt, ["iLQR", "QP-S"], steps=40)
