"""Joint-space quadratic cost on a URDF arm with hard torque limits
(ref: examples/quadratic.py — despite the name it runs a URDF arm)."""

import numpy as np

import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    ConstraintSet,
    QuadraticCost,
    URDFPlant,
    serial_arm,
)
from example_helpers import runSQPExample

N, dt = 10, 0.1
plant = URDFPlant(robot=serial_arm(2))
Q = jnp.diag(jnp.array([1.0, 1.0, 0.1, 0.1]))
QF = jnp.diag(jnp.array([100.0] * 4))
R = 0.1 * jnp.eye(2)
xg = jnp.array([np.pi / 4, -np.pi / 3, 0.0, 0.0])   # joint-space goal
cost = QuadraticCost(Q, QF, R, xg)

constraints = ConstraintSet(2, 2, 2, N).with_torque_limits(
    7.0, -7.0, "ACTIVE_SET")

if __name__ == "__main__":
    runSQPExample(plant, cost, constraints, N, dt, ["N", "S"])
