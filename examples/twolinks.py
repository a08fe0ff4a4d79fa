"""2-link arm task-space reach — the reference's main working driver
(ref: examples/twolinks.py): arm2, UrdfCost, N=10, dt=0.1, PCG-SS, optional
torque limits (hard active-set or soft AL)."""

import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    ConstraintSet,
    SQPOptions,
    URDFPlant,
    UrdfCost,
    serial_arm,
)
from example_helpers import runSQPExample

N, dt = 10, 0.1
set_hard_constraints = False
set_soft_constraints = False

plant = URDFPlant(robot=serial_arm(2))
Q = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0]))
QF = jnp.diag(jnp.array([100.0] * 4))
R = 0.1 * jnp.eye(2)
xg = jnp.array([0.5, 1.5, 0.0, 0.0])        # [ee_x, ee_y, ee_vx, ee_vy]
cost = UrdfCost(plant, Q, QF, R, xg)

constraints = None
if set_hard_constraints:
    constraints = ConstraintSet(2, 2, 2, N).with_torque_limits(
        7.0, -7.0, "ACTIVE_SET")
elif set_soft_constraints:
    constraints = ConstraintSet(2, 2, 2, N).with_torque_limits(
        7.0, -7.0, "AUGMENTED_LAGRANGIAN")

# ref: examples/twolinks.py:87 disables the lower reduction-ratio check
options = SQPOptions(expected_reduction_min=-100.0)

if __name__ == "__main__":
    runSQPExample(plant, cost, constraints, N, dt,
                  ["N", "S", "PCG-J", "PCG-BJ", "PCG-SS"], options=options)
