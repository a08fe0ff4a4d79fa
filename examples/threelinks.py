"""3-link arm variant (ref: examples/threelinks.py)."""

import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import SQPOptions, URDFPlant, UrdfCost, serial_arm
from example_helpers import runSQPExample

N, dt = 10, 0.1
plant = URDFPlant(robot=serial_arm(3))
Q = jnp.diag(jnp.array([1.0] * 3 + [1.0] * 3))
QF = jnp.diag(jnp.array([100.0] * 6))
R = 0.1 * jnp.eye(3)
xg = jnp.array([1.0, 2.0, 0.0, 0.0, 0.0, 0.0])   # [ee xyz, ee vel xyz]
cost = UrdfCost(plant, Q, QF, R, xg)

if __name__ == "__main__":
    runSQPExample(plant, cost, None, N, dt, ["S", "PCG-SS"],
                  options=SQPOptions(expected_reduction_min=-100.0))
