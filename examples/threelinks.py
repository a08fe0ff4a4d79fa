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
    # merit_mu=100: the reference's fixed mu=10 under-weights feasibility at
    # this cost scale and the solver stalls at viol ~ 2.7 (see sqp.py
    # SQPOptions.merit_mu notes); 100 converges to viol ~ 0.3
    runSQPExample(plant, cost, None, N, dt, ["S", "PCG-SS"],
                  options=SQPOptions(expected_reduction_min=-100.0,
                                     merit_mu=100.0))
