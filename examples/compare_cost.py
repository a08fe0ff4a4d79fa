"""Cross-check the three 2-link cost implementations at a point
(ref: examples/compare_cost.py:39-64): UrdfCost (general kinematics),
ArmCost (closed-form 2-link), NumericalCost (finite differences)."""

import numpy as np

import jax.numpy as jnp

import _path  # noqa: F401
from trajoptmpcreference_tpu import (
    ArmCost,
    NumericalCost,
    URDFPlant,
    UrdfCost,
    serial_arm,
)

plant = URDFPlant(robot=serial_arm(2))
Q = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0]))
QF = jnp.diag(jnp.array([100.0] * 4))
R = 0.1 * jnp.eye(2)
xg = jnp.array([0.5, 1.5, 0.0, 0.0])

urdf_cost = UrdfCost(plant, Q, QF, R, xg)
arm_cost = ArmCost(Q, QF, R, xg)
num_cost = NumericalCost(plant, Q, QF, R, xg)

x = jnp.array([0.3, -0.7, 0.2, -0.1])
u = jnp.array([0.5, -0.4])
k = jnp.asarray(3)

if __name__ == "__main__":
    for name, c in [("urdf", urdf_cost), ("arm", arm_cost), ("numerical", num_cost)]:
        p = c.default_params
        v = float(c.stage_value(p, x, u, k))
        g = np.asarray(c.stage_gradient(p, x, u, k))
        print(f"{name:10s} value {v:.8f}  grad {g.round(6)}")
    gu = np.asarray(urdf_cost.stage_gradient(urdf_cost.default_params, x, u, k))
    ga = np.asarray(arm_cost.stage_gradient(arm_cost.default_params, x, u, k))
    gn = np.asarray(num_cost.stage_gradient(num_cost.default_params, x, u, k))
    print("max|urdf-arm|      =", np.abs(gu - ga).max())
    print("max|urdf-numerical|=", np.abs(gu - gn).max())
