"""End-effector kinematics: positions, Jacobians, and their q-derivatives.

The reference chains sympy-lambdified homogeneous transforms and hardcodes
2-link shortcuts for dJ/dq and d2J/dq2 (ref: GRiD/RBDReference/
RBDReference.py:123-387, the 2-link-only blocks at :219-315).  Here the chain
is built from closed-form trig transforms and all derivatives come from
``jax.jacfwd`` — exact, robot-general, and fully fused by XLA.

Conventions match the reference:
* the end-effector point is ``offset`` in the leaf joint frame
  (default (0,1,0,1), ref: RBDReference.py:123);
* ``ee_pos`` returns the first two coordinates (planar arms,
  ref: RBDReference.py:134,147);
* ``jacobian`` returns the first min(3,n) rows of d(xyz)/dq
  (ref: RBDReference.py:363 ``jacobian[0][:n,:n]``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trajoptmpcreference_tpu.models.robot import RobotModel
from trajoptmpcreference_tpu.ops.spatial import joint_hom_transform


@dataclasses.dataclass(frozen=True)
class Kinematics:
    robot: RobotModel
    ee_pos_xyz: Callable       # (q,) -> (3,) world xyz of the ee point
    ee_pos: Callable           # (q,) -> (2,) reference-parity planar slice
    jacobian: Callable         # (q,) -> (k, n), k = min(3, n)
    djdq: Callable             # (q,) -> (k, n, n) dJ[i,j]/dq_l tensor
    jacobian_tot_state: Callable  # (q, qd) -> (2k, 2n)


def make_kinematics(robot: RobotModel,
                    offset: Tuple[float, float, float] = (0.0, 1.0, 0.0),
                    leaf: int = 0) -> Kinematics:
    n = robot.n
    leaf_id = robot.leaves[leaf]
    chain = list(robot.ancestors(leaf_id)) + [leaf_id]
    k = min(3, n)
    off = np.array([*offset, 1.0])

    def ee_pos_xyz(q):
        dtype = q.dtype
        H = jnp.eye(4, dtype=dtype)
        for j in chain:
            H = H @ joint_hom_transform(robot, j, q[j])
        return (H @ jnp.asarray(off, dtype=dtype))[:3]

    def ee_pos(q):
        return ee_pos_xyz(q)[:2]

    _jac_full = jax.jacfwd(ee_pos_xyz)  # (3, n)

    def jacobian(q):
        return _jac_full(q)[:k]

    _djdq = jax.jacfwd(jacobian)        # (k, n, n)

    def djdq(q):
        return _djdq(q)

    def jacobian_tot_state(q, qd):
        """d [ee_pos; J qd] / d [q; qd] = [[J, 0], [dJ/dq . qd, J]]
        (ref: RBDReference.py:318-336)."""
        J = jacobian(q)
        dJ = djdq(q)
        J2 = jnp.tensordot(dJ, qd, axes=([2], [0]))  # (k, n)
        Z = jnp.zeros_like(J)
        top = jnp.concatenate([J, Z], axis=1)
        bot = jnp.concatenate([J2, J], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    return Kinematics(
        robot=robot,
        ee_pos_xyz=ee_pos_xyz,
        ee_pos=ee_pos,
        jacobian=jacobian,
        djdq=djdq,
        jacobian_tot_state=jacobian_tot_state,
    )
