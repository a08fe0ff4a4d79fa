"""End-effector kinematics: positions, Jacobians, and their q-derivatives.

The reference chains sympy-lambdified homogeneous transforms and hardcodes
2-link shortcuts for dJ/dq and d2J/dq2 (ref: GRiD/RBDReference/
RBDReference.py:123-387, the 2-link-only blocks at :219-315).  Here
everything is computed from ONE forward pass of world-frame transforms via
geometric (screw) recursions:

  revolute j:  J[:, j] = w_j x (p - o_j)
  dJ[:, j]/dq_l = (w_l x w_j) x (p - o_j) + w_j x (w_l x (p - o_j)),  l <= j
                = w_j x J[:, l],                                      l  > j

with w_j / o_j the world joint axis / origin and p the EE point — exact,
robot-general, O(n^2) small cross products.  (An earlier version used
nested jax.jacfwd through the 4x4 chains; that autodiff path produced
6-D tensors that XLA pads ~28x on TPU and OOMed large batches.)

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

from trajoptmpcreference_tpu.models.robot import PRISMATIC, REVOLUTE, RobotModel
from trajoptmpcreference_tpu.ops.spatial import joint_hom_transform


@dataclasses.dataclass(frozen=True)
class Kinematics:
    robot: RobotModel
    ee_pos_xyz: Callable       # (q,) -> (3,) world xyz of the ee point
    ee_pos: Callable           # (q,) -> (2,) reference-parity planar slice
    jacobian: Callable         # (q,) -> (k, n), k = min(3, n)
    djdq: Callable             # (q,) -> (k, n, n) dJ[i,j]/dq_l tensor
    jacobian_tot_state: Callable  # (q, qd) -> (2k, 2n)
    frames: Callable           # (q,) -> (p (3,), w (n,3), o (n,3))


def make_kinematics(robot: RobotModel,
                    offset: Tuple[float, float, float] = (0.0, 1.0, 0.0),
                    leaf: int = 0) -> Kinematics:
    n = robot.n
    leaf_id = robot.leaves[leaf]
    chain = list(robot.ancestors(leaf_id)) + [leaf_id]
    k = min(3, n)
    off = np.array([*offset, 1.0])
    in_chain = np.zeros(n, dtype=bool)
    in_chain[np.array(chain)] = True
    # chain order index (position of joint j along the chain; -1 off-chain)
    order = np.full(n, -1)
    for pos, j in enumerate(chain):
        order[j] = pos
    is_rev = np.array([robot.joint_type[j] == REVOLUTE for j in range(n)])

    def frames(q):
        """World EE point p, world joint axes w (n,3), origins o (n,3)."""
        dtype = q.dtype
        H = jnp.eye(4, dtype=dtype)
        w_list = [jnp.zeros(3, dtype=dtype)] * n
        o_list = [jnp.zeros(3, dtype=dtype)] * n
        for j in chain:
            Rw = H[:3, :3]
            Hj = joint_hom_transform(robot, j, q[j])
            ax = jnp.asarray(robot.axis[j], dtype=dtype)
            # world axis: rotation up to and including this joint's fixed
            # frame; the joint's own rotation is about its (fixed-frame) axis
            w_list[j] = (Rw @ jnp.asarray(robot.E_fixed[j].T, dtype=dtype)) @ ax
            H = H @ Hj
            # child-frame origin lies on the joint axis (t_fixed offset
            # applied) — the point the revolute Jacobian column pivots about
            o_list[j] = H[:3, 3]
        p = (H @ jnp.asarray(off, dtype=dtype))[:3]
        return p, jnp.stack(w_list), jnp.stack(o_list)

    def ee_pos_xyz(q):
        p, _, _ = frames(q)
        return p

    def ee_pos(q):
        return ee_pos_xyz(q)[:2]

    def _jac_full(q):
        p, w, o = frames(q)
        rel = p[None, :] - o                       # (n, 3)
        Jrev = jnp.cross(w, rel)                   # (n, 3)
        J = jnp.where(jnp.asarray(is_rev)[:, None], Jrev, w)
        J = jnp.where(jnp.asarray(in_chain)[:, None], J, 0.0)
        return J.T                                 # (3, n)

    def jacobian(q):
        return _jac_full(q)[:k]

    def djdq(q):
        """dJ[i, j]/dq_l as (k, n, n) from the geometric recursions."""
        p, w, o = frames(q)
        rel = p[None, :] - o                       # (n, 3)
        Jf = jnp.where(jnp.asarray(is_rev)[:, None], jnp.cross(w, rel), w)
        Jf = jnp.where(jnp.asarray(in_chain)[:, None], Jf, 0.0)  # (n, 3)
        wl = w[None, :, :]                          # axis l   (1, n, 3) -> [j, l]
        wj = w[:, None, :]                          # axis j
        relj = rel[:, None, :]                      # p - o_j
        # l <= j (both revolute):
        dJ_le = (jnp.cross(jnp.cross(wl, wj), relj)
                 + jnp.cross(wj, jnp.cross(wl, relj)))       # (n, n, 3)
        # l > j: w_j x J_l
        dJ_gt = jnp.cross(wj, Jf[None, :, :])                # (n, n, 3)
        ordv = jnp.asarray(order)
        le = (ordv[None, :] <= ordv[:, None])                # l before j
        rev_j = jnp.asarray(is_rev)[:, None, None]
        rev_l = jnp.asarray(is_rev)[None, :, None]
        # prismatic l, l <= j: no contribution; prismatic j, l <= j
        # (revolute l): w_l x w_j; prismatic j, l > j: 0
        dJ_le_prisj = jnp.cross(wl, wj)                      # (n, n, 3)
        dJ_le_full = jnp.where(rev_j, dJ_le, dJ_le_prisj) * rev_l
        dJ_gt_full = jnp.where(rev_j, dJ_gt, 0.0)
        dJ = jnp.where(le[:, :, None], dJ_le_full, dJ_gt_full)  # (j, l, 3)
        mask = (jnp.asarray(in_chain)[:, None, None]
                & jnp.asarray(in_chain)[None, :, None])
        dJ = jnp.where(mask, dJ, 0.0)
        return jnp.transpose(dJ, (2, 0, 1))[:k]              # (k, j, l)

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
        frames=frames,
    )
