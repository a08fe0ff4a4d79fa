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

from trajoptmpcreference_tpu.models.robot import REVOLUTE, RobotModel
from trajoptmpcreference_tpu.ops.spatial import joint_hom_transform


@dataclasses.dataclass(frozen=True)
class Kinematics:
    robot: RobotModel
    ee_pos_xyz: Callable       # (q,) -> (3,) world xyz of the ee point
    ee_pos: Callable           # (q,) -> (2,) reference-parity planar slice
    jacobian: Callable         # (q,) -> (k, n), k = min(3, n)
    djdq: Callable             # (q,) -> (k, n, n) dJ[i,j]/dq_l tensor
    d2jdq2: Callable           # (q,) -> (k, n, n, n) d2J/dq2 tensor
    jacobian_tot_state: Callable  # (q, qd) -> (2k, 2n)
    frames: Callable           # (q,) -> (p (3,), w (n,3), o (n,3))
    task_vec: Callable = None  # (q, qd) -> (2k,) [ee_pos_k; J qd] in ONE
    # frames pass (the task-space cost's residual before the goal shift —
    # ee_pos_xyz + jacobian as separate calls walk the chain twice)
    plain: "Kinematics" = None  # autodiff-safe variant (self when not lanes)

    def __post_init__(self):
        if self.plain is None:
            object.__setattr__(self, "plain", self)


def make_kinematics(robot: RobotModel,
                    offset: Tuple[float, float, float] = (0.0, 1.0, 0.0),
                    leaf: int = 0,
                    use_lanes: bool = False,
                    use_pallas_task: bool = False,
                    pallas_interpret: bool = False) -> Kinematics:
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

    def _jac_from_frames(p, w, o):
        rel = p[None, :] - o                       # (n, 3)
        Jrev = jnp.cross(w, rel)                   # (n, 3)
        J = jnp.where(jnp.asarray(is_rev)[:, None], Jrev, w)
        J = jnp.where(jnp.asarray(in_chain)[:, None], J, 0.0)
        return J.T                                 # (3, n)

    def _jac_full(q):
        return _jac_from_frames(*frames(q))

    def jacobian(q):
        return _jac_full(q)[:k]

    def task_vec(q, qd):
        """[ee_pos_k; J qd] from ONE frames pass (the task-space cost
        residual; ee_pos + jacobian as separate calls walk the homogeneous
        chain twice)."""
        p, w, o = frames(q)
        J = _jac_from_frames(p, w, o)[:k]
        return jnp.concatenate([p[:k], J @ qd])

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

    def d2jdq2(q):
        """Second q-derivative of the task Jacobian, exact via jacfwd of the
        geometric dJ/dq (replaces the reference's 2-link-only shortcut,
        ref: RBDReference.py:273-315)."""
        return jax.jacfwd(djdq)(q)

    plain = Kinematics(
        robot=robot,
        ee_pos_xyz=ee_pos_xyz,
        ee_pos=ee_pos,
        jacobian=jacobian,
        djdq=djdq,
        d2jdq2=d2jdq2,
        jacobian_tot_state=jacobian_tot_state,
        frames=frames,
        task_vec=task_vec,
    )
    if not use_lanes:
        return plain

    # ------------------------------------------------- batch-minor (lanes)
    # Same geometric recursions with a trailing lane axis L and
    # custom_vmap folding (see ops/lanes.py for the strategy); plain
    # variants stay available via .plain for autodiff paths (custom_vmap
    # under jvp recurses — see lanes.py).
    from jax.custom_batching import custom_vmap

    from trajoptmpcreference_tpu.ops.lanes import _fold, _unfold

    rev_m = jnp.asarray(is_rev)
    chain_m = jnp.asarray(in_chain)
    ordv = jnp.asarray(order)

    def frames_L(q):
        """q (n, L) -> p (3, L), w (n, 3, L), o (n, 3, L)."""
        dtype = q.dtype
        L = q.shape[1]
        H = jnp.broadcast_to(jnp.eye(4, dtype=dtype)[:, :, None], (4, 4, L))
        w_list = [jnp.zeros((3, L), dtype=dtype)] * n
        o_list = [jnp.zeros((3, L), dtype=dtype)] * n
        for j in chain:
            Rw = H[:3, :3]
            Ef_ax = np.asarray(robot.E_fixed[j]).T @ np.asarray(robot.axis[j])
            w_list[j] = jnp.sum(
                Rw * jnp.asarray(Ef_ax, dtype=dtype)[None, :, None], axis=1)
            # H = H @ Hj with Hj built per-lane
            Hj = _joint_hom_lanes(robot, j, q[j])
            H = jnp.sum(H[:, :, None, :] * Hj[None, :, :, :], axis=1)
            o_list[j] = H[:3, 3]
        p = jnp.sum(H[:3, :, :] * jnp.asarray(off, dtype=dtype)[None, :, None],
                    axis=1)
        return p, jnp.stack(w_list), jnp.stack(o_list)

    def jac_full_L(q):
        p, w, o = frames_L(q)
        rel = p[None, :, :] - o                       # (n, 3, L)
        Jrev = jnp.cross(w, rel, axis=1)
        J = jnp.where(rev_m[:, None, None], Jrev, w)
        J = jnp.where(chain_m[:, None, None], J, 0.0)
        return jnp.swapaxes(J, 0, 1)                  # (3, n, L)

    def djdq_L(q):
        p, w, o = frames_L(q)
        rel = p[None, :, :] - o
        Jf = jnp.where(rev_m[:, None, None], jnp.cross(w, rel, axis=1), w)
        Jf = jnp.where(chain_m[:, None, None], Jf, 0.0)    # (n, 3, L)
        wl = w[None, :, :, :]                               # [j, l, 3, L]
        wj = w[:, None, :, :]
        relj = rel[:, None, :, :]
        cx = lambda a, b: jnp.cross(a, b, axis=2)
        dJ_le = cx(cx(wl, wj), relj) + cx(wj, cx(wl, relj))
        dJ_gt = cx(wj, Jf[None, :, :, :])
        rev_j = rev_m[:, None, None, None]
        rev_l = rev_m[None, :, None, None]
        dJ_le_full = jnp.where(rev_j, dJ_le, cx(wl, wj)) * rev_l
        dJ_gt_full = jnp.where(rev_j, dJ_gt, 0.0)
        le = (ordv[None, :] <= ordv[:, None])[:, :, None, None]
        dJ = jnp.where(le, dJ_le_full, dJ_gt_full)          # (j, l, 3, L)
        mask = (chain_m[:, None, None, None] & chain_m[None, :, None, None])
        dJ = jnp.where(mask, dJ, 0.0)
        return jnp.transpose(dJ, (2, 0, 1, 3))[:k]          # (k, j, l, L)

    def jt_L(q, qd):
        J = jac_full_L(q)[:k]                               # (k, n, L)
        dJ = djdq_L(q)
        J2 = jnp.sum(dJ * qd[None, None, :, :], axis=2)     # (k, n, L)
        Z = jnp.zeros_like(J)
        top = jnp.concatenate([J, Z], axis=1)
        bot = jnp.concatenate([J2, J], axis=1)
        return jnp.concatenate([top, bot], axis=0)          # (2k, 2n, L)

    def task_vec_L(q, qd):
        """[ee_pos_k; J qd] over lanes: (n, L), (n, L) -> (2k, L), one
        frames pass."""
        p, w, o = frames_L(q)
        rel = p[None, :, :] - o
        Jrev = jnp.cross(w, rel, axis=1)
        J = jnp.where(rev_m[:, None, None], Jrev, w)
        J = jnp.where(chain_m[:, None, None], J, 0.0)       # (n, 3, L)
        vel = jnp.sum(J[:, :k, :] * qd[:, None, :], axis=0)  # (k, L)
        return jnp.concatenate([p[:k], vel], axis=0)

    def _wrap(fn_L, n_in):
        @custom_vmap
        def f(*args):
            return fn_L(*args)

        @f.def_vmap
        def _rule(axis_size, in_batched, *args):
            folded = [
                _fold(a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
                for a, b in zip(args, in_batched)]
            return _unfold(f(*folded), axis_size), True

        return f

    def _pallas_task_vec(q, qd, block_l=128, interpret=False):
        """task_vec_L as one Pallas kernel per lane tile: the homogeneous
        chain, Jacobian columns, and J qd contraction stay in VMEM instead
        of XLA's many small HBM-bound elementwise kernels (the same
        strategy as ops/lanes._pallas_fd; constants here are small numpy
        literals, so no closure_convert is needed)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L = q.shape[1]

        def kernel(q_ref, qd_ref, out_ref):
            out_ref[:] = task_vec_L(q_ref[:], qd_ref[:])

        in_spec = pl.BlockSpec((n, block_l), lambda g: (0, g),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((2 * k, block_l), lambda g: (0, g),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(L // block_l,),
            in_specs=[in_spec, in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((2 * k, L), q.dtype),
            interpret=interpret,
        )(q, qd)

    @custom_vmap
    def tvL(q, qd):
        if (use_pallas_task and q.shape[1] % 128 == 0
                and (pallas_interpret or jax.default_backend() == "tpu")):
            try:
                return _pallas_task_vec(q, qd, interpret=pallas_interpret)
            except ValueError:
                pass
        return task_vec_L(q, qd)

    @tvL.def_vmap
    def _tv_rule(axis_size, in_batched, q, qd):
        folded = [
            _fold(a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
            for a, b in zip((q, qd), in_batched)]
        return _unfold(tvL(*folded), axis_size), True

    eeL = _wrap(lambda q: frames_L(q)[0], 1)
    jacfullL = _wrap(jac_full_L, 1)
    jacL = _wrap(lambda q: jac_full_L(q)[:k], 1)
    djdqL = _wrap(djdq_L, 1)
    jtL = _wrap(jt_L, 2)

    # first-order autodiff via the geometric derivatives (jvp through the
    # custom_vmap folding rule recurses; second order raises instead)
    @jax.custom_jvp
    def ee_pos_xyz_l(q):
        return eeL(q[:, None])[:, 0]

    @ee_pos_xyz_l.defjvp
    def _ee_jvp(primals, tangents):
        (q,), (tq,) = primals, tangents
        out = ee_pos_xyz_l(q)
        Jf = jacfullL(q[:, None])[:, :, 0]        # (3, n)
        return out, Jf @ tq

    def ee_pos_l(q):
        return ee_pos_xyz_l(q)[:2]

    @jax.custom_jvp
    def jacobian_l(q):
        return jacL(q[:, None])[:, :, 0]

    @jacobian_l.defjvp
    def _jac_jvp(primals, tangents):
        (q,), (tq,) = primals, tangents
        out = jacobian_l(q)
        dJ = djdqL(q[:, None])[:, :, :, 0]        # (k, n, n)
        return out, jnp.tensordot(dJ, tq, axes=([2], [0]))

    def jt_l(q, qd):
        return jtL(q[:, None], qd[:, None])[:, :, 0]

    @jax.custom_jvp
    def task_vec_l(q, qd):
        return tvL(q[:, None], qd[:, None])[:, 0]

    @task_vec_l.defjvp
    def _tv_jvp(primals, tangents):
        # exact tangent: d [ee; J qd] / d [q; qd] IS jacobian_tot_state
        q, qd = primals
        tq, tqd = tangents
        out = task_vec_l(q, qd)
        Jt = jt_l(q, qd)
        return out, Jt @ jnp.concatenate([tq, tqd])

    return dataclasses.replace(
        plain,
        ee_pos_xyz=ee_pos_xyz_l,
        ee_pos=ee_pos_l,
        jacobian=jacobian_l,
        jacobian_tot_state=jt_l,
        task_vec=task_vec_l,
        plain=plain,
    )


def _joint_hom_lanes(robot: RobotModel, j: int, theta):
    """Homogeneous transform for lane vector theta (L,) -> (4, 4, L)
    (lanes version of ops/spatial.py:139-161)."""
    dtype = theta.dtype
    L = theta.shape[0]
    Ef = np.asarray(robot.E_fixed[j])
    tf = np.asarray(robot.t_fixed[j])
    ax = np.asarray(robot.axis[j])
    H = jnp.zeros((4, 4, L), dtype=dtype)
    H = H.at[3, 3].set(1.0)
    if robot.joint_type[j] == REVOLUTE:
        A = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        A2 = A @ A
        st, ct = jnp.sin(theta), 1.0 - jnp.cos(theta)
        E = (jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, L))
             - st[None, None, :] * jnp.asarray(A, dtype=dtype)[:, :, None]
             + ct[None, None, :] * jnp.asarray(A2, dtype=dtype)[:, :, None])
        # R = (E @ Ef)^T
        REf = jnp.sum(E[:, :, None, :]
                      * jnp.asarray(Ef, dtype=dtype)[None, :, :, None], axis=1)
        H = H.at[:3, :3].set(jnp.swapaxes(REf, 0, 1))
        H = H.at[:3, 3].set(jnp.asarray(tf, dtype=dtype)[:, None])
    else:
        H = H.at[:3, :3].set(
            jnp.broadcast_to(jnp.asarray(Ef.T, dtype=dtype)[:, :, None],
                             (3, 3, L)))
        H = H.at[:3, 3].set(jnp.asarray(ax, dtype=dtype)[:, None]
                            * theta[None, :]
                            + jnp.asarray(tf, dtype=dtype)[:, None])
    return H
