"""Spatial (Plücker) algebra primitives in JAX.

Single-sample functions over 6-vectors / 6x6 matrices; batching is done with
``jax.vmap`` at call sites.  Where the reference loops over matrix columns
with per-column cross products (ref: GRiD/RBDReference/RBDReference.py:
13-116), we exploit bilinearity to express those loops as single 6x6 matrix
products (MXU/VPU-friendly, fused by XLA):

  crm(a) @ b = -crm(b) @ a            (motion cross antisymmetry)
  crf(a) @ b =  icrf(b) @ a           (force cross swap identity)

so e.g. ``for c: df[:,c] += fxv(dv[:,c], Iv)`` becomes
``df += icrf(Iv) @ dv``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from trajoptmpcreference_tpu.models.robot import PRISMATIC, REVOLUTE, RobotModel


def crm(v):
    """Motion cross-product operator [v x] (ref: RBDReference.py:13-34)."""
    z = jnp.zeros((), dtype=v.dtype)
    r0 = jnp.stack([z, -v[2], v[1], z, z, z])
    r1 = jnp.stack([v[2], z, -v[0], z, z, z])
    r2 = jnp.stack([-v[1], v[0], z, z, z, z])
    r3 = jnp.stack([z, -v[5], v[4], z, -v[2], v[1]])
    r4 = jnp.stack([v[5], z, -v[3], v[2], z, -v[0]])
    r5 = jnp.stack([-v[4], v[3], z, -v[1], v[0], z])
    return jnp.stack([r0, r1, r2, r3, r4, r5])


def crf(v):
    """Force cross-product operator [v x*] = -crm(v)^T (ref: RBDReference.py:36-39)."""
    return -crm(v).T


def icrf(v):
    """Swap operator: icrf(b) @ a == crf(a) @ b (ref: RBDReference.py:42-54)."""
    z = jnp.zeros((), dtype=v.dtype)
    r0 = jnp.stack([z, -v[2], v[1], z, -v[5], v[4]])
    r1 = jnp.stack([v[2], z, -v[0], v[5], z, -v[3]])
    r2 = jnp.stack([-v[1], v[0], z, -v[4], v[3], z])
    r3 = jnp.stack([z, -v[5], v[4], z, z, z])
    r4 = jnp.stack([v[5], z, -v[3], z, z, z])
    r5 = jnp.stack([-v[4], v[3], z, z, z, z])
    return -jnp.stack([r0, r1, r2, r3, r4, r5])


def mxS(S, vec, alpha=1.0):
    """alpha * crm(vec) @ S (ref: RBDReference.py:58-63)."""
    return alpha * (crm(vec) @ S)


def fxS(S, vec, alpha=1.0):
    """alpha * crf(S) @ vec — the force cross of the joint subspace with a
    force vector.

    The reference computes this as -mxS(S, vec) (ref: RBDReference.py:94-97),
    an identity that holds ONLY for purely-angular S (revolute joints): for
    prismatic S = (0; v), crf(S) f = [v x f_lin; 0] while -crm(f) S =
    [0; v x f_ang].  The reference never hits the difference (its URDFs are
    all revolute); verified against jax.jacfwd of rnea on a mixed R-P-R arm
    (tests/test_prismatic.py)."""
    return alpha * (crf(S) @ vec)


def vxIv(v, Imat):
    """crf(v) @ (Imat @ v) (ref: RBDReference.py:99-116)."""
    return crf(v) @ (Imat @ v)


def spatial_inv(X):
    """Closed-form inverse of a spatial motion transform.

    Any product of rot/xlt transforms has the block form [[R,0],[B,R]] with R
    a rotation, whose inverse is [[R^T,0],[-R^T B R^T, R^T]] — avoids LU
    decomposition (unsupported for f64 on TPU) where the reference calls
    np.linalg.inv (ref: RBDReference_generalized.py:765).
    """
    R = X[:3, :3]
    B = X[3:, :3]
    Rt = R.T
    top = jnp.concatenate([Rt, jnp.zeros_like(Rt)], axis=1)
    bot = jnp.concatenate([-Rt @ B @ Rt, Rt], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _skew(a):
    z = jnp.zeros((), dtype=a.dtype)
    return jnp.stack([
        jnp.stack([z, -a[2], a[1]]),
        jnp.stack([a[2], z, -a[0]]),
        jnp.stack([-a[1], a[0], z]),
    ])


def joint_free_rotation(axis, theta):
    """Featherstone rotation E_free(theta) = R_axis(theta)^T for a unit axis.

    E = I - sin(t) [a]x + (1-cos(t)) [a]x^2 (transpose of Rodrigues), reducing
    to the reference's rx/ry/rz for principal axes (ref: SpatialAlgebra.py:
    48-64), generalized to arbitrary axes.
    """
    A = _skew(axis.astype(theta.dtype))
    I3 = jnp.eye(3, dtype=theta.dtype)
    return I3 - jnp.sin(theta) * A + (1.0 - jnp.cos(theta)) * (A @ A)


def joint_spatial_transform(jtype: int, axis: np.ndarray, X_fixed: np.ndarray, theta):
    """X(theta) = X_free(theta) @ X_fixed (ref: Joint.py:88).

    Revolute: X_free = blkdiag(E, E).  Prismatic: X_free = [[I,0],[-skew(a t), I]].
    ``jtype``, ``axis``, ``X_fixed`` are static per joint; theta is traced.
    """
    dtype = theta.dtype
    Xf = jnp.asarray(X_fixed, dtype=dtype)
    ax = jnp.asarray(axis, dtype=dtype)
    if jtype == REVOLUTE:
        E = joint_free_rotation(ax, theta)
        Z = jnp.zeros((3, 3), dtype=dtype)
        Xfree = jnp.block([[E, Z], [Z, E]])
    else:  # PRISMATIC
        I3 = jnp.eye(3, dtype=dtype)
        Z = jnp.zeros((3, 3), dtype=dtype)
        Xfree = jnp.block([[I3, Z], [-_skew(ax * theta), I3]])
    return Xfree @ Xf


def joint_transforms(robot: RobotModel, q):
    """All n spatial transforms for configuration q: (n,6,6).

    Replaces the reference's per-joint sympy-lambdified transform functions
    (ref: Robot.py:218-240) with direct trig construction, unrolled at trace
    time (n is static).
    """
    Xs = [
        joint_spatial_transform(robot.joint_type[j], robot.axis[j], robot.X_fixed[j], q[j])
        for j in range(robot.n)
    ]
    return jnp.stack(Xs)


def joint_hom_transform(robot: RobotModel, j: int, theta):
    """Homogeneous transform H_j(theta): child-joint frame -> parent frame.

    H = [[(E_free(theta) @ E_fixed)^T, t_free(theta) + t_fixed], [0, 1]]
    (ref: Joint.py:91-95).  Differentiable in theta (used via jax.jacfwd for
    Jacobians and their derivatives instead of the reference's symbolic
    dXmat_hom, ref: Joint.py:96-98).
    """
    dtype = theta.dtype
    Ef = jnp.asarray(robot.E_fixed[j], dtype=dtype)
    tf = jnp.asarray(robot.t_fixed[j], dtype=dtype)
    ax = jnp.asarray(robot.axis[j], dtype=dtype)
    if robot.joint_type[j] == REVOLUTE:
        R = (joint_free_rotation(ax, theta) @ Ef).T
        t = tf
    else:
        R = Ef.T
        t = ax * theta + tf
    H = jnp.zeros((4, 4), dtype=dtype)
    H = H.at[:3, :3].set(R)
    H = H.at[:3, 3].set(t)
    H = H.at[3, 3].set(1.0)
    return H
