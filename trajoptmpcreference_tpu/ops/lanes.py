"""Batch-minor ("lanes") rigid-body dynamics: the TPU hot path.

The per-sample kernels in ops/rbd.py are correct but slow when vmapped on
TPU: batch-leading layouts put the tiny spatial dims (6, n) on the 128-wide
vector lanes (<5% utilization) and every small matmul lowers to its own
padded dot_general.  Here every quantity carries the batch as its TRAILING
axis — (6, L), (6, 6, L), (n, 3n, L) — and every small matmul is an
explicit sum of broadcast multiplies, so XLA lays L on the lanes and fuses
whole algorithm phases into a few elementwise kernels.  This is the GRiD
thread-per-scenario strategy (ref: GRiDCodeGenerator design, SURVEY.md
§2.5) mapped onto the TPU VPU.

``make_rbd_lanes(robot)`` returns fd / fd_grad wrapped in
``jax.custom_batching.custom_vmap`` rules that FOLD any vmapped axis into L
— so solver code written per-sample (and vmapped over knots and scenarios)
automatically runs batch-minor at any nesting depth.

Numerics are identical to ops/rbd.py (same recursions, same order of
operations up to reassociation); cross-validated in tests/test_lanes.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from trajoptmpcreference_tpu.models.robot import REVOLUTE, RobotModel


# ---------------------------------------------------------------- helpers
def _mm(M, A):
    """(6, 6, L) @ (6, k, L) -> (6, k, L) (or k absent: vector)."""
    if A.ndim == 2:
        return jnp.sum(M * A[None, :, :], axis=1)
    return jnp.sum(M[:, :, None, :] * A[None, :, :, :], axis=1)


def _mmTv(M, v):
    """M^T v: (6,6,L)^T @ (6,L) -> (6,L)."""
    return jnp.sum(M * v[:, None, :], axis=0)


def _mmTm(M, A):
    """M^T A: (6,6,L)^T @ (6,k,L) -> (6,k,L)."""
    return jnp.sum(M[:, :, None, :] * A[:, None, :, :], axis=0)


def _sm(Ms, A):
    """static (6,6) @ (6,k,L) or (6,L)."""
    Ms = jnp.asarray(Ms, dtype=A.dtype)
    if A.ndim == 2:
        return jnp.sum(Ms[:, :, None] * A[None, :, :], axis=1)
    return jnp.sum(Ms[:, :, None, None] * A[None, :, :, :], axis=1)


def _crm(v):
    """crm of a lane vector (6, L) -> (6, 6, L) (ops/spatial.py:24-33)."""
    z = jnp.zeros_like(v[0])
    r = [[z, -v[2], v[1], z, z, z],
         [v[2], z, -v[0], z, z, z],
         [-v[1], v[0], z, z, z, z],
         [z, -v[5], v[4], z, -v[2], v[1]],
         [v[5], z, -v[3], v[2], z, -v[0]],
         [-v[4], v[3], z, -v[1], v[0], z]]
    return jnp.stack([jnp.stack(row) for row in r])


def _crm_v(a, b):
    """crm(a) @ b for lane vectors (6, L)."""
    return jnp.stack([
        -a[2] * b[1] + a[1] * b[2],
        a[2] * b[0] - a[0] * b[2],
        -a[1] * b[0] + a[0] * b[1],
        -a[2] * b[4] + a[1] * b[5] - a[5] * b[1] + a[4] * b[2],
        a[2] * b[3] - a[0] * b[5] + a[5] * b[0] - a[3] * b[2],
        -a[1] * b[3] + a[0] * b[4] - a[4] * b[0] + a[3] * b[1],
    ])


def _crf_v(a, b):
    """crf(a) @ b = -crm(a)^T b for lane vectors."""
    return jnp.stack([
        -a[2] * b[1] + a[1] * b[2] - a[5] * b[4] + a[4] * b[5],
        a[2] * b[0] - a[0] * b[2] + a[5] * b[3] - a[3] * b[5],
        -a[1] * b[0] + a[0] * b[1] - a[4] * b[3] + a[3] * b[4],
        -a[2] * b[4] + a[1] * b[5],
        a[2] * b[3] - a[0] * b[5],
        -a[1] * b[3] + a[0] * b[4],
    ])


def _icrf(v):
    """icrf(v) as (6, 6, L) (ops/spatial.py:41-50)."""
    z = jnp.zeros_like(v[0])
    r = [[z, v[2], -v[1], z, v[5], -v[4]],
         [-v[2], z, v[0], -v[5], z, v[3]],
         [v[1], -v[0], z, v[4], -v[3], z],
         [z, v[5], -v[4], z, z, z],
         [-v[5], z, v[3], z, z, z],
         [v[4], -v[3], z, z, z, z]]
    return jnp.stack([jnp.stack(row) for row in r])


def _crf_m(v, A):
    """crf(v) @ A with v (6, L), A (6, k, L): -crm(v)^T A."""
    return -_mmTm(_crm(v), A)


from typing import NamedTuple


class LaneConsts(NamedTuple):
    """Stacked per-robot constant arrays, passed as traced inputs so the
    algorithms contain NO array constants (a Pallas kernel requirement)."""

    S: jnp.ndarray        # (n, 6, 1)
    I6: jnp.ndarray       # (n, 6, 6)
    Xf: jnp.ndarray       # (n, 6, 6)
    A: jnp.ndarray        # (n, 3, 3) axis skews
    A2: jnp.ndarray       # (n, 3, 3)
    crmS: jnp.ndarray     # (n, 6, 6)
    damping: jnp.ndarray  # (1, n)


def lane_consts(robot: RobotModel, dtype) -> LaneConsts:
    n = robot.n
    A = np.zeros((n, 3, 3))
    crmS = np.zeros((n, 6, 6))
    for j in range(n):
        ax = np.asarray(robot.axis[j])
        A[j] = [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
        s0, s1, s2, s3, s4, s5 = np.asarray(robot.S[j])
        crmS[j, :3, :3] = [[0, -s2, s1], [s2, 0, -s0], [-s1, s0, 0]]
        crmS[j, 3:, 3:] = crmS[j, :3, :3]
        crmS[j, 3:, :3] = [[0, -s5, s4], [s5, 0, -s3], [-s4, s3, 0]]
    return LaneConsts(
        S=jnp.asarray(robot.S, dtype)[..., None],   # (n, 6, 1): rank-1
        # sublane vectors hit unsupported shape casts in Mosaic
        I6=jnp.asarray(robot.I_spatial, dtype),
        Xf=jnp.asarray(robot.X_fixed, dtype),
        A=jnp.asarray(A, dtype),
        A2=jnp.asarray(A @ A, dtype),
        crmS=jnp.asarray(crmS, dtype),
        damping=jnp.asarray(robot.damping, dtype)[None, :],
    )


def _eye(k, dtype):
    """Identity without an array constant (iota compare — Mosaic-safe)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r == c).astype(dtype)


def _triu_mask(k, strict, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((r < c) if strict else (r <= c)).astype(dtype)


def _onehot(n, i, dtype):
    """(n,) one-hot without array constants (Mosaic-safe)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (idx == i).astype(dtype)


def _gvec(gravity, L, dtype):
    """Gravity spatial vector (6, L) = -g on row 5, scatter-free."""
    return jnp.concatenate(
        [jnp.zeros((5, L), dtype=dtype),
         jnp.full((1, L), -gravity, dtype=dtype)], axis=0)


def _smat(M2, A):
    """(6, 6) traced matrix @ (6, k, L) via scalar-unrolled rows — avoids
    unit-minor 4-D vector layouts Mosaic cannot infer."""
    return jnp.stack([
        sum(M2[r, j] * A[j] for j in range(6)) for r in range(6)])


def _addcol(A, i, v):
    """A (6, n, L) with v (6, L) added to column i — scatter-free
    (every .at[...] update lowers to a scatter Mosaic cannot compile)."""
    oh = _onehot(A.shape[1], i, A.dtype)
    return A + oh[None, :, None] * v[:, None, :]


def _pad_rows(v, i, n):
    """(s, L) -> (n, L): zeros in rows < i, v in rows i..n-1.

    i = 0 short-circuits: Mosaic rejects zero-size vectors."""
    if i == 0:
        return v
    return jnp.concatenate(
        [jnp.zeros((i,) + v.shape[1:], v.dtype), v], axis=0)


def _joint_X(robot, j, theta, C: LaneConsts):
    """Spatial transform X_j(theta) for lane vector theta (L,) -> (6,6,L)
    (ops/spatial.py:105-122)."""
    dtype = theta.dtype
    Xf = C.Xf[j]
    L = theta.shape[0]
    I3 = jnp.broadcast_to(_eye(3, dtype)[:, :, None], (3, 3, L))
    if robot.joint_type[j] == REVOLUTE:
        st, ct = jnp.sin(theta), 1.0 - jnp.cos(theta)
        E = (I3 - st[None, None, :] * C.A[j][:, :, None]
             + ct[None, None, :] * C.A2[j][:, :, None])
        Z = jnp.zeros((3, 3, L), dtype=dtype)
        Xfree = jnp.concatenate([
            jnp.concatenate([E, Z], axis=1),
            jnp.concatenate([Z, E], axis=1)], axis=0)
    else:
        K = C.A[j][:, :, None] * theta[None, None, :]
        Z = jnp.zeros((3, 3, L), dtype=dtype)
        Xfree = jnp.concatenate([
            jnp.concatenate([I3, Z], axis=1),
            jnp.concatenate([-K, I3], axis=1)], axis=0)
    return jnp.sum(Xfree[:, :, None, :] * Xf[None, :, :, None], axis=1)


# ------------------------------------------------------------- algorithms
def _rnea_lanes(robot, X, q, qd, qdd, gravity, C: LaneConsts):
    """RNEA over lanes; returns (c (n,L), v, a, f lists, f_acc list)."""
    n = robot.n
    parent = robot.parent
    dtype = q.dtype
    L = q.shape[1]
    g = _gvec(gravity, L, dtype)
    S = [C.S[i] for i in range(n)]                    # (6, 1) each
    I6 = [C.I6[i][:, :, None] for i in range(n)]
    v, a, f = [], [], []
    for i in range(n):
        Si = S[i]
        if parent[i] == -1:
            vi = Si * qd[i][None, :]
            ai = _mm(X[i], g)
        else:
            vi = _mm(X[i], v[parent[i]]) + Si * qd[i][None, :]
            ai = _mm(X[i], a[parent[i]])
        ai = ai + qd[i][None, :] * _crm_v(vi, jnp.broadcast_to(Si, vi.shape))
        if qdd is not None:
            ai = ai + Si * qdd[i][None, :]
        Iv = jnp.sum(I6[i] * vi[None, :, :], axis=1)
        Ia = jnp.sum(I6[i] * ai[None, :, :], axis=1)
        fi = Ia + _crf_v(vi, Iv)
        v.append(vi)
        a.append(ai)
        f.append(fi)
    f_acc = list(f)
    c = [None] * n
    for i in range(n - 1, -1, -1):
        # scalar-unrolled S contraction (no low-rank shape casts in Mosaic)
        c[i] = sum(C.S[i][j, 0] * f_acc[i][j] for j in range(6))
        p = parent[i]
        if p != -1:
            f_acc[p] = f_acc[p] + _mmTv(X[i], f_acc[i])
    return jnp.stack(c), v, a, f_acc


def _minv_lanes(robot, X, q, C: LaneConsts):
    """Analytic Minv over lanes (ops/rbd.py minv; ref: RBDReference.py:
    805-930).  Returns dense symmetric (n, n, L).

    Serial chains index subtrees with plain slices (subtree(i) = i..n-1) so
    the code stays gather/scatter-free — required for the Pallas path
    (Mosaic has no scatter) and faster under XLA too."""
    n = robot.n
    parent = robot.parent
    dtype = q.dtype
    L = q.shape[1]
    serial = robot.is_serial_chain()
    if serial:
        subtrees = [slice(j, n) for j in range(n)]
    else:
        subtrees = [np.array(robot.subtree(j), dtype=np.int64)
                    for j in range(n)]
    S = [C.S[i] for i in range(n)]                    # (6, 1) each
    IA = [jnp.broadcast_to(C.I6[i][:, :, None], (6, 6, L)) for i in range(n)]
    Minv = jnp.zeros((n, n, L), dtype=dtype)
    F = [jnp.zeros((6, n, L), dtype=dtype) for _ in range(n)]
    U = [None] * n
    Dinv = [None] * n
    for i in range(n - 1, -1, -1):
        Si = S[i]
        sub = subtrees[i]
        U[i] = sum(Si[j, 0] * IA[i][:, j, :] for j in range(6))  # (6, L)
        Dinv[i] = 1.0 / sum(Si[j, 0] * U[i][j] for j in range(6))  # (L,)
        # row-i update, scatter-free: one-hot row x (diag + subtree) content
        SF = sum(Si[j, 0] * F[i][j, sub, :] for j in range(6))   # (s, L)
        row = (_onehot(n, i, dtype)[:, None] * Dinv[i][None, :]
               + _pad_rows(-Dinv[i][None, :] * SF,
                           sub.start if serial else int(sub[0]), n))
        Minv = Minv + _onehot(n, i, dtype)[:, None, None] * row[None, :, :]
        p = parent[i]
        if p != -1:
            # Minv row i is nonzero only on sub; add the full row product
            F[i] = F[i] + U[i][:, None, :] * Minv[i][None, :, :]
            F[p] = F[p] + _mmTm(X[i], F[i])
            Ia = IA[i] - (U[i][:, None, :] * (Dinv[i][None, None, :]
                                              * U[i][None, :, :]))
            IA[p] = IA[p] + _mmTm(X[i], _mm(Ia, X[i]))
    for i in range(n):
        Si = S[i]
        p = parent[i]
        tail = slice(i, n) if serial else np.arange(i, n)
        if p != -1:
            # U[i] @ X[i]: row vector times matrix -> (6, L)
            UX = jnp.sum(U[i][:, None, :] * X[i], axis=0)
            contrib = jnp.sum(UX[:, None, :] * F[p][:, tail, :], axis=0)
            add_row = _pad_rows(-Dinv[i][None, :] * contrib,
                                tail.start if serial else int(tail[0]), n)
            Minv = Minv + _onehot(n, i, dtype)[:, None, None] * add_row[None]
        Fi = Si[:, :, None] * Minv[i, tail][None, :, :]
        if p != -1:
            Fi = Fi + _mm(X[i], F[p][:, tail, :])
        # static-split concatenate: any .at[..., slice, ...] update lowers
        # to a scatter Mosaic rejects (i = 0: no leading block to keep)
        if serial:
            F[i] = Fi if i == 0 else jnp.concatenate(
                [F[i][:, :i, :], Fi], axis=1)
        else:
            F[i] = F[i].at[:, tail, :].set(Fi)
    # symmetrize from the upper triangle (ref: RBDReference.py:921-928);
    # iota masks only (no array constants / scatters — Mosaic-safe)
    upper = _triu_mask(n, False, dtype)[:, :, None] * Minv
    lower = (_triu_mask(n, True, dtype)[:, :, None] * upper).transpose(1, 0, 2)
    return upper + lower


def _rnea_grad_lanes(robot, X, q, qd, qdd, gravity, v, a, f_acc,
                     C: LaneConsts):
    """Analytic d tau / d [q, qd] over lanes -> (n, 2n, L)
    (ops/rbd.py rnea_grad; ref: RBDReference.py:561-802)."""
    n = robot.n
    parent = robot.parent
    dtype = q.dtype
    L = q.shape[1]
    g = _gvec(gravity, L, dtype)
    dv_dq, da_dq, df_dq = [], [], []
    dv_dqd, da_dqd, df_dqd = [], [], []
    for i in range(n):
        Si = C.S[i]                                   # (6, 1)
        I6 = C.I6[i][:, :, None]
        crmS = C.crmS[i]
        p = parent[i]
        if p == -1:
            dv = jnp.zeros((6, n, L), dtype=dtype)
            da = jnp.zeros((6, n, L), dtype=dtype)
            da = _addcol(da, i, _crm_v(_mm(X[i], g),
                                       jnp.broadcast_to(Si, (6, L))))
            dvd = jnp.zeros((6, n, L), dtype=dtype)
            dad = jnp.zeros((6, n, L), dtype=dtype)
        else:
            dv = _mm(X[i], dv_dq[p])
            dv = _addcol(dv, i, _crm_v(_mm(X[i], v[p]),
                                       jnp.broadcast_to(Si, (6, L))))
            da = _mm(X[i], da_dq[p])
            da = _addcol(da, i, _crm_v(_mm(X[i], a[p]),
                                       jnp.broadcast_to(Si, (6, L))))
            dvd = _mm(X[i], dv_dqd[p])
            dad = _mm(X[i], da_dqd[p])
        da = da - qd[i][None, None, :] * _smat(crmS, dv)
        dvd = _addcol(dvd, i, jnp.broadcast_to(Si, (6, L)))
        dad = dad - qd[i][None, None, :] * _smat(crmS, dvd)
        dad = _addcol(dad, i, _crm_v(v[i], jnp.broadcast_to(Si, (6, L))))
        I6m = C.I6[i]                                 # (6, 6) traced
        Iv = jnp.sum(I6 * v[i][None, :, :], axis=1)
        icrfIv = _icrf(Iv)
        Idv = _smat(I6m, dv)
        Idvd = _smat(I6m, dvd)
        df = _smat(I6m, da) + _mm(icrfIv, dv) + _crf_m(v[i], Idv)
        dfd = _smat(I6m, dad) + _mm(icrfIv, dvd) + _crf_m(v[i], Idvd)
        dv_dq.append(dv)
        da_dq.append(da)
        df_dq.append(df)
        dv_dqd.append(dvd)
        da_dqd.append(dad)
        df_dqd.append(dfd)
    dc_dq = [None] * n
    dc_dqd = [None] * n
    for i in range(n - 1, -1, -1):
        Si = C.S[i]
        dc_dq[i] = sum(Si[j, 0] * df_dq[i][j] for j in range(6))    # (n, L)
        dc_dqd[i] = sum(Si[j, 0] * df_dqd[i][j] for j in range(6))
        p = parent[i]
        if p != -1:
            upd = _mmTm(X[i], df_dq[i])
            # fxS = crf(S) f (ops/spatial.fxS); the reference's -crm(f) S
            # shortcut is revolute-only — see spatial.py fxS docstring
            fxS = _crf_v(jnp.broadcast_to(Si, (6, q.shape[1])), f_acc[i])
            upd = _addcol(upd, i, _mmTv(X[i], fxS))
            df_dq[p] = df_dq[p] + upd
            df_dqd[p] = df_dqd[p] + _mmTm(X[i], df_dqd[i])
    out_q = jnp.stack(dc_dq)            # (n, n, L)
    out_qd = jnp.stack(dc_dqd)
    if np.any(robot.damping):
        dmp = _eye(n, dtype) * C.damping[0][None, :]
        out_qd = out_qd + dmp[:, :, None]
    return jnp.concatenate([out_q, out_qd], axis=1)   # (n, 2n, L)


def fd_lanes(robot: RobotModel, q, qd, u, gravity=-9.81, consts=None):
    """qdd = Minv (u - c) over lanes; args (n, L) -> (n, L)."""
    n = robot.n
    C = lane_consts(robot, q.dtype) if consts is None else consts
    X = [_joint_X(robot, j, q[j], C) for j in range(n)]
    c, _, _, _ = _rnea_lanes(robot, X, q, qd, None, gravity, C)
    Mi = _minv_lanes(robot, X, q, C)
    return jnp.sum(Mi * (u - c)[None, :, :], axis=1)


def fd_grad_lanes(robot: RobotModel, q, qd, u, gravity=-9.81, consts=None):
    """dqdd/d[q, qd, u] over lanes -> (n, 3n, L) (ops/rbd.py fd_grad)."""
    n = robot.n
    C = lane_consts(robot, q.dtype) if consts is None else consts
    X = [_joint_X(robot, j, q[j], C) for j in range(n)]
    c, v, a_unused, f0 = _rnea_lanes(robot, X, q, qd, None, gravity, C)
    Mi = _minv_lanes(robot, X, q, C)
    qdd = jnp.sum(Mi * (u - c)[None, :, :], axis=1)
    # rerun rnea WITH qdd for the gradient's (v, a, f_acc)
    c2, v2, a2, facc2 = _rnea_lanes(robot, X, q, qd, qdd, gravity, C)
    dtau = _rnea_grad_lanes(robot, X, q, qd, qdd, gravity, v2, a2, facc2, C)
    # dqdd = [-Mi dtau, Mi]
    dfx = -jnp.sum(Mi[:, :, None, :] * dtau[None, :, :, :], axis=1)
    return jnp.concatenate([dfx, Mi], axis=1)         # (n, 3n, L)


# ----------------------------------------------- custom_vmap lane folding
def _fold(a):
    """(B, d0, ..., L) -> (d0, ..., L*B)."""
    a = jnp.moveaxis(a, 0, -1)
    return a.reshape(a.shape[:-2] + (-1,))


def _unfold(a, B):
    """(d0, ..., L*B) -> (B, d0, ..., L)."""
    a = a.reshape(a.shape[:-1] + (-1, B))
    return jnp.moveaxis(a, -1, 0)


def _pallas_fd_grad(robot: RobotModel, gravity: float, q, qd, u,
                    block_l: int = 128, interpret: bool = False):
    """fd_grad_lanes as ONE Pallas kernel per lane tile: the whole
    RNEA + Minv + 4-pass gradient pipeline stays in VMEM instead of XLA's
    many fused-kernel hops.  Shapes (n, L) -> (n, 3n, L).

    Pallas requires captured arrays be kernel inputs, and the lanes
    algorithms materialize ~100 small robot-constant arrays via
    jnp.asarray; ``jax.closure_convert`` lifts them all into explicit
    arguments, streamed in as full-array VMEM blocks (a few KB total).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = robot.n
    L = q.shape[1]
    C = lane_consts(robot, q.dtype)

    def kernel(q_ref, qd_ref, u_ref, *refs):
        const_refs = refs[:-1]
        out_ref = refs[-1]
        Ck = LaneConsts(*(r[:] for r in const_refs))
        out_ref[:] = fd_grad_lanes(robot, q_ref[:], qd_ref[:], u_ref[:],
                                   gravity, consts=Ck)

    in_spec = pl.BlockSpec((n, block_l), lambda g: (0, g),
                           memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, (lambda nd: lambda g: (0,) * nd)(c.ndim),
                                memory_space=pltpu.VMEM)
                   for c in C]
    out_spec = pl.BlockSpec((n, 3 * n, block_l), lambda g: (0, 0, g),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(L // block_l,),
        in_specs=[in_spec, in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3 * n, L), q.dtype),
        interpret=interpret,
    )(q, qd, u, *C)


def _pallas_fd(robot: RobotModel, gravity: float, q, qd, u,
               block_l: int = 128, interpret: bool = False):
    """fd_lanes as ONE Pallas kernel per lane tile (the forward-only
    sibling of _pallas_fd_grad): RNEA + Minv + the qdd contraction stay in
    VMEM.  Shapes (n, L) -> (n, L).  Used by the line-search violation
    rollout, which calls fd (not fd_grad) once per knot per ladder trial.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = robot.n
    L = q.shape[1]
    C = lane_consts(robot, q.dtype)

    def kernel(q_ref, qd_ref, u_ref, *refs):
        const_refs = refs[:-1]
        out_ref = refs[-1]
        Ck = LaneConsts(*(r[:] for r in const_refs))
        out_ref[:] = fd_lanes(robot, q_ref[:], qd_ref[:], u_ref[:],
                              gravity, consts=Ck)

    in_spec = pl.BlockSpec((n, block_l), lambda g: (0, g),
                           memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, (lambda nd: lambda g: (0,) * nd)(c.ndim),
                                memory_space=pltpu.VMEM)
                   for c in C]
    out_spec = pl.BlockSpec((n, block_l), lambda g: (0, g),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(L // block_l,),
        in_specs=[in_spec, in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, L), q.dtype),
        interpret=interpret,
    )(q, qd, u, *C)


def make_rbd_lanes(robot: RobotModel, gravity: float = -9.81,
                   use_pallas: bool = False, use_pallas_fd: bool = False):
    """Lane-folding fd / fd_grad with per-sample signatures.

    Returns (fd1, fd_grad1): fd1(q (n,), qd, u) -> (n,);
    fd_grad1 -> (n, 3n).  Any level of vmap folds into the lane axis.
    use_pallas: route fd_grad through the fused Pallas kernel when the
    folded lane count divides by 128 on TPU (XLA lanes path otherwise).
    use_pallas_fd: same routing for the forward-only fd.
    """

    def _bc(a, batched, B):
        """Unbatched args (e.g. constants under jacfwd's vmap-of-jvp) get
        broadcast so they fold like the rest."""
        return a if batched else jnp.broadcast_to(a[None], (B,) + a.shape)

    @custom_vmap
    def fd_L(q, qd, u):
        if (use_pallas_fd and jax.default_backend() == "tpu"
                and q.shape[1] % 128 == 0):
            try:
                return _pallas_fd(robot, gravity, q, qd, u)
            except ValueError:
                pass              # captured-constant limitation; fall back
        return fd_lanes(robot, q, qd, u, gravity)

    @fd_L.def_vmap
    def _fd_rule(axis_size, in_batched, q, qd, u):
        args = [_fold(_bc(a, b, axis_size))
                for a, b in zip((q, qd, u), in_batched)]
        return _unfold(fd_L(*args), axis_size), True

    @custom_vmap
    def fdg_L(q, qd, u):
        if (use_pallas and jax.default_backend() == "tpu"
                and q.shape[1] % 128 == 0):
            try:
                return _pallas_fd_grad(robot, gravity, q, qd, u)
            except ValueError:
                pass              # captured-constant limitation; fall back
        return fd_grad_lanes(robot, q, qd, u, gravity)

    @fdg_L.def_vmap
    def _fdg_rule(axis_size, in_batched, q, qd, u):
        args = [_fold(_bc(a, b, axis_size))
                for a, b in zip((q, qd, u), in_batched)]
        return _unfold(fdg_L(*args), axis_size), True

    n = robot.n

    def fd_grad1(q, qd, u):
        return fdg_L(q[:, None], qd[:, None], u[:, None])[:, :, 0]

    @jax.custom_jvp
    def fd1(q, qd, u):
        return fd_L(q[:, None], qd[:, None], u[:, None])[:, 0]

    @fd1.defjvp
    def _fd1_jvp(primals, tangents):
        # exact tangent from the analytic gradient — autodiff must NOT trace
        # into the custom_vmap (vmap-of-jvp recurses into the folding rule)
        q, qd, u = primals
        tq, tqd, tu = tangents
        out = fd1(q, qd, u)
        G = fd_grad1(q, qd, u)                       # (n, 3n)
        tang = G[:, :n] @ tq + G[:, n:2 * n] @ tqd + G[:, 2 * n:] @ tu
        return out, tang

    return fd1, fd_grad1
