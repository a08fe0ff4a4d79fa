"""Rigid-body dynamics algorithms, jit-specialized per robot.

``make_rbd(robot)`` returns a bundle of pure single-sample functions (vmap
over batch at call sites): RNEA and its analytical gradient, the analytic
joint-space inertia inverse (Carpentier), ABA, CRBA, IDSVA, and the forward
dynamics / gradient compositions the trajopt stack consumes.

Algorithmic semantics follow the reference (ref: GRiD/RBDReference/
RBDReference.py:399-930 and RBDReference_generalized.py:717-1032) but the
implementation is TPU-first:

* joint recursions are unrolled at trace time (n is static and small), so XLA
  sees a flat fused graph — the analogue of GRiD's per-robot CUDA codegen;
* the reference's per-column cross-product loops become single 6x6 matrix
  products via the bilinear identities in ``ops.spatial``;
* everything is dtype-polymorphic (f64 for CPU parity tests, f32/bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from trajoptmpcreference_tpu.models.robot import RobotModel
from trajoptmpcreference_tpu.ops import spatial


@dataclasses.dataclass(frozen=True)
class RBD:
    """Bundle of robot-specialized dynamics functions."""

    robot: RobotModel
    rnea: Callable          # (q, qd, qdd=None, gravity=-9.81) -> (c, v, a, f)
    rnea_grad: Callable     # (q, qd, qdd, gravity) -> dc_du (n, 2n)
    minv: Callable          # (q,) -> (n, n)
    crba: Callable          # (q,) -> H (n, n)
    aba: Callable           # (q, qd, tau, gravity) -> qdd (n,)
    idsva: Callable         # (q, qd, qdd, gravity) -> (dtau_dq, dtau_dqd)
    fd: Callable            # (q, qd, u, gravity) -> qdd (n,)
    fd_grad: Callable       # (q, qd, u, gravity) -> dqdd (n, 2n+n)


def _gravity_vec(gravity, dtype):
    """Fictitious base acceleration: linear z = -gravity (ref: RBDReference.py:418-420)."""
    g = jnp.zeros(6, dtype=dtype)
    return g.at[5].set(-gravity)


def make_rbd(robot: RobotModel) -> RBD:
    n = robot.n
    parent = robot.parent
    S_np = robot.S                      # (n,6) static
    I_np = robot.I_spatial              # (n,6,6) static
    damping_np = robot.damping
    subtrees = [np.array(robot.subtree(j), dtype=np.int64) for j in range(n)]

    def _X_all(q):
        return spatial.joint_transforms(robot, q)  # (n,6,6)

    def _const(arr, dtype):
        return jnp.asarray(arr, dtype=dtype)

    # ------------------------------------------------------------------ RNEA
    def rnea_fpass(q, qd, qdd=None, gravity=-9.81):
        """(ref: RBDReference.py:399-484)"""
        dtype = q.dtype
        X = _X_all(q)
        gvec = _gravity_vec(jnp.asarray(gravity, dtype), dtype)
        v, a, f = [], [], []
        for i in range(n):
            Si = _const(S_np[i], dtype)
            Ii = _const(I_np[i], dtype)
            if parent[i] == -1:
                vi = Si * qd[i]
                ai = X[i] @ gvec
            else:
                vi = X[i] @ v[parent[i]] + Si * qd[i]
                ai = X[i] @ a[parent[i]]
            ai = ai + spatial.mxS(Si, vi, qd[i])
            if qdd is not None:
                ai = ai + Si * qdd[i]
            fi = Ii @ ai + spatial.vxIv(vi, Ii)
            v.append(vi)
            a.append(ai)
            f.append(fi)
        return v, a, f

    def rnea_bpass(q, qd, f, use_damping=False):
        """(ref: RBDReference.py:486-532)"""
        dtype = q.dtype
        X = _X_all(q)
        f = list(f)
        c = [None] * n
        for i in range(n - 1, -1, -1):
            Si = _const(S_np[i], dtype)
            c[i] = Si @ f[i]
            if parent[i] != -1:
                f[parent[i]] = f[parent[i]] + X[i].T @ f[i]
        c = jnp.stack(c)
        if use_damping:
            c = c + _const(damping_np, dtype) * qd
        return c, f

    def rnea(q, qd, qdd=None, gravity=-9.81, use_damping=False):
        """Inverse dynamics (ref: RBDReference.py:534-559). Returns (c, v, a, f)
        with v/a/f stacked as (6,n) arrays."""
        v, a, f = rnea_fpass(q, qd, qdd, gravity)
        c, f = rnea_bpass(q, qd, f, use_damping)
        return c, jnp.stack(v, axis=1), jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    # --------------------------------------------------------- RNEA gradient
    def rnea_grad(q, qd, qdd=None, gravity=-9.81, use_damping=False):
        """Analytical d tau / d [q, qd], shape (n, 2n)
        (ref: RBDReference.py:561-802, four passes), with the per-column
        cross-product loops rewritten as matrix products."""
        dtype = q.dtype
        X = _X_all(q)
        gvec = _gravity_vec(jnp.asarray(gravity, dtype), dtype)
        v, a, f = rnea_fpass(q, qd, qdd, gravity)
        # re-run the backward force accumulation to get the accumulated f
        _, f_acc = rnea_bpass(q, qd, f, False)

        dv_dq, da_dq, df_dq = [], [], []
        dv_dqd, da_dqd, df_dqd = [], [], []
        for i in range(n):
            Si = _const(S_np[i], dtype)
            Ii = _const(I_np[i], dtype)
            crmS = spatial.crm(Si)
            p = parent[i]
            # --- d/dq forward pass (ref: RBDReference.py:561-632)
            if p == -1:
                dv = jnp.zeros((6, n), dtype=dtype)
                da = jnp.zeros((6, n), dtype=dtype)
                da = da.at[:, i].add(spatial.mxS(Si, X[i] @ gvec))
            else:
                dv = X[i] @ dv_dq[p]
                dv = dv.at[:, i].add(spatial.mxS(Si, X[i] @ v[p]))
                da = X[i] @ da_dq[p]
                da = da.at[:, i].add(spatial.mxS(Si, X[i] @ a[p]))
            # for c: da[:,c] += mxS(S, dv[:,c], qd_i)  ==  -qd_i * crm(S) @ dv
            da = da - qd[i] * (crmS @ dv)
            Iv = Ii @ v[i]
            df = Ii @ da + spatial.icrf(Iv) @ dv + spatial.crf(v[i]) @ (Ii @ dv)
            dv_dq.append(dv)
            da_dq.append(da)
            df_dq.append(df)
            # --- d/dqd forward pass (ref: RBDReference.py:634-695)
            if p == -1:
                dvd = jnp.zeros((6, n), dtype=dtype)
                dad = jnp.zeros((6, n), dtype=dtype)
            else:
                dvd = X[i] @ dv_dqd[p]
                dad = X[i] @ da_dqd[p]
            dvd = dvd.at[:, i].add(Si)
            dad = dad - qd[i] * (crmS @ dvd)
            dad = dad.at[:, i].add(spatial.mxS(Si, v[i]))
            dfd = Ii @ dad + spatial.icrf(Iv) @ dvd + spatial.crf(v[i]) @ (Ii @ dvd)
            dv_dqd.append(dvd)
            da_dqd.append(dad)
            df_dqd.append(dfd)

        # --- backward passes (ref: RBDReference.py:697-772)
        dc_dq_rows = [None] * n
        dc_dqd_rows = [None] * n
        df_dq = list(df_dq)
        df_dqd = list(df_dqd)
        for i in range(n - 1, -1, -1):
            Si = _const(S_np[i], dtype)
            dc_dq_rows[i] = Si @ df_dq[i]
            dc_dqd_rows[i] = Si @ df_dqd[i]
            p = parent[i]
            if p != -1:
                upd_q = X[i].T @ df_dq[i]
                upd_q = upd_q.at[:, i].add(X[i].T @ spatial.fxS(Si, f_acc[i]))
                df_dq[p] = df_dq[p] + upd_q
                df_dqd[p] = df_dqd[p] + X[i].T @ df_dqd[i]
        dc_dq = jnp.stack(dc_dq_rows)
        dc_dqd = jnp.stack(dc_dqd_rows)
        if use_damping:
            dc_dqd = dc_dqd + jnp.diag(_const(damping_np, dtype))
        return jnp.concatenate([dc_dq, dc_dqd], axis=1)

    # --------------------------------------------------------- analytic Minv
    def minv(q, output_dense=True):
        """Analytic inverse of the joint-space inertia matrix (Carpentier)
        (ref: RBDReference.py:805-930)."""
        dtype = q.dtype
        X = _X_all(q)
        Minv = jnp.zeros((n, n), dtype=dtype)
        F = [jnp.zeros((6, n), dtype=dtype) for _ in range(n)]
        U = [None] * n
        Dinv = [None] * n
        IA = [_const(I_np[i], dtype) for i in range(n)]
        # backward pass
        for i in range(n - 1, -1, -1):
            Si = _const(S_np[i], dtype)
            sub = subtrees[i]
            U[i] = IA[i] @ Si
            Dinv[i] = 1.0 / (Si @ U[i])
            Minv = Minv.at[i, i].set(Dinv[i])
            Minv = Minv.at[i, sub].add(-Dinv[i] * (Si @ F[i][:, sub]))
            p = parent[i]
            if p != -1:
                F[i] = F[i].at[:, sub].add(jnp.outer(U[i], Minv[i, sub]))
                F[p] = F[p].at[:, sub].add(X[i].T @ F[i][:, sub])
                Ia = IA[i] - jnp.outer(U[i], Dinv[i] * U[i])
                IA[p] = IA[p] + X[i].T @ (Ia @ X[i])
        # forward pass
        for i in range(n):
            Si = _const(S_np[i], dtype)
            p = parent[i]
            if p != -1:
                Minv = Minv.at[i, i:].add(
                    -Dinv[i] * ((U[i] @ X[i]) @ F[p][:, i:])
                )
            Fi = jnp.outer(Si, Minv[i, i:])
            if p != -1:
                Fi = Fi + X[i] @ F[p][:, i:]
            F[i] = F[i].at[:, i:].set(Fi)
        if output_dense:
            # mirror the upper triangle into the lower (ref: RBDReference.py:921-928)
            iu = jnp.triu_indices(n)
            full = jnp.zeros((n, n), dtype=dtype).at[iu].set(Minv[iu])
            Minv = full + jnp.triu(full, 1).T
        return Minv

    # ------------------------------------------------------------------ CRBA
    def crba(q):
        """Composite-rigid-body mass matrix H
        (ref: RBDReference_generalized.py:1000-1032)."""
        dtype = q.dtype
        X = _X_all(q)
        IC = [_const(I_np[i], dtype) for i in range(n)]
        for i in range(n - 1, -1, -1):
            p = parent[i]
            if p != -1:
                IC[p] = IC[p] + X[i].T @ IC[i] @ X[i]
        H = jnp.zeros((n, n), dtype=dtype)
        for i in range(n):
            Si = _const(S_np[i], dtype)
            fh = IC[i] @ Si
            H = H.at[i, i].set(Si @ fh)
            j = i
            while parent[j] > -1:
                fh = X[j].T @ fh
                j = parent[j]
                Sj = _const(S_np[j], dtype)
                hij = Sj @ fh
                H = H.at[i, j].set(hij)
                H = H.at[j, i].set(hij)
        return H

    # ------------------------------------------------------------------- ABA
    def aba(q, qd, tau, gravity=-9.81):
        """Articulated-body forward dynamics
        (ref: RBDReference_generalized.py:913-998)."""
        dtype = q.dtype
        X = _X_all(q)
        gvec = _gravity_vec(jnp.asarray(gravity, dtype), dtype)
        v, cvel = [], []
        IA = [_const(I_np[i], dtype) for i in range(n)]
        pA = [None] * n
        for i in range(n):
            Si = _const(S_np[i], dtype)
            p = parent[i]
            if p == -1:
                vi = Si * qd[i]
                ci = jnp.zeros(6, dtype=dtype)
            else:
                vi = X[i] @ v[p] + Si * qd[i]
                ci = spatial.mxS(Si, vi, qd[i])
            v.append(vi)
            cvel.append(ci)
            pA[i] = spatial.crf(vi) @ (IA[i] @ vi)
        U = [None] * n
        d = [None] * n
        u = [None] * n
        for i in range(n - 1, -1, -1):
            Si = _const(S_np[i], dtype)
            p = parent[i]
            U[i] = IA[i] @ Si
            d[i] = Si @ U[i]
            u[i] = tau[i] - Si @ pA[i]
            if p != -1:
                Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
                pa = pA[i] + Ia @ cvel[i] + U[i] * (u[i] / d[i])
                IA[p] = IA[p] + X[i].T @ Ia @ X[i]
                pA[p] = pA[p] + X[i].T @ pa
        a = [None] * n
        qdd = [None] * n
        for i in range(n):
            Si = _const(S_np[i], dtype)
            p = parent[i]
            if p == -1:
                ai = X[i] @ gvec + cvel[i]
            else:
                ai = X[i] @ a[p] + cvel[i]
            qdd[i] = (u[i] - U[i] @ ai) / d[i]
            a[i] = ai + qdd[i] * Si
        return jnp.stack(qdd)

    # ----------------------------------------------------------------- IDSVA
    def idsva(q, qd, qdd=None, gravity=-9.81):
        """Spatial-vector-algebra ID derivatives (Singh/Russel/Wensing)
        (ref: RBDReference_generalized.py:717-826)."""
        dtype = q.dtype
        X = _X_all(q)
        gvec = _gravity_vec(jnp.asarray(gravity, dtype), dtype)
        v = [None] * n
        a = [None] * n
        f = [None] * n
        Xup0 = [None] * n
        Sw = [None] * n   # world-frame S
        Sd = [None] * n
        Sdd = [None] * n
        Sj = [None] * n
        IC = [None] * n
        BC = [None] * n
        for i in range(n):
            p = parent[i]
            if p == -1:
                Xup0[i] = X[i]
                vi = jnp.zeros(6, dtype=dtype)
                ai = X[i] @ gvec
            else:
                Xup0[i] = X[i] @ Xup0[p]
                vi = v[p]
                ai = a[p]
            Xdown = spatial.spatial_inv(Xup0[i])
            Si = Xdown @ _const(S_np[i], dtype)
            Sw[i] = Si
            Sd[i] = spatial.crm(vi) @ Si
            Sdd[i] = spatial.crm(ai) @ Si + spatial.crm(vi) @ Sd[i]
            Sj[i] = 2.0 * Sd[i] + spatial.crm(Si * qd[i]) @ Si
            crm_v = spatial.crm(vi)
            vi = vi + Si * qd[i]
            ai = ai + crm_v @ Si * qd[i]
            if qdd is not None:
                ai = ai + Si * qdd[i]
            v[i] = vi
            a[i] = ai
            Ii = Xup0[i].T @ (_const(I_np[i], dtype) @ Xup0[i])
            IC[i] = Ii
            f[i] = Ii @ ai + spatial.crf(vi) @ (Ii @ vi)
            BC[i] = (spatial.crf(vi) @ Ii + spatial.icrf(Ii @ vi)
                     - Ii @ spatial.crm(vi))
        t1 = [None] * n
        t2 = [None] * n
        t3 = [None] * n
        t4 = [None] * n
        dtau_dq = jnp.zeros((n, n), dtype=dtype)
        dtau_dqd = jnp.zeros((n, n), dtype=dtype)
        for i in range(n - 1, -1, -1):
            t1[i] = IC[i] @ Sw[i]
            t2[i] = BC[i] @ Sw[i] + IC[i] @ Sj[i]
            t3[i] = BC[i] @ Sd[i] + IC[i] @ Sdd[i] + spatial.icrf(f[i]) @ Sw[i]
            t4[i] = BC[i].T @ Sw[i]
            sub = subtrees[i]
            sub_strict = sub[1:]
            if len(sub_strict):
                T3 = jnp.stack([t3[k] for k in sub_strict], axis=1)
                dtau_dq = dtau_dq.at[i, sub_strict].set(Sw[i] @ T3)
                T2 = jnp.stack([t2[k] for k in sub_strict], axis=1)
                dtau_dqd = dtau_dqd.at[i, sub_strict].set(Sw[i] @ T2)
            T1 = jnp.stack([t1[k] for k in sub], axis=1)
            T4 = jnp.stack([t4[k] for k in sub], axis=1)
            dtau_dq = dtau_dq.at[sub, i].set(Sdd[i] @ T1 + Sd[i] @ T4)
            dtau_dqd = dtau_dqd.at[sub, i].set(Sj[i] @ T1 + Sw[i] @ T4)
            p = parent[i]
            if p >= 0:
                IC[p] = IC[p] + IC[i]
                BC[p] = BC[p] + BC[i]
                f[p] = f[p] + f[i]
        return dtau_dq, dtau_dqd

    # ------------------------------------------------- forward dynamics (FD)
    def fd(q, qd, u, gravity=-9.81):
        """qdd = Minv @ (u - c) (ref: TrajoptPlant.py:283-299)."""
        c, _, _, _ = rnea(q, qd, None, gravity)
        return minv(q) @ (u - c)

    def fd_grad(q, qd, u, gravity=-9.81):
        """dqdd/d[q,qd,u] = [-Minv dc_dq, -Minv dc_dqd, Minv], shape (n, 3n)
        (ref: TrajoptPlant.py:301-323)."""
        c, _, _, _ = rnea(q, qd, None, gravity)
        Mi = minv(q)
        qdd = Mi @ (u - c)
        dc_du = rnea_grad(q, qd, qdd, gravity)
        df_dx = -(Mi @ dc_du)
        return jnp.concatenate([df_dx, Mi], axis=1)

    return RBD(
        robot=robot,
        rnea=rnea,
        rnea_grad=rnea_grad,
        minv=minv,
        crba=crba,
        aba=aba,
        idsva=idsva,
        fd=fd,
        fd_grad=fd_grad,
    )
