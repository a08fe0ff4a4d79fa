"""KKT system construction and linear solves for the SQP subproblem.

The reference builds one dense KKT matrix by looping over knots and growing
the constraint rows with the active set (ref: TrajoptMPCReference.py:
118-271, 313-455).  TPU-first re-design:

* per-knot blocks (cost Hessian/gradient, dynamics Jacobians, defects, hard
  constraint rows) are built with ONE vmap over knots — no Python-level knot
  loop in the hot path;
* the active set is a boolean mask over statically-shaped rows; inactive
  rows are zeroed and their multipliers pinned to zero through a -1 diagonal
  in the (otherwise zero) lower-right KKT block — algebraically identical to
  deleting the rows, but shape-stable under jit;
* the Schur complement S = D - C G^-1 C^T is never materialized densely: with
  row groups [dynamics defect; hard rows] per knot it is block-tridiagonal
  with block size bs = nx + m_hard, assembled as batched small matmuls and
  solved by block-Thomas or PCG (ops.btridiag).

Variable layout matches the reference: z = [x_0,u_0, ..., x_{N-2},u_{N-2},
x_{N-1}]; the terminal knot is padded to full width n = nx+nu with decoupled
unit-diagonal entries so every knot has uniform shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trajoptmpcreference_tpu.models.plants import Plant
from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    btd_block_thomas,
    btd_cyclic_reduction,
    btd_matvec,
    pcg,
    preconditioner,
    _bmm,
    _bmv,
    _solve_batched,
)
from trajoptmpcreference_tpu.solvers import constraints as C
from trajoptmpcreference_tpu.solvers.costs import Cost


class KKTBlocks(NamedTuple):
    """Per-knot blocks; all leading axis N (terminal knot padded)."""

    H: jnp.ndarray        # (N, n, n) cost Hessian (+ soft GN term), padded
    g: jnp.ndarray        # (N, n) cost gradient (+ soft term), padded
    A: jnp.ndarray        # (N-1, nx, nx) dynamics d x_{k+1} / d x_k
    B: jnp.ndarray        # (N-1, nx, nu)
    defect: jnp.ndarray   # (N, nx): [x_0 - xs, x_{k+1} - f(x_k, u_k)...]
    hval: jnp.ndarray     # (N, m) masked hard-constraint values
    hjac: jnp.ndarray     # (N, m, n) masked hard-constraint jacobians
    hact: jnp.ndarray     # (N, m) bool activity mask


class SchurSolveStats(NamedTuple):
    pcg_iters: jnp.ndarray
    pcg_converged: jnp.ndarray
    # per-iteration PCG dual trace (the reference's (trace, trace2),
    # ref: GBD-PCG-Python/PCG.py:82-95): |nu| and TRUE |gamma - S lam|
    # histories, (max_iter+1,) — populated only when solve_schur is called
    # with trace_residual=True on the XLA PCG path; None otherwise
    nu_trace: Optional[jnp.ndarray] = None
    res_trace: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class KKTSystem:
    """Factory product: all solvers for one (plant, cost, constraints, N, dt)."""

    plant: Plant
    cost: Cost
    cset: C.ConstraintSet
    N: int
    dt: float
    # route the Schur PCG through the fused Pallas kernel
    # (ops/pallas_pcg): the whole Krylov loop runs on-chip with the Schur
    # blocks resident in VMEM instead of ~6 XLA kernels + HBM round-trips
    # per iteration.  Off-TPU this transparently runs the interpreter.
    #
    # Measured (round 4, 150-step B=512 MPC bench, PCG-SS 4 iters): the
    # fused kernel beats the XLA loop end-to-end — 13,737 vs 10,774
    # solves/s (+27.5%) at BETTER tracking (421 vs 375 stable, 0.359 vs
    # 0.505 m median).  Two round-3 fixes made this true: the bf16
    # preconditioner's noise floor no longer poisons the exit metric
    # (true-residual exit when pdiag dtype != operand dtype, see
    # ops/pallas_pcg._pcg_kernel), and the round-4 axon compiler fixed
    # the memory-space-assignment CHECK failure that blocked nesting the
    # kernel in the MPC graph (bench_history_r2.md bisection;
    # bench_history_r4.md finding 8).  Library default stays False for
    # portability (off-TPU this would run the interpreter); the bench
    # turns it on for TPU PCG runs.  The flagship still solves exactly
    # (method "S"/cr) — PCG is the long-horizon / sharded alternative.
    use_pallas_pcg: bool = False
    # exact Schur solver for the non-PCG path (method "S"):
    #   "thomas"    — sequential block LU scan (O(N) dependency chain);
    #   "cr"        — block cyclic reduction (log2(N) levels of batched
    #                 block ops; the TPU-parallel exact solve — see
    #                 ops.btridiag.btd_cyclic_reduction)
    #   "cr_refine" — cr + ONE iterative-refinement step (2x the CR
    #                 work).  Helps only in the MILD-conditioning regime
    #                 (kappa * eps_f32 < 1): on the cold-start flagship
    #                 systems (kappa ~ 1e7-1e9) same-precision refinement
    #                 AMPLIFIES the residual and the closed loop tracks
    #                 worse than cold-Thomas (measured:
    #                 analysis/horizon_scaling_tpu.md,
    #                 bench_history_r5.md finding 12)
    exact_schur: str = "thomas"

    # ---- static sizes ----
    @property
    def nx(self) -> int:
        return self.plant.nx

    @property
    def nu(self) -> int:
        return self.plant.nu

    @property
    def n(self) -> int:
        return self.nx + self.nu

    @property
    def m(self) -> int:
        """Hard rows per knot (stage count; terminal padded up to it)."""
        return self.cset.hard_rows_stage

    @property
    def bs(self) -> int:
        return self.nx + self.m

    # ------------------------------------------------------------- blocks
    def form_blocks(self, X, U, xs, cost_params, cstate) -> KKTBlocks:
        """Build all per-knot KKT blocks (ref: TrajoptMPCReference.py:118-271),
        with a single vmap over stage knots."""
        N, nx, nu, n, m = self.N, self.nx, self.nu, self.n, self.m
        plant, cost, cs = self.plant, self.cost, self.cset
        dtype = X.dtype
        ks = jnp.arange(N - 1)
        Xs = X[:, :-1].T   # (N-1, nx)
        Us = U.T           # (N-1, nu)

        has_soft = cs.has_soft()

        def stage(x, u, k):
            H = cost.stage_hessian(cost_params, x, u, k)
            g = cost.stage_gradient(cost_params, x, u, k)
            if has_soft:
                gc = C.stage_soft_jacobian(cs, cstate, x, u, k)
                g = g + gc
                H = H + jnp.outer(gc, gc)  # GN soft term (ref: :149-150)
            A, B = plant.step_gradient(x, u, self.dt)
            xkp1 = plant.step(x, u, self.dt)
            hv, hj, ha = C.stage_hard_rows(cs, x, u, terminal=False)
            return H, g, A, B, xkp1, hv, hj, ha

        H_s, g_s, A_s, B_s, xpred, hv_s, hj_s, ha_s = jax.vmap(stage)(Xs, Us, ks)

        # terminal knot (ref: :176-198), padded to width n
        xN = X[:, -1]
        kN = jnp.asarray(N - 1)
        H_N = cost.term_hessian(cost_params, xN, kN)
        g_N = cost.term_gradient(cost_params, xN, kN)
        if has_soft:
            gcN = C.term_soft_jacobian(cs, cstate, xN, kN)
            g_N = g_N + gcN
            H_N = H_N + jnp.outer(gcN, gcN)
        hvN, hjN, haN = C.stage_hard_rows(cs, xN, None, terminal=True)
        mt = hvN.shape[0]

        # pad terminal H with unit diagonal on the phantom control vars
        H_pad = jnp.eye(n, dtype=dtype).at[:nx, :nx].set(H_N)
        g_pad = jnp.zeros(n, dtype=dtype).at[:nx].set(g_N)
        H = jnp.concatenate([H_s, H_pad[None]], axis=0)
        g = jnp.concatenate([g_s, g_pad[None]], axis=0)

        # defects: row 0 is the initial-state constraint (ref: :137-138)
        defect = jnp.concatenate(
            [(X[:, 0] - xs)[None], (X[:, 1:].T - xpred)], axis=0)  # (N, nx)

        # hard rows, terminal group padded to m rows / n cols (inactive)
        hvN_p = jnp.zeros(m, dtype=dtype).at[:mt].set(hvN)
        hjN_p = jnp.zeros((m, n), dtype=dtype).at[:mt, :nx].set(hjN)
        haN_p = jnp.zeros(m, dtype=bool).at[:mt].set(haN)
        hval = jnp.concatenate([hv_s, hvN_p[None]], axis=0)
        hjac = jnp.concatenate([hj_s, hjN_p[None]], axis=0)
        hact = jnp.concatenate([ha_s, haN_p[None]], axis=0)
        return KKTBlocks(H, g, A_s, B_s, defect, hval, hjac, hact)

    # --------------------------------------------- row-group jacobians E, F
    def _EF(self, blocks: KKTBlocks):
        """Row group k = [defect rows (nx); hard rows (m)] has jacobian
        E_k over knot k-1 vars and F_k over knot k vars."""
        N, nx, nu, n, m, bs = self.N, self.nx, self.nu, self.n, self.m, self.bs
        dtype = blocks.H.dtype
        # E_k: defect rows [-A_{k-1}, -B_{k-1}], hard rows 0; E_0 = 0
        E_dyn = jnp.concatenate([-blocks.A, -blocks.B], axis=2)  # (N-1, nx, n)
        E = jnp.zeros((N, bs, n), dtype=dtype).at[1:, :nx, :].set(E_dyn)
        # F_k: defect rows [I, 0]; hard rows J_k
        I_x = jnp.zeros((nx, n), dtype=dtype).at[:, :nx].set(jnp.eye(nx, dtype=dtype))
        F = jnp.broadcast_to(
            jnp.concatenate([I_x, jnp.zeros((m, n), dtype=dtype)], axis=0),
            (N, bs, n)).at[:, nx:, :].set(blocks.hjac)
        # rhs rows and diagonal D (0 live rows, -1 pinned multipliers)
        rhs = jnp.concatenate([blocks.defect, blocks.hval], axis=1)  # (N, bs)
        live = jnp.concatenate(
            [jnp.ones((N, nx), dtype=bool), blocks.hact], axis=1)
        D = jnp.where(live, 0.0, -1.0).astype(dtype)                 # (N, bs)
        return E, F, rhs, D

    def _regularized_G(self, blocks: KKTBlocks, rho):
        """G = H + rho I on the real decision variables; the phantom
        terminal-control block keeps its exact unit diagonal (those vars are
        decoupled from every constraint row, so their dxu is exactly 0 either
        way — this just keeps the padding invisible to the conditioning)."""
        n, nx = self.n, self.nx
        dtype = blocks.H.dtype
        G = blocks.H + rho * jnp.eye(n, dtype=dtype)[None]
        return G.at[-1, nx:, nx:].set(jnp.eye(self.nu, dtype=dtype))

    def _g_split(self) -> Optional[int]:
        """nx when G is statically (x, u)-block-diagonal (separable cost
        Hessian, no soft-constraint outer(gc, gc) term mixing x/u rows),
        else None for the dense-block inverse.  Soft constraints that touch
        only x-slices or only u-slices (e.g. a torque AL limit) keep the
        blocks separable — their GN term lands entirely in one partition."""
        if getattr(self.cost, "xu_coupled", False):
            return None
        if self.cset.has_soft() and not self.cset.soft_xu_separable():
            return None
        return self.nx

    # ----------------------------------------------------------- dense KKT
    def solve_dense(self, blocks: KKTBlocks, rho) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Assemble and solve the full dense KKT system
        (ref: solveKKTSystem, TrajoptMPCReference.py:313-359).

        Returns (dxu (N, n) with the terminal tail zero-padded, lam (N, bs)).
        """
        N, nx, n, bs = self.N, self.nx, self.n, self.bs
        dtype = blocks.H.dtype
        T = N * n
        M = N * bs
        E, F, rhs, D = self._EF(blocks)
        G = self._regularized_G(blocks, rho)
        # vectorized block assembly — three batched scatters instead of an
        # O(N) Python loop of .at[].set (which unrolled to N compile-time
        # scatter ops and dominated the method-"N" compile at N=64)
        ar = jnp.arange(N)
        Gxx = jnp.zeros((N, N, n, n), dtype=dtype).at[ar, ar].set(G)
        Gxx = jnp.moveaxis(Gxx, 2, 1).reshape(T, T)      # (N,n,N,n) -> (T,T)
        # constraint jacobian rows: F on the diagonal, E one block left
        C_blk = jnp.zeros((N, N, bs, n), dtype=dtype).at[ar, ar].set(F)
        C_blk = C_blk.at[ar[1:], ar[:-1]].set(E[1:])
        Cmat = jnp.moveaxis(C_blk, 2, 1).reshape(M, T)   # (N,bs,N,n) -> (M,T)
        KKT = jnp.concatenate([
            jnp.concatenate([Gxx, Cmat.T], axis=1),
            jnp.concatenate([Cmat, jnp.zeros((M, M), dtype=dtype)], axis=1),
        ], axis=0)
        dj = jnp.arange(T, T + M)
        KKT = KKT.at[dj, dj].set(D.reshape(-1))
        kkt = jnp.concatenate([blocks.g.reshape(-1), rhs.reshape(-1)])
        sol = jnp.linalg.solve(KKT, kkt)
        # lstsq fallback on singular systems (ref: :353-357)
        bad = ~jnp.all(jnp.isfinite(sol))
        sol = jax.lax.cond(
            bad,
            lambda: _lstsq(KKT, kkt),
            lambda: sol,
        )
        dxu = sol[:T].reshape(N, n)
        lam = sol[T:].reshape(N, bs)
        return dxu, lam, bad

    # ---------------------------------------------------------- Schur path
    def schur_blocks(self, blocks: KKTBlocks, rho):
        """Assemble S = D - C G^-1 C^T as a BlockTridiag plus gamma
        (ref: solveKKTSystem_Schur, TrajoptMPCReference.py:417-424), using
        only batched per-knot matmuls."""
        N, n = self.N, self.n
        E, F, rhs, D = self._EF(blocks)
        G = self._regularized_G(blocks, rho)
        invG = _inv_psd(G, split_at=self._g_split())
        ET = jnp.swapaxes(E, -1, -2)
        FT = jnp.swapaxes(F, -1, -2)
        # S_kk = D_k - E_k invG_{k-1} E_k^T - F_k invG_k F_k^T
        EiE = _bmm(_bmm(E[1:], invG[:-1]), ET[1:])
        FiF = _bmm(_bmm(F, invG), FT)
        Sd = jax.vmap(jnp.diag)(D) - FiF
        Sd = Sd.at[1:].add(-EiE)
        # S is mathematically symmetric but the f32 E invG E^T products
        # leave ~1e-4 relative asymmetry (Gauss-Jordan invG is not exactly
        # symmetric); CG assumes symmetry, and the packed-symmetric Pallas
        # kernel silently symmetrizes — make it explicit so every linear
        # path (XLA PCG, block-Thomas, fused kernel, sharded) solves the
        # SAME operator.
        Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))
        # S_{k,k+1} = -F_k invG_k E_{k+1}^T
        So = -_bmm(_bmm(F[:-1], invG[:-1]), ET[1:])
        # gamma_k = rhs_k - E_k invG_{k-1} g_{k-1} - F_k invG_k g_k
        gam = rhs - _bmv(F, _bmv(invG, blocks.g))
        gam = gam.at[1:].add(-_bmv(E[1:], _bmv(invG[:-1], blocks.g[:-1])))
        return BlockTridiag(Sd, So), gam, invG, E, F

    def recover_dxu(self, invG, E, F, blocks: KKTBlocks, lam):
        """dxu = G^-1 (g - C^T lam) blockwise (ref: :449-452)."""
        rhs = blocks.g - jnp.sum(F * lam[..., :, None], axis=-2)
        rhs = rhs.at[:-1].add(-jnp.sum(E[1:] * lam[1:, :, None], axis=-2))
        return _bmv(invG, rhs)

    # ------------------------------------- structure-exploiting Schur path
    def _can_split_schur(self) -> bool:
        """The assembly collapses when there are no hard-constraint rows
        (row group k = the nx defect rows only, F_k = [I 0], E_k =
        [-A_{k-1} -B_{k-1}]) and G is (x, u)-block-diagonal."""
        return self.m == 0 and self._g_split() is not None

    def _schur_blocks_split(self, blocks: KKTBlocks, rho):
        """schur_blocks specialized to _can_split_schur():

          S_kk    = -iGxx_k - A_{k-1} iGxx_{k-1} A^T - B_{k-1} iGuu_{k-1} B^T
          S_k,k+1 =  iGxx_k A_k^T
          gam_k   = rhs_k - iGxx_k gx_k
                    + A_{k-1} iGxx_{k-1} gx_{k-1} + B_{k-1} iGuu_{k-1} gu_{k-1}

        — every (nx+nu)-dim product in the generic path shrinks to nx/nu
        blocks and the padded 18x18 invG is never materialized.  Same
        operator as schur_blocks to rounding (equality test:
        tests/test_btridiag.py::test_split_schur_matches_generic)."""
        nx, nu = self.nx, self.nu
        dtype = blocks.H.dtype
        eye_x = jnp.eye(nx, dtype=dtype)
        eye_u = jnp.eye(nu, dtype=dtype)
        Hxx = blocks.H[:, :nx, :nx] + rho * eye_x[None]
        Huu = blocks.H[:, nx:, nx:] + rho * eye_u[None]
        Huu = Huu.at[-1].set(eye_u)      # phantom terminal controls
        iGxx = _solve_batched(Hxx, jnp.broadcast_to(eye_x, Hxx.shape),
                              spd=True)
        iGuu = _solve_batched(Huu, jnp.broadcast_to(eye_u, Huu.shape),
                              spd=True)
        iGxx = 0.5 * (iGxx + jnp.swapaxes(iGxx, -1, -2))
        iGuu = 0.5 * (iGuu + jnp.swapaxes(iGuu, -1, -2))

        A, B = blocks.A, blocks.B        # (N-1, nx, nx/nu)
        AT = jnp.swapaxes(A, -1, -2)
        BT = jnp.swapaxes(B, -1, -2)
        iGA = _bmm(iGxx[:-1], AT)        # iGxx_k A_k^T  (N-1, nx, nx)
        iGB = _bmm(iGuu[:-1], BT)        # iGuu_k B_k^T  (N-1, nu, nx)
        Sd = -iGxx
        Sd = Sd.at[1:].add(-_bmm(A, iGA) - _bmm(B, iGB))
        Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))   # see schur_blocks note
        So = iGA

        gx, gu = blocks.g[:, :nx], blocks.g[:, nx:]
        rhs = blocks.defect
        gam = rhs - _bmv(iGxx, gx)
        gam = gam.at[1:].add(_bmv(A, _bmv(iGxx[:-1], gx[:-1]))
                             + _bmv(B, _bmv(iGuu[:-1], gu[:-1])))
        return BlockTridiag(Sd, So), gam, iGxx, iGuu

    def _recover_dxu_split(self, iGxx, iGuu, blocks: KKTBlocks, lam):
        """recover_dxu for the split path:
        dxu_x = iGxx (gx - lam_k + A_k^T lam_{k+1}),
        dxu_u = iGuu (gu + B_k^T lam_{k+1})."""
        nx = self.nx
        gx, gu = blocks.g[:, :nx], blocks.g[:, nx:]
        rx = gx - lam
        rx = rx.at[:-1].add(_bmv(jnp.swapaxes(blocks.A, -1, -2), lam[1:]))
        ru = gu.at[:-1].add(_bmv(jnp.swapaxes(blocks.B, -1, -2), lam[1:]))
        return jnp.concatenate([_bmv(iGxx, rx), _bmv(iGuu, ru)], axis=-1)

    # --------------------------- condensed (structure-exploiting) hard rows
    def _can_condense_hard(self) -> bool:
        """Hard-constraint rows are stage-local (their row jacobian touches
        only knot k's variables, ref: TrajoptConstraint.py:92-113), so in
        the Schur system each knot's hard multipliers couple only to the
        defect multipliers at knots k and k+1 — they can be eliminated
        per-knot by one batched (m, m) solve, leaving a block-tridiagonal
        core of size nx (the UNCONSTRAINED block size) instead of carrying
        bs = nx + m through every O(bs^3) assembly/elimination/recovery
        step.  Requires the (x, u)-separable G the split path uses.

        ACTIVE_SET only: FULL_SET keeps both signed rows of every box live
        (ref: TrajoptConstraint.py:64-68), which makes W — like the full
        KKT system itself — exactly singular (the +/- row pair is linearly
        dependent); that degenerate mode stays on the generic path, whose
        behavior (garbage-in-singular, lstsq fallback for method N) matches
        the reference's."""
        return (self.m > 0 and self._g_split() is not None
                and all(l.mode == "ACTIVE_SET"
                        for l in self.cset.hard_limits))

    def _schur_blocks_condensed(self, blocks: KKTBlocks, rho):
        """Schur assembly with the hard rows condensed out.

        Row blocks (generic path order [defect; hard] per knot):
          S[d_k, h_k]     = -P_k,  P_k = iGxx_k Jx_k^T
          S[d_{k+1}, h_k] =  Q_k,  Q_k = A_k iGxx_k Jx_k^T + B_k iGuu_k Ju_k^T
          S[h_k, h_k]     = -W_k,  W_k = Jx iGxx Jx^T + Ju iGuu Ju^T
                                         + diag(1 on inactive rows)
        and S[h_k, *] is zero elsewhere (hard rows have no E part).
        Eliminating lam_h (the Schur complement of the ND block -W in the
        ND S, so the core stays negative definite):

          S'_dd[k]     += P_k W_k^-1 P_k^T + Q_{k-1} W_{k-1}^-1 Q_{k-1}^T
          S'_d,k(k+1)  -= P_k W_k^-1 Q_k^T
          gam'_k       -= P_k W_k^-1 gh_k - Q_{k-1} W_{k-1}^-1 gh_{k-1}
          gh_k          = hval_k - J_k invG_k g_k

        Inactive rows are masked (J = 0, hval = 0, W = 1 on the diagonal),
        which pins their multipliers to zero exactly as the generic path's
        -1 diagonal does — but OUTSIDE the block elimination, so pinned
        rows never sit in the same f32 pivoting as AL-inflated cost blocks
        (the round-4 stacked-AS+AL divergence mechanism).  Equality with
        the generic operator: tests/test_btridiag.py::
        test_condensed_schur_matches_generic."""
        nx, m = self.nx, self.m
        S, gam, iGxx, iGuu = self._schur_blocks_split(blocks, rho)
        Sd, So = S.diag, S.upper
        Jx = blocks.hjac[:, :, :nx]          # (N, m, nx)
        Ju = blocks.hjac[:, :, nx:]          # (N, m, nu)
        JxT = jnp.swapaxes(Jx, -1, -2)
        JuT = jnp.swapaxes(Ju, -1, -2)
        P = _bmm(iGxx, JxT)                  # (N, nx, m)
        Uu = _bmm(iGuu, JuT)                 # (N, nu, m)
        W = _bmm(Jx, P) + _bmm(Ju, Uu)       # (N, m, m)
        inact = (~blocks.hact).astype(W.dtype)
        dj = jnp.arange(m)
        W = W.at[:, dj, dj].add(inact)
        W = 0.5 * (W + jnp.swapaxes(W, -1, -2))
        iW = _inv_psd(W)
        iW = 0.5 * (iW + jnp.swapaxes(iW, -1, -2))
        Q = _bmm(blocks.A, P[:-1]) + _bmm(blocks.B, Uu[:-1])  # (N-1, nx, m)
        gx, gu = blocks.g[:, :nx], blocks.g[:, nx:]
        gh = blocks.hval - _bmv(Jx, _bmv(iGxx, gx)) - _bmv(Ju, _bmv(iGuu, gu))
        PiW = _bmm(P, iW)                    # (N, nx, m)
        QiW = _bmm(Q, iW[:-1])               # (N-1, nx, m)
        Sd = Sd + _bmm(PiW, jnp.swapaxes(P, -1, -2))
        Sd = Sd.at[1:].add(_bmm(QiW, jnp.swapaxes(Q, -1, -2)))
        Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))
        So = So - _bmm(PiW[:-1], jnp.swapaxes(Q, -1, -2))
        gam = gam - _bmv(PiW, gh)
        gam = gam.at[1:].add(_bmv(QiW, gh[:-1]))
        aux = (iGxx, iGuu, P, Q, iW, gh)
        return BlockTridiag(Sd, So), gam, aux

    def _recover_condensed(self, blocks: KKTBlocks, aux, lam_d):
        """Back out the hard multipliers then dxu:

          lam_h,k = W_k^-1 (-gh_k - P_k^T lam_d,k + Q_k^T lam_d,k+1)
          rx_k    = gx_k - lam_d,k + A_k^T lam_d,k+1 - Jx_k^T lam_h,k
          ru_k    = gu_k + B_k^T lam_d,k+1 - Ju_k^T lam_h,k

        Returns (dxu (N, n), lam (N, bs) in the generic [defect; hard]
        row layout, so MPC warm-start carries are path-independent)."""
        nx = self.nx
        iGxx, iGuu, P, Q, iW, gh = aux
        r = -gh - _bmv(jnp.swapaxes(P, -1, -2), lam_d)
        r = r.at[:-1].add(_bmv(jnp.swapaxes(Q, -1, -2), lam_d[1:]))
        lam_h = _bmv(iW, r)                  # (N, m)
        Jx = blocks.hjac[:, :, :nx]
        Ju = blocks.hjac[:, :, nx:]
        gx, gu = blocks.g[:, :nx], blocks.g[:, nx:]
        rx = gx - lam_d - _bmv(jnp.swapaxes(Jx, -1, -2), lam_h)
        rx = rx.at[:-1].add(_bmv(jnp.swapaxes(blocks.A, -1, -2), lam_d[1:]))
        ru = gu - _bmv(jnp.swapaxes(Ju, -1, -2), lam_h)
        ru = ru.at[:-1].add(_bmv(jnp.swapaxes(blocks.B, -1, -2), lam_d[1:]))
        dxu = jnp.concatenate([_bmv(iGxx, rx), _bmv(iGuu, ru)], axis=-1)
        return dxu, jnp.concatenate([lam_d, lam_h], axis=-1)

    def solve_schur(self, blocks: KKTBlocks, rho,
                    use_pcg: bool = False,
                    pcg_tol: float = 1e-6,
                    pcg_max_iter: int = 100,
                    precond: str = "SS",
                    guess: Optional[jnp.ndarray] = None,
                    pcg_relative: bool = False,
                    trace_residual: bool = False):
        """Schur-complement solve, exact (block-Thomas) or PCG
        (ref: TrajoptMPCReference.py:361-455).  trace_residual: carry the
        PCG dual trace (|nu| + true residual histories) in the stats —
        XLA PCG path only (one extra matvec per iteration)."""
        split = self._can_split_schur()
        condensed = (not split) and self._can_condense_hard()
        if split:
            S, gam, iGxx, iGuu = self._schur_blocks_split(blocks, rho)
        elif condensed:
            S, gam, caux = self._schur_blocks_condensed(blocks, rho)
            # the solved system is the nx-block core; slice the warm-start
            # guess down to its defect rows (generic layout [defect; hard])
            if guess is not None:
                guess = guess[:, :self.nx]
        else:
            S, gam, invG, E, F = self.schur_blocks(blocks, rho)
        if use_pcg:
            if self.use_pallas_pcg:
                solve = _pallas_pcg_solver(self.N, S.bs, precond,
                                           pcg_tol, pcg_max_iter,
                                           pcg_relative)
                g0 = jnp.zeros_like(gam) if guess is None else guess
                lam, iters = solve(S, gam, g0)
                stats = SchurSolveStats(iters, iters < pcg_max_iter)
            else:
                Pinv = preconditioner(S, precond)
                res = pcg(S, gam, Pinv, guess=guess,
                          exit_tolerance=pcg_tol, max_iter=pcg_max_iter,
                          relative=pcg_relative,
                          trace_residual=trace_residual)
                lam = res.x
                stats = SchurSolveStats(res.iters, res.converged,
                                        nu_trace=res.nu_trace,
                                        res_trace=res.res_trace)
        else:
            if self.exact_schur in ("cr", "cr_refine"):
                lam = btd_cyclic_reduction(S, gam)
                if self.exact_schur == "cr_refine":
                    # one step of iterative refinement on the CR solve.
                    # Useful ONLY when kappa * eps_f32 < 1: at the
                    # cold-start flagship conditioning (kappa ~ 1e7+) the
                    # same-precision residual re-solve AMPLIFIES instead
                    # (measured, analysis/horizon_scaling_tpu.md), so the
                    # bench's precision option remains cold-Thomas
                    r = gam - btd_matvec(S, lam)
                    lam = lam + btd_cyclic_reduction(S, r)
            else:
                lam = btd_block_thomas(S, gam)
            stats = SchurSolveStats(jnp.array(0), jnp.array(True))
        if split:
            dxu = self._recover_dxu_split(iGxx, iGuu, blocks, lam)
        elif condensed:
            dxu, lam = self._recover_condensed(blocks, caux, lam)
        else:
            dxu = self.recover_dxu(invG, E, F, blocks, lam)
        return dxu, lam, stats

    def solve_schur_sharded(self, blocks: KKTBlocks, rho, mesh, axis: str,
                            pcg_tol: float = 1e-6,
                            pcg_max_iter: int = 100,
                            precond: str = "SS",
                            guess: Optional[jnp.ndarray] = None,
                            pcg_relative: bool = False,
                            exact: bool = False):
        """Horizon-sharded Schur solve: the per-knot inverse/assembly work
        and the PCG iterations are partitioned over ``axis`` of ``mesh``
        (parallel.horizon.sharded_schur_solve), with the KKT blocks
        replicated.  Same integration point as the reference's
        solveKKTSystem_Schur PCG branch (ref: TrajoptMPCReference.py:437-445);
        same iterates as solve_schur(use_pcg=True) in exact arithmetic."""
        from jax.sharding import PartitionSpec
        from trajoptmpcreference_tpu.parallel.horizon import (
            sharded_schur_solve,
        )

        E, F, rhs, D = self._EF(blocks)
        G = self._regularized_G(blocks, rho)
        if guess is None:
            guess = jnp.zeros((self.N, self.bs), dtype=blocks.H.dtype)

        def fn(E, F, rhs, D, G, g, guess):
            return sharded_schur_solve(
                E, F, rhs, D, G, g, guess, axis,
                precond=precond, exit_tolerance=pcg_tol,
                max_iter=pcg_max_iter, relative=pcg_relative,
                exact=exact)

        rep = PartitionSpec()
        dxu, lam, iters, converged = jax.shard_map(
            fn, mesh=mesh, in_specs=(rep,) * 7, out_specs=rep,
            check_vma=False)(E, F, rhs, D, G, blocks.g, guess)
        return dxu, lam, SchurSolveStats(iters, converged)


@functools.lru_cache(maxsize=None)
def _pallas_pcg_solver(N: int, bs: int, precond: str, tol: float,
                       max_iter: int, relative: bool):
    """Cached per-(shape, hyperparameter) fused-PCG closure — the kernel is
    specialized on all of these, and KKTSystem is rebuilt freely."""
    from trajoptmpcreference_tpu.ops.pallas_pcg import make_batched_pcg
    return make_batched_pcg(N, bs, precond=precond, tol=tol,
                            max_iter=max_iter, relative=relative)


def _lstsq(A, b):
    """Least-squares via normal equations with Tikhonov jitter — the jit-safe
    analogue of the reference's np.linalg.lstsq fallback (ref: :357)."""
    AtA = A.T @ A + 1e-10 * jnp.eye(A.shape[1], dtype=A.dtype)
    return jnp.linalg.solve(AtA, A.T @ b)


def _inv_psd(G, split_at: Optional[int] = None):
    """Batched inverse of small (regularized) SPD blocks.

    ``split_at=nx`` asserts the blocks are block-diagonal across the
    (state, control) partition — true for every cost here except
    NumericalCost's outer(g,g) Hessian, and broken only by soft-constraint
    Gauss-Newton terms that mix x and u rows (callers gate on both) — and
    inverts the nx- and nu-sized sub-blocks separately: ~2.6x less
    Gauss-Jordan work than the full (nx+nu)-dim elimination."""
    n = G.shape[-1]
    if split_at is None or split_at >= n:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), G.shape)
        return _solve_batched(G, eye, spd=True)
    nx = split_at
    Gxx = G[..., :nx, :nx]
    Guu = G[..., nx:, nx:]
    eye_x = jnp.broadcast_to(jnp.eye(nx, dtype=G.dtype), Gxx.shape)
    eye_u = jnp.broadcast_to(jnp.eye(n - nx, dtype=G.dtype), Guu.shape)
    iGxx = _solve_batched(Gxx, eye_x, spd=True)
    iGuu = _solve_batched(Guu, eye_u, spd=True)
    out = jnp.zeros_like(G)
    out = out.at[..., :nx, :nx].set(iGxx)
    return out.at[..., nx:, nx:].set(iGuu)
