"""iLQR / DDP trajectory optimizer: scan-based Riccati passes, jit/vmap-able.

The reference advertises iLQR (ref: README.md:17, MPCSolverMethods enum
``TrajoptMPCReference.py:21-27``) but the solver itself was dropped from the
VCA-EPFL snapshot; this is a from-scratch TPU-native implementation built to
the upstream capability description: iLQR with soft constraints only
(ref: README.md:17), sharing the SQP driver's regularization schedule, exit
codes, and soft-constraint outer loop (ref: TrajoptMPCReference.py:457-508).

TPU-first design:
  * linearization of all N-1 knots is ONE vmap (batched small matmuls on the
    MXU), not a Python loop;
  * the Riccati backward pass is a ``lax.scan`` over knots carrying
    (Vx, Vxx); the feedback rollout is a forward ``lax.scan``;
  * the line search is a ``lax.while_loop`` over the alpha ladder;
  * the whole solve is a pure function of (x0, u0, params) — vmap it over
    thousands of scenarios, shard_map it over a mesh (parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.models.plants import Plant
from trajoptmpcreference_tpu.solvers import constraints as C
from trajoptmpcreference_tpu.solvers.costs import Cost, total_cost_diff
from trajoptmpcreference_tpu.solvers.sqp import (
    EXIT_MAX_ITER,
    EXIT_RHO_MAX,
    EXIT_SOFT_CONVERGED,
    EXIT_SOFT_MAX_ITER,
    EXIT_SOFT_MU_LIMIT,
    EXIT_TOL,
    SQPOptions,
)


def _T(M):
    """Transpose the trailing matrix dims (batched-safe)."""
    return jnp.swapaxes(M, -1, -2)


def _cho_guarded(Quu, rho):
    """Cholesky with a one-shot jitter fallback.

    A non-PD Quu at low rho makes the whole backward pass garbage — the
    line search then rejects it and rho escalates x4, but in the MPC
    regime (max_iter ~ 5-8) every such round-trip burns an iteration the
    budget cannot spare, and the NaN factor poisons the value recursion
    carried BEHIND the failing knot.  Instead: factor once, and where the
    factor is bad re-factor with a jitter sized to the matrix scale
    (max(10 rho, 1e-3 tr(Quu)/nu)) — the standard Levenberg fallback.
    The ``ok`` flag still reports the original failure so the rho
    schedule reacts; the fallback only keeps the recursion finite and
    the direction descent-ish in the meantime."""
    nu = Quu.shape[-1]
    dtype = Quu.dtype
    I = jnp.eye(nu, dtype=dtype)
    L, low = jax.scipy.linalg.cho_factor(Quu, lower=True)
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(jnp.diag(L) > 0)
    jit = jnp.maximum(10.0 * rho, 1e-3 * jnp.abs(jnp.trace(Quu)) / nu)
    Lj, _ = jax.scipy.linalg.cho_factor(
        Quu + jnp.where(ok, 0.0, jit).astype(dtype) * I, lower=True)
    L = jnp.where(ok, L, Lj)
    return (L, low), ok


class ILQRResult(NamedTuple):
    X: jnp.ndarray            # (nx, N)
    U: jnp.ndarray            # (nu, N-1)
    K: jnp.ndarray            # (N-1, nu, nx) final feedback gains (MPC reuse)
    exit_ilqr: jnp.ndarray
    exit_soft: jnp.ndarray
    outer_iters: jnp.ndarray
    iters: jnp.ndarray
    J: jnp.ndarray
    cstate: Any


@dataclasses.dataclass(frozen=True)
class ILQRSolver:
    plant: Plant
    cost: Cost
    cset: C.ConstraintSet
    N: int
    dt: float
    options: SQPOptions
    # backward pass: False = sequential reverse lax.scan (N-1 dependent
    # steps); True = associative-scan Riccati (log2 N combine depth) —
    # same iterates, the TPU-parallel choice for single-solve latency
    parallel_riccati: bool = False

    # ------------------------------------------------------------- helpers
    def total_cost(self, X, U, cost_params, cstate):
        """Stage + terminal cost, soft penalties included
        (ref: TrajoptMPCReference.py:296-310)."""
        ks = jnp.arange(self.N - 1)
        stage = jax.vmap(lambda x, u, k: self.cost.stage_value(cost_params, x, u, k))
        J = jnp.sum(stage(X[:, :-1].T, U.T, ks))
        J = J + self.cost.term_value(cost_params, X[:, -1], jnp.asarray(self.N - 1))
        if self.cset.has_soft():
            soft = jax.vmap(lambda x, u, k: C.stage_soft_value(self.cset, cstate, x, u, k))
            J = J + jnp.sum(soft(X[:, :-1].T, U.T, ks))
            J = J + C.term_soft_value(self.cset, cstate, X[:, -1], jnp.asarray(self.N - 1))
        return J

    def _expansions(self, X, U, cost_params, cstate):
        """Batched linearization + cost expansion at every knot."""
        ks = jnp.arange(self.N - 1)

        def stage(x, u, k):
            A, B = self.plant.step_gradient(x, u, self.dt)
            g = self.cost.stage_gradient(cost_params, x, u, k)
            H = self.cost.stage_hessian(cost_params, x, u, k)
            if self.cset.has_soft():
                gc = C.stage_soft_jacobian(self.cset, cstate, x, u, k)
                g = g + gc
                H = H + jnp.outer(gc, gc)   # GN soft term, as the SQP path
            return A, B, g, H

        A, B, g, H = jax.vmap(stage)(X[:, :-1].T, U.T, ks)
        kN = jnp.asarray(self.N - 1)
        gN = self.cost.term_gradient(cost_params, X[:, -1], kN)
        HN = self.cost.term_hessian(cost_params, X[:, -1], kN)
        if self.cset.has_soft():
            gcN = C.term_soft_jacobian(self.cset, cstate, X[:, -1], kN)
            gN = gN + gcN
            HN = HN + jnp.outer(gcN, gcN)
        return A, B, g, H, gN, HN

    # ------------------------------------------------------- backward pass
    def backward(self, A, B, g, H, gN, HN, rho):
        """Riccati recursion as a reverse lax.scan.

        Returns (K (N-1,nu,nx), kff (N-1,nu), dv1, dv2, diverged).
        Regularization: rho added to Quu (Levenberg-style), matching the
        SQP path's G + rho*I (ref: TrajoptMPCReference.py:334-348).
        """
        nx, nu = self.plant.nx, self.plant.nu
        dtype = A.dtype

        def step(carry, inp):
            Vx, Vxx, dv1, dv2, bad = carry
            Ak, Bk, gk, Hk = inp
            gx, gu = gk[:nx], gk[nx:]
            Hxx = Hk[:nx, :nx]
            Huu = Hk[nx:, nx:]
            Hux = Hk[nx:, :nx]
            Qx = gx + Ak.T @ Vx
            Qu = gu + Bk.T @ Vx
            Qxx = Hxx + Ak.T @ Vxx @ Ak
            Quu = Huu + Bk.T @ Vxx @ Bk + rho * jnp.eye(nu, dtype=dtype)
            Qux = Hux + Bk.T @ Vxx @ Ak
            # gains via guarded Cholesky: non-PD flags ``bad`` (drives the
            # rho schedule) but a jittered refactor keeps the recursion
            # finite instead of poisoning every earlier knot with NaN
            (L, low), diag_ok = _cho_guarded(Quu, rho)
            Kk = jax.scipy.linalg.cho_solve((L, low), Qux)
            kk = jax.scipy.linalg.cho_solve((L, low), Qu)
            Vx1 = Qx - Qux.T @ kk
            Vxx1 = Qxx - Qux.T @ Kk
            Vxx1 = 0.5 * (Vxx1 + Vxx1.T)
            dv1 = dv1 + Qu @ kk
            dv2 = dv2 + kk @ Quu @ kk
            bad = bad | ~diag_ok
            return (Vx1, Vxx1, dv1, dv2, bad), (Kk, kk)

        init = (gN, HN, jnp.zeros((), dtype), jnp.zeros((), dtype),
                jnp.array(False))
        (Vx, Vxx, dv1, dv2, bad), (K, kff) = jax.lax.scan(
            step, init, (A, B, g, H), reverse=True)
        return K, kff, dv1, dv2, bad

    # ------------------------------------------- parallel backward pass
    def backward_parallel(self, A, B, g, H, gN, HN, rho):
        """Riccati recursion as a jax.lax.associative_scan — log2(N)
        combine depth instead of N-1 dependent steps.

        Each stage is a conditional-value-function element (Ae, be, Ce,
        eta, J) representing min-over-controls cost between its boundary
        states, V(x, z) = max_l [l.(z - Ae x - be) - l.Ce l / 2]
        + x.J x / 2 - eta.x; element composition (minimizing out the
        shared boundary state) is associative (Sarkka & Garcia-Fernandez,
        IEEE TAC 2023, "Temporal parallelization of dynamic programming
        and linear quadratic control").  The suffix-combined element k
        (terminal cost folded in as a C = 0 element) carries exactly the
        sequential pass's value expansion: Vxx_k = J_k, Vx_k = -eta_k;
        gains then come pointwise from (Vx, Vxx) at k+1, so the returned
        (K, kff, dv1, dv2, bad) match ``backward`` to float round-off.

        Regularization note: rho enters as Huu + rho I at element build,
        which composes to the same Quu = Huu + rho I + B'Vxx B the
        sequential pass regularizes (same modified problem, not an
        approximation).

        PD precondition (stronger than the sequential pass): the element
        build Cholesky-factorizes Huu + rho I per stage, so it requires
        the STAGE control Hessian itself to be PD, while ``backward``
        only needs the full Quu = Huu + rho I + B'Vxx B.  For costs with
        PSD-only stage control Hessians (e.g. R = 0 on some inputs) this
        path flags ``bad`` and escalates rho where the sequential pass
        would succeed — the two backends then take different iterate
        paths.  Use ``backward`` (parallel_riccati=False) for such costs.
        """
        nx, nu = self.plant.nx, self.plant.nu
        dtype = A.dtype
        Inx = jnp.eye(nx, dtype=dtype)
        Inu = jnp.eye(nu, dtype=dtype)

        def elem(Ak, Bk, gk, Hk):
            gx, gu = gk[:nx], gk[nx:]
            Hxx = Hk[:nx, :nx]
            Huu = Hk[nx:, nx:] + rho * Inu
            Hux = Hk[nx:, :nx]
            (L, low), ok = _cho_guarded(Huu, rho)
            WHux = jax.scipy.linalg.cho_solve((L, low), Hux)   # Huu^-1 Hux
            Wgu = jax.scipy.linalg.cho_solve((L, low), gu)
            WBt = jax.scipy.linalg.cho_solve((L, low), Bk.T)
            Ae = Ak - Bk @ WHux
            be = -Bk @ Wgu
            Ce = Bk @ WBt
            Je = Hxx - Hux.T @ WHux
            eta = -gx + Hux.T @ Wgu
            return (Ae, be, 0.5 * (Ce + Ce.T), eta, 0.5 * (Je + Je.T)), ok

        (Ae, be, Ce, eta, Je), ok_e = jax.vmap(elem)(A, B, g, H)
        zero_m = jnp.zeros((1, nx, nx), dtype=dtype)
        zero_v = jnp.zeros((1, nx), dtype=dtype)
        elems = (
            jnp.concatenate([Ae, zero_m], 0),
            jnp.concatenate([be, zero_v], 0),
            jnp.concatenate([Ce, zero_m], 0),
            jnp.concatenate([eta, -gN[None]], 0),
            jnp.concatenate([Je, HN[None]], 0),
        )

        def combine(e1, e2):
            """e1 earlier in time, e2 later (batched over a leading axis)."""
            A1, b1, C1, n1, J1 = e1
            A2, b2, C2, n2, J2 = e2
            # M = (I + C1 J2)^-1; (I + J2 C1)^-1 = M^T for symmetric C1, J2
            LHS = Inx + C1 @ J2
            MA1 = jnp.linalg.solve(LHS, A1)
            Mb = jnp.linalg.solve(LHS, b1[..., None])[..., 0]
            MCn = jnp.linalg.solve(LHS, C1 @ n2[..., None])[..., 0]
            A12 = A2 @ MA1
            b12 = (A2 @ (Mb + MCn)[..., None])[..., 0] + b2
            C12 = A2 @ jnp.linalg.solve(LHS, C1) @ _T(A2) + C2
            LT = _T(LHS)
            n12 = (_T(A1) @ jnp.linalg.solve(
                LT, (n2 - (J2 @ b1[..., None])[..., 0])[..., None]))[..., 0] + n1
            J12 = _T(A1) @ jnp.linalg.solve(LT, J2 @ A1) + J1
            return (A12, b12, 0.5 * (C12 + _T(C12)), n12,
                    0.5 * (J12 + _T(J12)))

        # reverse=True passes the LATER element as the first argument
        # (verified against an explicit matrix-product suffix) — swap so
        # combine sees (earlier, later)
        out = jax.lax.associative_scan(lambda a, b: combine(b, a), elems,
                                       reverse=True)
        Vxx = out[4]          # (N,) suffix value Hessians: Vxx[k] at knot k
        Vx = -out[3]

        def gains(Ak, Bk, gk, Hk, Vx1, Vxx1):
            gx, gu = gk[:nx], gk[nx:]
            Huu = Hk[nx:, nx:]
            Hux = Hk[nx:, :nx]
            Qu = gu + Bk.T @ Vx1
            Quu = Huu + Bk.T @ Vxx1 @ Bk + rho * Inu
            Qux = Hux + Bk.T @ Vxx1 @ Ak
            (L, low), ok = _cho_guarded(Quu, rho)
            Kk = jax.scipy.linalg.cho_solve((L, low), Qux)
            kk = jax.scipy.linalg.cho_solve((L, low), Qu)
            return Kk, kk, Qu @ kk, kk @ Quu @ kk, ok

        K, kff, dv1s, dv2s, ok_g = jax.vmap(gains)(
            A, B, g, H, Vx[1:], Vxx[1:])
        bad = ~(jnp.all(ok_e) & jnp.all(ok_g))
        return K, kff, jnp.sum(dv1s), jnp.sum(dv2s), bad

    # -------------------------------------------------------- forward pass
    def rollout(self, X, U, K, kff, alpha):
        """Feedback rollout x' = f(x', u - alpha*kff - K (x' - x))."""

        def step(xk_new, inp):
            xk, uk, Kk, kk = inp
            u_new = uk - alpha * kk - Kk @ (xk_new - xk)
            x_next = self.plant.step(xk_new, u_new, self.dt)
            return x_next, (xk_new, u_new)

        xN, (Xs, Us) = jax.lax.scan(step, X[:, 0], (X[:, :-1].T, U.T, K, kff))
        X_new = jnp.concatenate([Xs.T, xN[:, None]], axis=1)
        return X_new, Us.T

    # ----------------------------------------------------------- main loop
    def ilqr_round(self, X, U, cost_params, cstate):
        o = self.options
        dtype = X.dtype
        nx, nu = self.plant.nx, self.plant.nu
        J0 = self.total_cost(X, U, cost_params, cstate)

        class S(NamedTuple):
            X: jnp.ndarray
            U: jnp.ndarray
            K: jnp.ndarray
            J: jnp.ndarray
            rho: jnp.ndarray
            drho: jnp.ndarray
            it: jnp.ndarray
            exit_code: jnp.ndarray
            done: jnp.ndarray

        def line_search(X, U, K, kff, dv1, dv2, J):
            class LS(NamedTuple):
                alpha: jnp.ndarray
                done: jnp.ndarray
                accepted: jnp.ndarray
                Xc: jnp.ndarray
                Uc: jnp.ndarray
                dJ: jnp.ndarray
                J_new: jnp.ndarray

            def body(s: LS) -> LS:
                Xc, Uc = self.rollout(X, U, K, kff, s.alpha)
                # cancellation-safe merit change (costs.total_cost_diff):
                # the acceptance compares the difference, never two totals
                dJ = total_cost_diff(self.cost, self.cset, cstate, self.N,
                                     X, U, Xc, Uc, cost_params)
                # model reduction for u' = u - alpha*kff: J - J' ~
                # alpha * Qu.kff - alpha^2/2 * kff.Quu.kff  (> 0 descent)
                expected = s.alpha * dv1 - 0.5 * s.alpha * s.alpha * dv2
                ratio = -dJ / expected
                ok = ((dJ <= 0)
                      & (ratio >= o.expected_reduction_min)
                      & (ratio <= o.expected_reduction_max))
                can_retry = s.alpha > o.alpha_min
                done = ok | ~can_retry
                next_alpha = jnp.where(done, s.alpha, s.alpha * o.alpha_factor)
                return LS(next_alpha, done, ok, Xc, Uc, dJ, J + dJ)

            init = LS(jnp.asarray(1.0, dtype), jnp.array(False),
                      jnp.array(False), X, U, jnp.zeros((), dtype), J)
            return jax.lax.while_loop(lambda s: ~s.done, body, init)

        backward = (self.backward_parallel if self.parallel_riccati
                    else self.backward)

        def body(s: S) -> S:
            A, B, g, H, gN, HN = self._expansions(s.X, s.U, cost_params, cstate)
            K, kff, dv1, dv2, bad_bp = backward(A, B, g, H, gN, HN, s.rho)
            # Newton-decrement convergence: the model predicts no meaningful
            # reduction — stop before the line search can thrash
            converged = (dv1 < o.exit_tolerance) & ~bad_bp
            ls = line_search(s.X, s.U, K, kff, dv1, dv2, s.J)
            accepted = ls.accepted & ~bad_bp & ~converged
            error = ~accepted
            X1 = jnp.where(accepted, ls.Xc, s.X)
            U1 = jnp.where(accepted, ls.Uc, s.U)
            J1 = jnp.where(accepted, ls.J_new, s.J)
            drho_ok = jnp.minimum(s.drho / o.rho_factor, 1.0 / o.rho_factor)
            rho_ok = jnp.maximum(s.rho * drho_ok, o.rho_min)
            drho_err = jnp.maximum(s.drho * o.rho_factor, o.rho_factor)
            rho_err = jnp.maximum(s.rho * drho_err, o.rho_min)
            rho1 = jnp.where(accepted, rho_ok, rho_err)
            drho1 = jnp.where(accepted, drho_ok, drho_err)
            # a converged iterate exits with EXIT_TOL; don't let the forced
            # line-search rejection escalate rho on the way out
            rho1 = jnp.where(converged, s.rho, rho1)
            drho1 = jnp.where(converged, s.drho, drho1)
            delta_J = -ls.dJ
            exit_code = jnp.where(error & (rho1 > o.rho_max), EXIT_RHO_MAX, 0)
            exit_code = jnp.where(~error & (delta_J < o.exit_tolerance),
                                  EXIT_TOL, exit_code)
            exit_code = jnp.where(converged, EXIT_TOL, exit_code)
            hit_max = s.it == (o.max_iter - 1)
            # max-iter only when no other exit fired this iteration
            exit_code = jnp.where(hit_max & (exit_code == 0),
                                  EXIT_MAX_ITER, exit_code)
            done = exit_code > 0
            it1 = jnp.where(done, s.it, s.it + 1)
            s_new = S(X=X1, U=U1, K=K, J=J1, rho=rho1, drho=drho1, it=it1,
                      exit_code=exit_code, done=done)
            # batch-invariance freeze: see solvers.sqp.sqp_round — without
            # it a finished scenario keeps iterating for as long as its
            # slowest batchmate, so results depend on batch composition
            return jax.tree_util.tree_map(
                lambda new, old: jnp.where(s.done, old, new), s_new, s)

        init = S(X=X, U=U, K=jnp.zeros((self.N - 1, nu, nx), dtype),
                 J=J0, rho=jnp.asarray(o.rho_init, dtype),
                 drho=jnp.asarray(1.0, dtype), it=jnp.array(0),
                 exit_code=jnp.array(0), done=jnp.array(False))
        out = jax.lax.while_loop(lambda s: ~s.done, body, init)
        return out.X, out.U, out.K, out.exit_code, out.it, out.J

    # ----------------------------------------------------------- full solve
    def solve(self, x0, u0, cost_params=None, cstate=None) -> ILQRResult:
        """iLQR with the soft-constraint outer loop (soft only, per
        ref: README.md:17; hard constraints are not supported by iLQR)."""
        o = self.options
        cost_params = self.cost.default_params if cost_params is None else cost_params
        if cstate is None:
            cstate = self.cset.init_state(dtype=x0.dtype)
        if self.cset.has_hard():
            raise ValueError("iLQR supports soft constraints only "
                             "(ref: README.md:17)")

        # iLQR is single-shooting: make the initial trajectory dynamically
        # consistent by rolling the warm-start controls out from x0[:, 0]
        # (essential for receding-horizon warm starts, where the plan head
        # is overwritten with the measured state)
        def _ro(xk, uk):
            xn = self.plant.step(xk, uk, self.dt)
            return xn, xn

        _, Xtail = jax.lax.scan(_ro, x0[:, 0], u0.T)
        # Plan-reset recovery: in the MPC regime a shifted plan rolled out
        # from a disturbed state can overflow — and a non-finite base cost
        # poisons every acceptance test (dJ = NaN rejects forever), so one
        # bad warm start ends the episode (measured: flagship N=16 f32
        # closed loop walks off through exactly this spiral).  If the warm
        # rollout diverges, restart the solve from zero controls — the
        # standard single-shooting anti-windup.
        bad_plan = (~jnp.all(jnp.isfinite(Xtail))
                    | (jnp.max(jnp.abs(Xtail)) > 1e6))
        u0 = jnp.where(bad_plan, jnp.zeros_like(u0), u0)
        _, Xtail0 = jax.lax.scan(_ro, x0[:, 0], u0.T)
        Xtail = jnp.where(bad_plan, Xtail0, Xtail)
        x0 = jnp.concatenate([x0[:, :1], Xtail.T], axis=1)

        class SoftS(NamedTuple):
            X: jnp.ndarray
            U: jnp.ndarray
            K: jnp.ndarray
            cstate: Any
            outer_it: jnp.ndarray
            exit_soft: jnp.ndarray
            exit_ilqr: jnp.ndarray
            iters: jnp.ndarray
            J: jnp.ndarray
            done: jnp.ndarray

        def body(s: SoftS) -> SoftS:
            X1, U1, K1, exit_ilqr, iters, J = self.ilqr_round(
                s.X, s.U, cost_params, s.cstate)
            max_c = C.max_soft_violation(self.cset, s.cstate, X1, U1)
            exit_soft = jnp.where(max_c < o.exit_tolerance_soft,
                                  EXIT_SOFT_CONVERGED, 0)
            hit_max = s.outer_it == (o.max_iter_soft - 1)
            exit_soft = jnp.where(hit_max, EXIT_SOFT_MAX_ITER, exit_soft)
            exiting = exit_soft > 0
            new_cstate, mu_at_limit = C.update_all_soft(self.cset, s.cstate, X1, U1)
            cstate1 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(exiting, old, new), new_cstate, s.cstate)
            exit_soft = jnp.where(~exiting & mu_at_limit,
                                  EXIT_SOFT_MU_LIMIT, exit_soft)
            done = exit_soft > 0
            outer_it1 = jnp.where(hit_max | done, s.outer_it, s.outer_it + 1)
            s_new = SoftS(X=X1, U=U1, K=K1, cstate=cstate1,
                          outer_it=outer_it1, exit_soft=exit_soft,
                          exit_ilqr=exit_ilqr, iters=iters, J=J, done=done)
            # batch-invariance freeze (see solvers.sqp.sqp_round)
            return jax.tree_util.tree_map(
                lambda new, old: jnp.where(s.done, old, new), s_new, s)

        dtype = x0.dtype
        nx, nu = self.plant.nx, self.plant.nu
        init = SoftS(X=x0, U=u0, K=jnp.zeros((self.N - 1, nu, nx), dtype),
                     cstate=cstate, outer_it=jnp.array(0),
                     exit_soft=jnp.array(0), exit_ilqr=jnp.array(0),
                     iters=jnp.array(0), J=jnp.zeros((), dtype),
                     done=jnp.array(False))
        out = jax.lax.while_loop(lambda s: ~s.done, body, init)
        return ILQRResult(X=out.X, U=out.U, K=out.K, exit_ilqr=out.exit_ilqr,
                          exit_soft=out.exit_soft, outer_iters=out.outer_it,
                          iters=out.iters, J=out.J, cstate=out.cstate)


def make_ilqr(plant: Plant, cost: Cost, cset: Optional[C.ConstraintSet],
              N: int, dt: float,
              options: Optional[SQPOptions] = None,
              parallel_riccati: bool = False) -> ILQRSolver:
    """Build a jit-specialized iLQR solver (restores the capability the
    VCA-EPFL snapshot dropped; ref: README.md:17, MPCSolverMethods
    ``TrajoptMPCReference.py:21-27``).

    parallel_riccati: run the backward pass as an associative scan
    (log2 N combine depth) instead of the sequential reverse scan —
    identical iterates, lower single-solve latency on TPU."""
    if cset is None:
        cset = C.ConstraintSet(plant.nq, plant.nv, plant.nu, N)
    options = options or SQPOptions()
    return ILQRSolver(plant=plant, cost=cost, cset=cset, N=N, dt=dt,
                      options=options, parallel_riccati=parallel_riccati)
