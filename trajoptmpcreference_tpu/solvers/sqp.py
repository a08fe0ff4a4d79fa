"""SQP trajectory optimizer: jit-compiled, batchable, shardable.

Semantics follow the reference solver (ref: TrajoptMPCReference.py:510-760):
three nested loops — soft-constraint outer loop, SQP iteration, L1-merit
line search (Nocedal & Wright 18.3) — with the reference's exit codes, rho
regularization schedule, hardcoded merit weight mu = 10 (ref: :545-546), and
the same linear-system menu {N, S, PCG-J, PCG-BJ, PCG-SS} (ref: :13-18).

TPU-first re-design: the loops are lax.while_loops over pytree state, the
per-knot work is vmapped (kkt.py), the trajectory update is one fused
axpy, and the whole solve is a pure function of (x0, u0, cost_params,
constraint_state) — so thousands of scenarios run per chip via vmap and
scale across meshes via shard_map (parallel/).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.models.plants import Plant
from trajoptmpcreference_tpu.solvers import constraints as C
from trajoptmpcreference_tpu.solvers.costs import Cost
from trajoptmpcreference_tpu.solvers.kkt import KKTSystem

SQP_METHODS = ("N", "S", "PCG-J", "PCG-BJ", "PCG-SS")

# exit codes (ref: TrajoptMPCReference.py:463-508)
EXIT_TOL = 1
EXIT_RHO_MAX = 2
EXIT_MAX_ITER = 3
EXIT_SOFT_CONVERGED = 1
EXIT_SOFT_MAX_ITER = 2
EXIT_SOFT_MU_LIMIT = 3


@dataclasses.dataclass(frozen=True)
class SQPOptions:
    """Hyperparameters with the reference defaults
    (ref: TrajoptMPCReference.py:91-115)."""

    exit_tolerance: float = 1e-6
    max_iter: int = 100
    alpha_factor: float = 0.5
    alpha_min: float = 0.005
    rho_factor: float = 4.0
    rho_min: float = 1e-3
    rho_max: float = 1e3
    rho_init: float = 1e-3
    expected_reduction_min: float = 0.05
    expected_reduction_max: float = 3.0
    # L1 merit weight.  The reference computes mu = J/c then overrides it
    # with 10 (ref: TrajoptMPCReference.py:545-546); 10 is kept as the
    # parity default, but it under-weights feasibility when J >> 10*c
    # (large horizons/weights) and the line search then trades violation
    # for cost.  Set merit_mu=0 for the adaptive balance the reference
    # computed and discarded: mu = J0 / c0 (10 when c0 = 0).
    merit_mu: float = 10.0
    exit_tolerance_linSys: float = 1e-6
    max_iter_linSys: int = 100
    # hard-constraint exit gate: EXIT_TOL additionally requires the max
    # hard-limit violation of the accepted iterate to be <= this value.
    # inf = reference parity (its exit test has no feasibility term,
    # ref: TrajoptMPCReference.py:463-481, so active-set chatter can exit
    # 'converged' with a bound still violated).  Pair with
    # BoxLimitSpec.activation_band to damp the chatter itself.
    hard_violation_exit_tol: float = float("inf")
    # scale-invariant PCG exit (|nu| < tol*|nu0|); the reference's absolute
    # test (ref: PCG.py:102) is kept when False — see ops/btridiag.pcg
    pcg_relative: bool = False
    # evaluate the whole alpha ladder in ONE batched pass and select the
    # first acceptable candidate (same accepted alpha / iterate / ls_iter
    # as the sequential loop — the ladder and acceptance test are
    # identical, only the schedule changes).  Under vmap the sequential
    # while_loop runs lockstep at the max trip count over the batch, so
    # one straggler scenario drags all B through every ladder step as
    # B separate small-kernel rounds; the parallel form is one round of
    # K-times-wider kernels.  False = the reference's sequential loop
    # (ref: TrajoptMPCReference.py:609-744).
    parallel_line_search: bool = False
    # directional-derivative point for the acceptance test.  False =
    # reference parity: the cost gradient is re-evaluated at every
    # candidate trajectory (ref: TrajoptMPCReference.py:633-646), a full
    # gradient sweep (EE Jacobians for task-space costs) per ladder
    # trial.  True = standard Armijo: D = g(X, U) . dxu with the KKT
    # gradient already in hand from form_blocks — computed once per
    # iterate, free, and alpha-independent.
    ls_grad_at_base: bool = False
    # real-time-iteration mode (Diehl's RTI scheme for warm-started MPC):
    # when > 0, accept alpha = ls_fixed_alpha unconditionally — no alpha
    # ladder, no merit acceptance test, no directional derivative.  Pairs
    # with a small fixed max_iter and per-step warm starts; the safety the
    # merit test provides must come from the MPC loop instead (each step
    # re-solves from the measured state).  0.0 = off.
    ls_fixed_alpha: float = 0.0
    # lean RTI: with ls_fixed_alpha > 0, ALSO skip every merit/exit
    # metric — no total_cost, no total_violation, no cost-diff pass; the
    # solve runs exactly max_iter iterations of (form KKT blocks -> QP
    # solve -> fixed-step axpy) and exits on the iteration budget alone.
    # This is textbook RTI (one linearize+QP per control step at
    # max_iter=1).  SQPResult.J / .viol are then 0 (never computed) and
    # exit_sqp is always EXIT_MAX_ITER; quality must be judged from the
    # closed loop (tracking error), which is how the MPC bench gates
    # anyway.  Ignored when ls_fixed_alpha == 0.
    rti_lean: bool = False
    # RTI trust-region clip: with ls_fixed_alpha > 0, rescale the applied
    # step so max|alpha dU| <= rti_step_clip (one reduction; metric-free,
    # so it composes with rti_lean).  Replaces the stabilizing feedback
    # RTI removes: in the line-searched path a garbage QP direction (the
    # f32 Schur solve near-singular at low rho) is REJECTED by the merit
    # test and rho escalates x4; RTI applies every direction, so one bad
    # solve ends the episode (measured: flagship steady-state RTI at any
    # alpha in {1, 0.5, 0.316} diverges on the first bad step at
    # rho = 1e-3, 0/512 stable).  The clip bounds the damage to one
    # clipped step while leaving warm steady-state steps (far below any
    # sensible clip) exactly at fixed alpha.  inf = off.
    rti_step_clip: float = float("inf")
    # trust-region clip for the LINE-SEARCHED path: rescale the QP
    # direction so max|dU| <= ls_step_clip before the alpha ladder (the
    # direction is preserved; only its magnitude is bounded).  Exists for
    # constrained MPC: a knot whose torque row is INACTIVE at the
    # linearization point has no hard restraint in that QP, and with a
    # capped AL budget (small mu) the L1 merit's linear violation term can
    # lose to a large task-cost gain — one accepted bound-jump then starts
    # a chatter blow-up (measured: stacked AS+AL scenarios walking applied
    # torque to 3000+ at f32/B>=128).  A clip of a few times the torque
    # limit makes such jumps impossible while leaving warm steady-state
    # steps (|dU| << clip) untouched.  inf = off (default; unconstrained
    # parity unchanged).
    ls_step_clip: float = float("inf")
    exit_tolerance_soft: float = 1e-6
    max_iter_soft: int = 10
    # carry the PCG dual trace (|nu| + TRUE residual |gamma - S lam|
    # histories, the reference's (trace, trace2) — ref: PCG.py:82-95) in
    # the QP stats; surfaced per SQP iteration by utils.trace.solve_traced.
    # Costs one extra matvec per PCG iteration — analysis only.
    trace_linsys: bool = False


class SQPResult(NamedTuple):
    X: jnp.ndarray            # (nx, N)
    U: jnp.ndarray            # (nu, N-1)
    exit_sqp: jnp.ndarray     # int
    exit_soft: jnp.ndarray    # int
    outer_iters: jnp.ndarray  # int
    sqp_iters: jnp.ndarray    # int (last outer round, as the reference returns)
    J: jnp.ndarray            # final cost
    viol: jnp.ndarray         # final hard-constraint violation
    cstate: Any               # final soft-constraint hyperparameters
    lam: jnp.ndarray          # (N, bs) last multipliers (PCG warm-start hook,
                              # ref: PCG.py:33, TrajoptMPCReference.py:439-440)


@dataclasses.dataclass(frozen=True)
class SQPSolver:
    plant: Plant
    cost: Cost
    cset: C.ConstraintSet
    N: int
    dt: float
    method: str
    options: SQPOptions
    kkt: KKTSystem
    # horizon sharding (SP/TP axis, SURVEY.md §2.8): when a mesh is set, the
    # Schur assembly + PCG run partitioned over mesh[horizon_axis] via
    # shard_map (kkt.solve_schur_sharded) — for single large-latency solves;
    # the batched regime shards scenarios instead (parallel.batch)
    mesh: Optional[Any] = None
    horizon_axis: str = "horizon"

    # ------------------------------------------------------------- metrics
    def total_cost(self, X, U, cost_params, cstate):
        """(ref: TrajoptMPCReference.py:296-310)."""
        ks = jnp.arange(self.N - 1)
        stage = jax.vmap(lambda x, u, k: self.cost.stage_value(cost_params, x, u, k))
        J = jnp.sum(stage(X[:, :-1].T, U.T, ks))
        J = J + self.cost.term_value(cost_params, X[:, -1], jnp.asarray(self.N - 1))
        if self.cset.has_soft():
            soft = jax.vmap(lambda x, u, k: C.stage_soft_value(self.cset, cstate, x, u, k))
            J = J + jnp.sum(soft(X[:, :-1].T, U.T, ks))
            J = J + C.term_soft_value(self.cset, cstate, X[:, -1], jnp.asarray(self.N - 1))
        return J

    def total_cost_diff(self, X, U, Xc, Uc, cost_params, cstate):
        """J(Xc, Uc) - J(X, U), summed from per-stage differences.

        Cancellation-safe in f32 (see costs.total_cost_diff, the shared
        implementation)."""
        from trajoptmpcreference_tpu.solvers.costs import total_cost_diff
        return total_cost_diff(self.cost, self.cset, cstate, self.N,
                               X, U, Xc, Uc, cost_params)

    def total_violation(self, X, U, xs):
        """Initial-state + dynamics defects + active hard-constraint values
        (ref: TrajoptMPCReference.py:273-294)."""
        step = jax.vmap(lambda x, u: self.plant.step(x, u, self.dt))
        xpred = step(X[:, :-1].T, U.T)                       # (N-1, nx)
        c = jnp.sum(jnp.abs(X[:, 0] - xs))
        c = c + jnp.sum(jnp.abs(X[:, 1:].T - xpred))
        if self.cset.has_hard():
            hv = jax.vmap(lambda x, u: C.stage_hard_rows(self.cset, x, u, False)[0])(
                X[:, :-1].T, U.T)
            c = c + jnp.sum(jnp.abs(hv))
            hvN, _, _ = C.stage_hard_rows(self.cset, X[:, -1], None, True)
            c = c + jnp.sum(jnp.abs(hvN))
        return c

    # ------------------------------------------------------ fused metrics
    # The glue between solver phases is dispatch-latency-bound on TPU
    # (analysis/bench_history_r4.md finding 18: ~3 ms of the 8 ms iterate
    # is small-op scheduling).  The cost-change and violation sweeps both
    # walk the same knots, so they are evaluated in ONE vmapped stage
    # sweep — one fused XLA region per call instead of two — with
    # identical per-stage math (sums reassociate, below f32 tolerance).

    def base_metrics(self, X, U, xs, cost_params, cstate):
        """(total_cost, total_violation) in one knot sweep
        (ref: TrajoptMPCReference.py:296-310 and :273-294)."""
        ks = jnp.arange(self.N - 1)

        def stage(x, u, xn, k):
            J = self.cost.stage_value(cost_params, x, u, k)
            if self.cset.has_soft():
                J = J + C.stage_soft_value(self.cset, cstate, x, u, k)
            c = jnp.sum(jnp.abs(xn - self.plant.step(x, u, self.dt)))
            if self.cset.has_hard():
                c = c + jnp.sum(jnp.abs(
                    C.stage_hard_rows(self.cset, x, u, False)[0]))
            return J, c

        Js, cs = jax.vmap(stage)(X[:, :-1].T, U.T, X[:, 1:].T, ks)
        kN = jnp.asarray(self.N - 1)
        J = jnp.sum(Js) + self.cost.term_value(cost_params, X[:, -1], kN)
        if self.cset.has_soft():
            J = J + C.term_soft_value(self.cset, cstate, X[:, -1], kN)
        c = jnp.sum(cs) + jnp.sum(jnp.abs(X[:, 0] - xs))
        if self.cset.has_hard():
            c = c + jnp.sum(jnp.abs(
                C.stage_hard_rows(self.cset, X[:, -1], None, True)[0]))
        return J, c

    def _diff_metrics(self, X, U, Xc, Uc, xs, cost_params, cstate):
        """(J(Xc,Uc) - J(X,U), violation(Xc,Uc)) in one knot sweep —
        the line-search evaluate's two passes fused.  The cost diff keeps
        costs.total_cost_diff's cancellation-safe per-stage structure."""
        ks = jnp.arange(self.N - 1)
        svd = self.cost.stage_value_diff

        def stage(x, u, xc, uc, xcn, k):
            if svd is not None:
                d = svd(cost_params, x, u, xc, uc, k)
            else:
                d = (self.cost.stage_value(cost_params, xc, uc, k)
                     - self.cost.stage_value(cost_params, x, u, k))
            if self.cset.has_soft():
                d = d + (C.stage_soft_value(self.cset, cstate, xc, uc, k)
                         - C.stage_soft_value(self.cset, cstate, x, u, k))
            c = jnp.sum(jnp.abs(xcn - self.plant.step(xc, uc, self.dt)))
            if self.cset.has_hard():
                c = c + jnp.sum(jnp.abs(
                    C.stage_hard_rows(self.cset, xc, uc, False)[0]))
            return d, c

        ds, cs = jax.vmap(stage)(X[:, :-1].T, U.T, Xc[:, :-1].T, Uc.T,
                                 Xc[:, 1:].T, ks)
        d = jnp.sum(ds)
        kN = jnp.asarray(self.N - 1)
        if self.cost.term_value_diff is not None:
            d = d + self.cost.term_value_diff(cost_params, X[:, -1],
                                              Xc[:, -1], kN)
        else:
            d = d + (self.cost.term_value(cost_params, Xc[:, -1], kN)
                     - self.cost.term_value(cost_params, X[:, -1], kN))
        if self.cset.has_soft():
            d = d + (C.term_soft_value(self.cset, cstate, Xc[:, -1], kN)
                     - C.term_soft_value(self.cset, cstate, X[:, -1], kN))
        c = jnp.sum(cs) + jnp.sum(jnp.abs(Xc[:, 0] - xs))
        if self.cset.has_hard():
            c = c + jnp.sum(jnp.abs(
                C.stage_hard_rows(self.cset, Xc[:, -1], None, True)[0]))
        return d, c

    def directional_derivative(self, Xc, Uc, dxu, cost_params, cstate):
        """D = sum_k grad_k . dxu_k (+ soft jacobians), evaluated at the
        candidate trajectory (ref: TrajoptMPCReference.py:636-648)."""
        ks = jnp.arange(self.N - 1)

        def stage(x, u, k, d):
            g = self.cost.stage_gradient(cost_params, x, u, k)
            if self.cset.has_soft():
                g = g + C.stage_soft_jacobian(self.cset, cstate, x, u, k)
            return g @ d

        D = jnp.sum(jax.vmap(stage)(Xc[:, :-1].T, Uc.T, ks, dxu[:-1]))
        gN = self.cost.term_gradient(cost_params, Xc[:, -1], jnp.asarray(self.N - 1))
        if self.cset.has_soft():
            gN = gN + C.term_soft_jacobian(self.cset, cstate, Xc[:, -1],
                                           jnp.asarray(self.N - 1))
        D = D + gN @ dxu[-1, :self.plant.nx]
        return D

    # ------------------------------------------------------------ QP solve
    def solve_qp(self, X, U, xs, cost_params, cstate, rho, guess):
        blocks = self.kkt.form_blocks(X, U, xs, cost_params, cstate)
        return self.solve_qp_from_blocks(blocks, rho, guess)

    def solve_qp_from_blocks(self, blocks, rho, guess):
        from trajoptmpcreference_tpu.solvers.kkt import SchurSolveStats
        if self.method == "N":
            dxu, lam, singular = self.kkt.solve_dense(blocks, rho)
            return dxu, lam, SchurSolveStats(jnp.array(0),
                                             jnp.array(True)), singular
        use_pcg = self.method.startswith("PCG")
        precond = self.method[4:] if use_pcg else "SS"
        if self.mesh is not None:
            # horizon-sharded Schur: PCG (halo matvecs) or, for method
            # "S", the SPIKE-style substructured exact solve
            dxu, lam, stats = self.kkt.solve_schur_sharded(
                blocks, rho, self.mesh, self.horizon_axis,
                pcg_tol=self.options.exit_tolerance_linSys,
                pcg_max_iter=self.options.max_iter_linSys,
                precond=precond, guess=guess,
                pcg_relative=self.options.pcg_relative,
                exact=not use_pcg)
            return dxu, lam, stats, jnp.array(False)
        dxu, lam, stats = self.kkt.solve_schur(
            blocks, rho, use_pcg=use_pcg,
            pcg_tol=self.options.exit_tolerance_linSys,
            pcg_max_iter=self.options.max_iter_linSys,
            precond=precond,
            guess=guess if use_pcg else None,
            pcg_relative=self.options.pcg_relative,
            trace_residual=self.options.trace_linsys)
        return dxu, lam, stats, jnp.array(False)

    # ----------------------------------------------------------- line search
    def merit_weight(self, J0, c0):
        """L1 merit weight: the parity constant, or (merit_mu = 0) the
        adaptive J0/c0 the reference computes then discards
        (ref: TrajoptMPCReference.py:545-546)."""
        o = self.options
        if o.merit_mu > 0:
            return jnp.asarray(o.merit_mu, J0.dtype)
        return jnp.where(c0 != 0, J0 / jnp.maximum(c0, 1e-12), 10.0)

    def line_search(self, X, U, dxu, J, c, merit, xs, cost_params, cstate,
                    mu=None, D_base=None):
        """(ref: TrajoptMPCReference.py:606-744).  ``D_base``: when
        options.ls_grad_at_base is set, the alpha-independent directional
        derivative g(X, U) . dxu computed once by the caller (sqp_iterate
        reuses the KKT gradient blocks)."""
        o = self.options
        nx, nu = self.plant.nx, self.plant.nu
        if mu is None:
            mu = jnp.asarray(o.merit_mu if o.merit_mu > 0 else 10.0, X.dtype)
        dX = dxu[:, :nx].T          # (nx, N)
        dU = dxu[:-1, nx:].T        # (nu, N-1)

        def evaluate(alpha):
            Xc = X - alpha * dX
            Uc = U - alpha * dU
            # cancellation-safe merit change (see total_cost_diff) and the
            # candidate violation in ONE fused knot sweep (_diff_metrics):
            # the acceptance test compares differences, never two large
            # totals, and pays one dispatch phase instead of two
            dJ, c_new = self._diff_metrics(X, U, Xc, Uc, xs, cost_params,
                                           cstate)
            if D_base is not None:
                D = D_base
            else:
                D = self.directional_derivative(Xc, Uc, dxu, cost_params,
                                                cstate)
            delta_merit = -dJ + mu * (c - c_new)
            J_new = J + dJ
            merit_new = merit - delta_merit
            expected = alpha * (D - mu * c_new)
            ratio = delta_merit / expected
            ok = ((delta_merit >= 0)
                  & (ratio >= o.expected_reduction_min)
                  & (ratio <= o.expected_reduction_max))
            return Xc, Uc, dJ, J_new, c_new, merit_new, D, ratio, ok

        class LS(NamedTuple):
            alpha: jnp.ndarray
            done: jnp.ndarray
            accepted: jnp.ndarray
            ls_iter: jnp.ndarray
            Xc: jnp.ndarray
            Uc: jnp.ndarray
            dJ: jnp.ndarray
            J_new: jnp.ndarray
            c_new: jnp.ndarray
            merit_new: jnp.ndarray
            D: jnp.ndarray
            ratio: jnp.ndarray

        dtype = X.dtype
        if o.ls_fixed_alpha > 0:
            # real-time iteration: one unconditional step, no acceptance
            # test — dJ / c_new still computed (carried state + exit test)
            # unless rti_lean skips all metrics; the directional
            # derivative is skipped unless already in hand
            alpha = jnp.asarray(o.ls_fixed_alpha, dtype)
            if math.isfinite(o.rti_step_clip):
                # scale stays on the QP ray: one factor for dX and dU
                du_max = alpha * jnp.max(jnp.abs(dU))
                alpha = alpha * jnp.minimum(
                    jnp.ones((), dtype),
                    o.rti_step_clip / jnp.maximum(du_max, 1e-30))
            Xc = X - alpha * dX
            Uc = U - alpha * dU
            if o.rti_lean:
                zero = jnp.zeros((), dtype)
                return LS(alpha=alpha, done=jnp.array(True),
                          accepted=jnp.array(True), ls_iter=jnp.array(0),
                          Xc=Xc, Uc=Uc, dJ=zero, J_new=J, c_new=c,
                          merit_new=merit, D=zero,
                          ratio=jnp.ones((), dtype))
            dJ, c_new = self._diff_metrics(X, U, Xc, Uc, xs, cost_params,
                                           cstate)
            D = D_base if D_base is not None else jnp.zeros((), dtype)
            delta_merit = -dJ + mu * (c - c_new)
            return LS(alpha=alpha, done=jnp.array(True),
                      accepted=jnp.array(True), ls_iter=jnp.array(0),
                      Xc=Xc, Uc=Uc, dJ=dJ, J_new=J + dJ, c_new=c_new,
                      merit_new=merit - delta_merit, D=D,
                      ratio=jnp.ones((), dtype))
        if o.parallel_line_search:
            # the sequential loop tries alpha = 1, f, f^2, ... down to the
            # first value <= alpha_min (inclusive) — build that exact ladder
            ladder = [1.0]
            while ladder[-1] > o.alpha_min:
                ladder.append(ladder[-1] * o.alpha_factor)
            alphas = jnp.asarray(ladder, dtype)
            K = len(ladder)
            # scalar outputs only: gathering Xc[idx]/Uc[idx] from the vmap
            # would force all K candidate trajectories to materialize in
            # HBM; the selected candidate is one axpy from alphas[idx]
            (dJ, J_new, c_new, merit_new, D, ratio,
             ok) = jax.vmap(lambda a: evaluate(a)[2:])(alphas)
            # first acceptable candidate, else the last tried (what the
            # sequential loop ends holding); ls_iter counts the failures
            # before it, exactly the while_loop's increment pattern
            idx = jnp.where(jnp.any(ok), jnp.argmax(ok), K - 1)
            alpha_sel = alphas[idx]
            return LS(alpha=alpha_sel, done=jnp.array(True),
                      accepted=ok[idx], ls_iter=idx,
                      Xc=X - alpha_sel * dX, Uc=U - alpha_sel * dU,
                      dJ=dJ[idx], J_new=J_new[idx],
                      c_new=c_new[idx], merit_new=merit_new[idx],
                      D=D[idx], ratio=ratio[idx])

        # Sequential ladder, restructured for the lockstep-vmap regime:
        # the loop carries only scalars — the candidate trajectories are
        # recomputed from the final alpha with one axpy after the loop,
        # instead of being written to HBM as loop carry every trip.  The
        # ladder, acceptance test, and returned state are identical to the
        # reference's loop.  (An alpha = 1 trial hoisted outside the loop
        # was also tried; it trips an XLA:TPU memory-space-assignment
        # CHECK failure — see analysis/bench_history_r2.md.)
        class LSS(NamedTuple):
            alpha: jnp.ndarray
            done: jnp.ndarray
            accepted: jnp.ndarray
            ls_iter: jnp.ndarray
            dJ: jnp.ndarray
            J_new: jnp.ndarray
            c_new: jnp.ndarray
            merit_new: jnp.ndarray
            D: jnp.ndarray
            ratio: jnp.ndarray

        def body(s: LSS) -> LSS:
            _, _, dJ, J_new, c_new, merit_new, D, ratio, ok = evaluate(s.alpha)
            can_retry = s.alpha > o.alpha_min
            done = ok | ~can_retry
            next_alpha = jnp.where(done, s.alpha, s.alpha * o.alpha_factor)
            return LSS(alpha=next_alpha, done=done, accepted=ok,
                       ls_iter=s.ls_iter + jnp.where(done, 0, 1),
                       dJ=dJ, J_new=J_new, c_new=c_new,
                       merit_new=merit_new, D=D, ratio=ratio)

        zero = jnp.zeros((), dtype)
        init = LSS(alpha=jnp.asarray(1.0, dtype), done=jnp.array(False),
                   accepted=jnp.array(False), ls_iter=jnp.array(0),
                   dJ=zero, J_new=J, c_new=c, merit_new=merit,
                   D=zero, ratio=zero)
        out = jax.lax.while_loop(lambda s: ~s.done, body, init)
        Xc = X - out.alpha * dX
        Uc = U - out.alpha * dU
        return LS(alpha=out.alpha, done=out.done, accepted=out.accepted,
                  ls_iter=out.ls_iter, Xc=Xc, Uc=Uc, dJ=out.dJ,
                  J_new=out.J_new, c_new=out.c_new,
                  merit_new=out.merit_new, D=out.D, ratio=out.ratio)

    # --------------------------------------------------- one SQP iteration
    def sqp_iterate(self, X, U, J, c, merit, rho, drho, guess, mu, xs,
                    cost_params, cstate, hit_max):
        """One SQP iteration: QP solve, line search, rho schedule, exit
        logic (ref: TrajoptMPCReference.py:571-750).  The single body shared
        by sqp_round and utils.trace.solve_traced, so the trace cannot drift
        from the solver it traces."""
        o = self.options
        blocks = self.kkt.form_blocks(X, U, xs, cost_params, cstate)
        dxu, lam, qp_stats, singular = self.solve_qp_from_blocks(
            blocks, rho, guess)
        if math.isfinite(o.ls_step_clip):
            # trust-region clip on the control part of the QP direction
            # (see SQPOptions.ls_step_clip); one factor keeps dxu on the ray
            du_max = jnp.max(jnp.abs(dxu[:-1, self.plant.nx:]))
            dxu = dxu * jnp.minimum(
                jnp.ones((), dxu.dtype),
                o.ls_step_clip / jnp.maximum(du_max, 1e-30))
        # with ls_grad_at_base the acceptance test's directional derivative
        # is the KKT gradient (already formed) dotted with the step — once,
        # alpha-independent, instead of a gradient sweep per ladder trial
        D_base = jnp.sum(blocks.g * dxu) if o.ls_grad_at_base else None
        ls = self.line_search(X, U, dxu, J, c, merit,
                              xs, cost_params, cstate, mu=mu, D_base=D_base)
        accepted = ls.accepted
        error = ~accepted
        X1 = jnp.where(accepted, ls.Xc, X)
        U1 = jnp.where(accepted, ls.Uc, U)
        J1 = jnp.where(accepted, ls.J_new, J)
        c1 = jnp.where(accepted, ls.c_new, c)
        merit1 = jnp.where(accepted, ls.merit_new, merit)
        # regularization schedule (ref: :457-461, :466-468)
        drho_ok = jnp.minimum(drho / o.rho_factor, 1.0 / o.rho_factor)
        rho_ok = jnp.maximum(rho * drho_ok, o.rho_min)
        drho_err = jnp.maximum(drho * o.rho_factor, o.rho_factor)
        rho_err = jnp.maximum(rho * drho_err, o.rho_min)
        rho1 = jnp.where(accepted, rho_ok, rho_err)
        drho1 = jnp.where(accepted, drho_ok, drho_err)
        # exit logic (ref: :463-481); delta_J from the cancellation-safe
        # line-search difference, not a subtraction of carried totals
        delta_J = -ls.dJ
        exit_code = jnp.where(error & (rho1 > o.rho_max), EXIT_RHO_MAX, 0)
        if o.ls_fixed_alpha > 0 and o.rti_lean:
            # lean RTI computes no metrics: the iteration budget is the
            # only exit (hit_max below)
            tol_hit = jnp.array(False)
        elif o.ls_fixed_alpha > 0:
            # RTI accepts unconditionally, so an early iteration can
            # INCREASE the cost (delta_J < 0) — that is progress toward
            # feasibility, not convergence; only a small |delta_J| is
            tol_hit = jnp.abs(delta_J) < o.exit_tolerance
        else:
            tol_hit = ~error & (delta_J < o.exit_tolerance)
        if (self.cset.has_hard()
                and math.isfinite(o.hard_violation_exit_tol)):
            hv = C.max_hard_violation(self.cset, X1, U1)
            tol_hit = tol_hit & (hv <= o.hard_violation_exit_tol)
        exit_code = jnp.where(tol_hit, EXIT_TOL, exit_code)
        # max-iter only when no other exit fired this iteration
        exit_code = jnp.where(hit_max & (exit_code == 0),
                              EXIT_MAX_ITER, exit_code)
        return (X1, U1, J1, c1, merit1, rho1, drho1, exit_code, lam,
                ls, qp_stats, singular)

    # ------------------------------------------------------------ SQP loop
    def sqp_round(self, X, U, xs, cost_params, cstate, guess0=None):
        """One inner SQP solve (the reference's main loop, ref: :571-750).
        Returns (X, U, exit_code, iters, J, c, lam)."""
        o = self.options
        dtype = X.dtype
        if o.ls_fixed_alpha > 0 and o.rti_lean:
            # lean RTI never consumes J/c/merit — skip the initial rollout
            J0 = c0 = jnp.zeros((), dtype)
            mu = jnp.asarray(10.0, dtype)
        else:
            J0, c0 = self.base_metrics(X, U, xs, cost_params, cstate)
            mu = self.merit_weight(J0, c0)
        merit0 = J0 + mu * c0
        if guess0 is None:
            guess0 = jnp.zeros((self.N, self.kkt.bs), dtype=dtype)

        class S(NamedTuple):
            X: jnp.ndarray
            U: jnp.ndarray
            J: jnp.ndarray
            c: jnp.ndarray
            merit: jnp.ndarray
            rho: jnp.ndarray
            drho: jnp.ndarray
            it: jnp.ndarray
            exit_code: jnp.ndarray
            done: jnp.ndarray
            guess: jnp.ndarray

        def body(s: S) -> S:
            hit_max = s.it == (o.max_iter - 1)
            (X1, U1, J1, c1, merit1, rho1, drho1, exit_code, lam,
             _ls, _pcg, _sing) = self.sqp_iterate(
                s.X, s.U, s.J, s.c, s.merit, s.rho, s.drho, s.guess,
                mu, xs, cost_params, cstate, hit_max)
            done = (exit_code > 0)
            it1 = jnp.where(done, s.it, s.it + 1)
            s_new = S(X=X1, U=U1, J=J1, c=c1, merit=merit1, rho=rho1,
                      drho=drho1, it=it1, exit_code=exit_code, done=done,
                      guess=lam)
            # batch-invariance freeze: under vmap the while_loop runs to
            # the batch-MAX trip count and the body executes for EVERY
            # lane each trip — without this gate a scenario that already
            # exited keeps iterating (rho drift, active-set chatter, AL
            # escalation) for as long as its slowest batchmate runs, so a
            # scenario's RESULT depended on which batch it shared (
            # measured: the same stacked-AS+AL scenario diverges at B=256
            # and tracks at B=1/B=8 while a different batchmate diverges
            # instead).  Freezing at done makes solves batch-invariant.
            return jax.tree_util.tree_map(
                lambda new, old: jnp.where(s.done, old, new), s_new, s)

        init = S(X=X, U=U, J=J0, c=c0, merit=merit0,
                 rho=jnp.asarray(o.rho_init, dtype),
                 drho=jnp.asarray(1.0, dtype), it=jnp.array(0),
                 exit_code=jnp.array(0), done=jnp.array(False), guess=guess0)
        out = jax.lax.while_loop(lambda s: ~s.done, body, init)
        return out.X, out.U, out.exit_code, out.it, out.J, out.c, out.guess

    # ----------------------------------------------------------- full solve
    def solve(self, x0, u0, cost_params=None, cstate=None,
              guess=None) -> SQPResult:
        """Full SQP with the soft-constraint outer loop
        (ref: TrajoptMPCReference.py:510-760).  ``guess`` warm-starts the
        first QP's multipliers (MPC hook, ref: TrajoptMPCReference.py:439)."""
        o = self.options
        cost_params = self.cost.default_params if cost_params is None else cost_params
        if cstate is None:
            cstate = self.cset.init_state(dtype=x0.dtype)
        if guess is None:
            guess = jnp.zeros((self.N, self.kkt.bs), dtype=x0.dtype)
        xs = x0[:, 0]

        class SoftS(NamedTuple):
            X: jnp.ndarray
            U: jnp.ndarray
            cstate: Any
            outer_it: jnp.ndarray
            exit_soft: jnp.ndarray
            exit_sqp: jnp.ndarray
            sqp_iters: jnp.ndarray
            J: jnp.ndarray
            c: jnp.ndarray
            done: jnp.ndarray
            lam: jnp.ndarray

        def body(s: SoftS) -> SoftS:
            X1, U1, exit_sqp, iters, J, c, lam = self.sqp_round(
                s.X, s.U, xs, cost_params, s.cstate, guess0=s.lam)
            # soft-constraint convergence checks (ref: :483-508)
            max_c = C.max_soft_violation(self.cset, s.cstate, X1, U1)
            exit_soft = jnp.where(max_c < o.exit_tolerance_soft,
                                  EXIT_SOFT_CONVERGED, 0)
            hit_max = s.outer_it == (o.max_iter_soft - 1)
            exit_soft = jnp.where(hit_max & (exit_soft == 0),
                                  EXIT_SOFT_MAX_ITER, exit_soft)
            exiting = exit_soft > 0
            new_cstate, mu_at_limit = C.update_all_soft(self.cset, s.cstate, X1, U1)
            # only update the state when not exiting (ref: :501-507)
            cstate1 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(exiting, old, new), new_cstate, s.cstate)
            exit_soft = jnp.where(~exiting & mu_at_limit,
                                  EXIT_SOFT_MU_LIMIT, exit_soft)
            done = exit_soft > 0
            outer_it1 = jnp.where(hit_max | done, s.outer_it, s.outer_it + 1)
            s_new = SoftS(X=X1, U=U1, cstate=cstate1, outer_it=outer_it1,
                          exit_soft=exit_soft, exit_sqp=exit_sqp,
                          sqp_iters=iters, J=J, c=c, done=done, lam=lam)
            # batch-invariance freeze (see sqp_round body)
            return jax.tree_util.tree_map(
                lambda new, old: jnp.where(s.done, old, new), s_new, s)

        dtype = x0.dtype
        init = SoftS(X=x0, U=u0, cstate=cstate, outer_it=jnp.array(0),
                     exit_soft=jnp.array(0), exit_sqp=jnp.array(0),
                     sqp_iters=jnp.array(0), J=jnp.zeros((), dtype),
                     c=jnp.zeros((), dtype), done=jnp.array(False),
                     lam=guess)
        out = jax.lax.while_loop(lambda s: ~s.done, body, init)
        return SQPResult(X=out.X, U=out.U, exit_sqp=out.exit_sqp,
                         exit_soft=out.exit_soft, outer_iters=out.outer_it,
                         sqp_iters=out.sqp_iters, J=out.J, viol=out.c,
                         cstate=out.cstate, lam=out.lam)


def make_sqp(plant: Plant, cost: Cost, cset: Optional[C.ConstraintSet],
             N: int, dt: float, method: str = "N",
             options: Optional[SQPOptions] = None,
             mesh=None, horizon_axis: str = "horizon",
             use_pallas_pcg: bool = False,
             exact_schur: str = "thomas") -> SQPSolver:
    """Build a jit-specialized SQP solver (the reference's
    TrajoptMPCReference(plant, cost, constraints).SQP entry point,
    ref: TrajoptMPCReference.py:29-42,510).  ``method`` accepts a string or
    a SQPSolverMethods enum member.

    mesh + horizon_axis: run the Schur phase horizon-sharded over the
    named mesh axis — PCG methods iterate with ppermute-halo matvecs;
    method "S" uses the SPIKE substructured exact solve
    (parallel.horizon.sharded_btd_exact; needs >= 3 local block rows).
    N must divide by the axis size.
    use_pallas_pcg: run the Schur PCG as the fused on-chip Pallas
    kernel (ops/pallas_pcg; interpreter off-TPU).  exact_schur: for
    method "S", pick the exact block-tridiagonal solver — "thomas"
    (sequential scan) or "cr" (block cyclic reduction, log2(N) batched
    levels; the TPU-parallel choice)."""
    from trajoptmpcreference_tpu.solvers.methods import method_str
    method = method_str(method)
    if method not in SQP_METHODS:
        raise ValueError(
            f"Invalid QP solver {method!r}; options are N (dense KKT), "
            "S (Schur), PCG-J / PCG-BJ / PCG-SS (ref: :590-596)")
    if cset is None:
        cset = C.ConstraintSet(plant.nq, plant.nv, plant.nu, N)
    options = options or SQPOptions()
    if exact_schur not in ("thomas", "cr", "cr_refine"):
        raise ValueError(
            f"Invalid exact_schur {exact_schur!r}; options are 'thomas' "
            "(sequential block LU), 'cr' (block cyclic reduction), or "
            "'cr_refine' (cr + one iterative-refinement step)")
    kkt = KKTSystem(plant=plant, cost=cost, cset=cset, N=N, dt=dt,
                    use_pallas_pcg=use_pallas_pcg, exact_schur=exact_schur)
    if mesh is not None:
        if method == "N":
            raise ValueError(
                "horizon sharding requires a Schur method: PCG-* (halo "
                "matvec iterations) or S (SPIKE substructured exact solve)")
        P = mesh.shape[horizon_axis]
        if N % P:
            raise ValueError(
                f"N={N} must divide by the horizon axis size {P}")
        if method == "S" and N // P < 3:
            raise ValueError(
                f"the sharded exact solve needs >= 3 local block rows "
                f"(N={N}, shards={P}); use fewer shards or a PCG method")
    return SQPSolver(plant=plant, cost=cost, cset=cset, N=N, dt=dt,
                     method=method, options=options, kkt=kkt,
                     mesh=mesh, horizon_axis=horizon_axis)
