"""Per-iteration solver tracing as scan-carried arrays.

The reference's signature subsystem is the ``matrix_`` ndarray subclass that
intercepts every arithmetic op (ref: overloading.py:146-164) plus a
per-iteration dict trace (ref: TrajoptMPCReference.py:555-569,691-705).
Under XLA, op interception is impossible (and unnecessary — see
utils/flops.py for compiler-level op accounting); the solver-state trace is
rebuilt here as fixed-shape arrays emitted from a bounded iteration loop, so
it stays jit/vmap-compatible (trace a batch of 4096 solves in one program).

``solve_traced`` runs the same SQP semantics as SQPSolver.sqp_round but with
a ``fori_loop`` over max_iter (state frozen after exit) so every iteration
writes one trace row — the shape of the reference's RETURN_TRACE_SQP output.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.solvers.sqp import SQPSolver


class SQPTrace(NamedTuple):
    """Fixed-shape per-iteration history; rows past the exit iteration hold
    the frozen final state.  Fields mirror the reference's trace dict
    (ref: TrajoptMPCReference.py:555-569)."""

    J: jnp.ndarray            # (max_iter,)
    c: jnp.ndarray            # (max_iter,) hard-constraint violation
    merit: jnp.ndarray        # (max_iter,)
    alpha: jnp.ndarray        # (max_iter,) accepted (or last tried) alpha
    rho: jnp.ndarray          # (max_iter,)
    D: jnp.ndarray            # (max_iter,) directional derivative
    reduction_ratio: jnp.ndarray
    pcg_iters: jnp.ndarray    # (max_iter,)
    accepted: jnp.ndarray     # (max_iter,) bool line-search success
    live: jnp.ndarray         # (max_iter,) bool row corresponds to a real iter
    exit_code: jnp.ndarray    # scalar
    iters: jnp.ndarray        # scalar
    # PCG dual trace per SQP iteration, (max_iter, max_iter_linSys+1) —
    # |nu| and TRUE residual |gamma - S lam| histories (the reference's
    # (trace, trace2), ref: GBD-PCG-Python/PCG.py:82-95).  Populated only
    # when options.trace_linsys is set on a PCG method; None otherwise.
    pcg_nu: Any = None
    pcg_resid: Any = None


def solve_traced(solver: SQPSolver, x0, u0, cost_params=None, cstate=None):
    """One SQP round with tracing (soft-constraint outer loop not included —
    trace one round per outer update, as the reference's trace does).

    Returns (X, U, SQPTrace).
    """
    o = solver.options
    cost_params = (solver.cost.default_params
                   if cost_params is None else cost_params)
    if cstate is None:
        cstate = solver.cset.init_state(dtype=x0.dtype)
    xs = x0[:, 0]
    dtype = x0.dtype
    max_iter = o.max_iter

    # the SAME fused base-metrics sweep the solver uses (sqp_round) — a
    # separate total_cost/total_violation pair would reassociate the sums
    # and the traced run could round onto a different iterate path
    J0, c0 = solver.base_metrics(x0, u0, xs, cost_params, cstate)
    mu = solver.merit_weight(J0, c0)
    merit0 = J0 + mu * c0
    guess0 = jnp.zeros((solver.N, solver.kkt.bs), dtype=dtype)

    class S(NamedTuple):
        X: jnp.ndarray
        U: jnp.ndarray
        J: jnp.ndarray
        c: jnp.ndarray
        merit: jnp.ndarray
        rho: jnp.ndarray
        drho: jnp.ndarray
        exit_code: jnp.ndarray
        done: jnp.ndarray
        guess: jnp.ndarray
        trace: Any

    with_linsys = (o.trace_linsys and solver.method.startswith("PCG")
                   and solver.mesh is None
                   and not solver.kkt.use_pallas_pcg)
    lin_shape = (max_iter, o.max_iter_linSys + 1)
    trace0 = SQPTrace(
        J=jnp.zeros(max_iter, dtype), c=jnp.zeros(max_iter, dtype),
        merit=jnp.zeros(max_iter, dtype), alpha=jnp.zeros(max_iter, dtype),
        rho=jnp.zeros(max_iter, dtype), D=jnp.zeros(max_iter, dtype),
        reduction_ratio=jnp.zeros(max_iter, dtype),
        pcg_iters=jnp.zeros(max_iter, jnp.int32),
        accepted=jnp.zeros(max_iter, bool), live=jnp.zeros(max_iter, bool),
        exit_code=jnp.array(0), iters=jnp.array(0),
        pcg_nu=jnp.zeros(lin_shape, dtype) if with_linsys else None,
        pcg_resid=jnp.zeros(lin_shape, dtype) if with_linsys else None)

    def body(it, s: S) -> S:
        # the single shared iteration body (SQPSolver.sqp_iterate) — the
        # trace CANNOT drift from the solver it traces
        (X1, U1, J1, c1, merit1, rho1, drho1, exit_code, lam,
         ls, qp_stats, singular) = solver.sqp_iterate(
            s.X, s.U, s.J, s.c, s.merit, s.rho, s.drho, s.guess,
            mu, xs, cost_params, cstate, it == max_iter - 1)
        pcg_iters = qp_stats.pcg_iters
        live = ~s.done
        accepted = ls.accepted & live
        newly_done = live & (exit_code > 0)
        tr = s.trace
        if with_linsys:
            tr = tr._replace(
                pcg_nu=tr.pcg_nu.at[it].set(
                    jnp.where(live, qp_stats.nu_trace, tr.pcg_nu[it])),
                pcg_resid=tr.pcg_resid.at[it].set(
                    jnp.where(live, qp_stats.res_trace, tr.pcg_resid[it])))
        tr = tr._replace(
            J=tr.J.at[it].set(jnp.where(live, J1, tr.J[it])),
            c=tr.c.at[it].set(jnp.where(live, c1, tr.c[it])),
            merit=tr.merit.at[it].set(jnp.where(live, merit1, tr.merit[it])),
            alpha=tr.alpha.at[it].set(jnp.where(live, ls.alpha, 0.0)),
            rho=tr.rho.at[it].set(jnp.where(live, rho1, 0.0)),
            D=tr.D.at[it].set(jnp.where(live, ls.D, 0.0)),
            reduction_ratio=tr.reduction_ratio.at[it].set(
                jnp.where(live, ls.ratio, 0.0)),
            pcg_iters=tr.pcg_iters.at[it].set(
                jnp.where(live, pcg_iters, 0).astype(jnp.int32)),
            accepted=tr.accepted.at[it].set(accepted),
            live=tr.live.at[it].set(live),
            exit_code=jnp.where(newly_done, exit_code, tr.exit_code),
            iters=jnp.where(live, it + 1, tr.iters))
        keep = live & ~(exit_code > 0)
        return S(X=jnp.where(live, X1, s.X), U=jnp.where(live, U1, s.U),
                 J=jnp.where(live, J1, s.J), c=jnp.where(live, c1, s.c),
                 merit=jnp.where(live, merit1, s.merit),
                 rho=jnp.where(keep, rho1, s.rho),
                 drho=jnp.where(keep, drho1, s.drho),
                 exit_code=tr.exit_code, done=s.done | (exit_code > 0),
                 guess=jnp.where(live, lam, s.guess), trace=tr)

    init = S(X=x0, U=u0, J=J0, c=c0, merit=merit0,
             rho=jnp.asarray(o.rho_init, dtype), drho=jnp.asarray(1.0, dtype),
             exit_code=jnp.array(0), done=jnp.array(False), guess=guess0,
             trace=trace0)
    out = jax.lax.fori_loop(0, max_iter, body, init)
    return out.X, out.U, out.trace
