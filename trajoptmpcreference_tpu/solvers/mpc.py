"""Receding-horizon MPC loop: warm-started re-solves at control rate.

The reference advertises an MPC loop (``runMPCExample`` is called by
ref: examples/pendulum.py:28 and ``MPCSolverMethods`` lists iLQR / QP-N /
QP-S / QP-PCG-{J,BJ,SS}, ref: TrajoptMPCReference.py:21-27) but the loop
itself was dropped from the VCA-EPFL snapshot.  This is a from-scratch
TPU-native implementation of that capability built from the surviving
warm-start hooks:

  * trajectory shift between steps (standard receding horizon);
  * soft-constraint hyperparameter shift
    (ref: TrajoptConstraint.py:168-176, shift_soft_constraint_constants —
    NB the reference's in-place version overwrites columns ``shift:`` with
    init values, wiping everything but column 0; ours shifts correctly);
  * PCG / KKT multiplier warm start (ref: PCG.py:33 update_guess,
    TrajoptMPCReference.py:439-440).

TPU-first design: the whole closed-loop simulation is ONE ``lax.scan`` over
control steps — solver + plant rollout stay on-device, so an entire MPC
episode is a single XLA program, vmappable over thousands of scenarios and
shardable over a mesh (parallel/).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.models.plants import Plant
from trajoptmpcreference_tpu.solvers import constraints as C
from trajoptmpcreference_tpu.solvers.costs import Cost
from trajoptmpcreference_tpu.solvers.ilqr import ILQRSolver, make_ilqr
from trajoptmpcreference_tpu.solvers.sqp import SQPOptions, SQPSolver, make_sqp

MPC_METHODS = ("iLQR", "QP-N", "QP-S", "QP-PCG-J", "QP-PCG-BJ", "QP-PCG-SS")


class MPCResult(NamedTuple):
    """Closed-loop episode results; leading axis = control steps."""

    X_applied: jnp.ndarray    # (nx, steps+1) actual closed-loop states
    U_applied: jnp.ndarray    # (nu, steps) applied first controls
    J_solve: jnp.ndarray      # (steps,) cost reported by each solve
    iters: jnp.ndarray        # (steps,) solver iterations per step
    exit_codes: jnp.ndarray   # (steps,) per-solve exit code
    X_plan_last: jnp.ndarray  # (nx, N) final plan (warm-start state)
    U_plan_last: jnp.ndarray  # (nu, N-1)
    cstate_last: Any          # final soft-constraint hyperparameters
    lam_last: jnp.ndarray     # (N, bs) final shifted multipliers


def _shift_plan(X, U, shift: int):
    """Receding-horizon warm start: drop the first ``shift`` knots, repeat
    the terminal knot / last control."""
    Xs = jnp.roll(X, -shift, axis=1)
    Us = jnp.roll(U, -shift, axis=1)
    NX = X.shape[1]
    NU = U.shape[1]
    colsX = jnp.arange(NX)
    colsU = jnp.arange(NU)
    Xs = jnp.where(colsX[None, :] < NX - shift, Xs, X[:, -1:])
    Us = jnp.where(colsU[None, :] < NU - shift, Us, U[:, -1:])
    return Xs, Us


@dataclasses.dataclass(frozen=True)
class MPCController:
    """A receding-horizon controller around an SQP or iLQR solver."""

    solver: Union[SQPSolver, ILQRSolver]
    sim_plant: Plant          # the "true" plant used to propagate the state
    shift: int = 1
    # Closed-loop plan watchdog (the SURVEY §5 failure-detection
    # analogue): when a solve returns a non-finite plan or a first
    # control beyond this bound, the controller applies ZERO control for
    # that step and cold-resets the entire warm-start carry (plan,
    # multipliers, soft-constraint state) so the next step re-solves
    # from scratch — one bad solve costs one coasting step instead of
    # poisoning every subsequent warm start (the divergence mechanism in
    # the stacked-constraint forensics, bench_history_r5.md finding 10).
    # inf = off (default; reference parity).
    watchdog_u_max: float = float("inf")

    @property
    def plant(self) -> Plant:
        return self.solver.plant

    def run(self, x0: jnp.ndarray, steps: int,
            X_init: Optional[jnp.ndarray] = None,
            U_init: Optional[jnp.ndarray] = None,
            cost_params: Any = None,
            cstate_init: Any = None,
            lam_init: Optional[jnp.ndarray] = None) -> MPCResult:
        """Simulate ``steps`` control steps of closed-loop MPC from state x0.

        Each step: solve the horizon problem warm-started from the shifted
        previous plan, apply the first control to ``sim_plant``, advance.

        ``cstate_init`` / ``lam_init`` seed the soft-constraint state and the
        KKT-multiplier warm start — the chaining hooks ``run_scheduled`` uses
        to hand one phase's final carry to the next.
        """
        solver = self.solver
        N = solver.N
        dt = solver.dt
        nx, nu = self.plant.nx, self.plant.nu
        dtype = x0.dtype
        is_sqp = isinstance(solver, SQPSolver)
        cost_params = (solver.cost.default_params
                       if cost_params is None else cost_params)

        X0 = (jnp.tile(x0[:, None], (1, N)) if X_init is None else X_init)
        U0 = (jnp.zeros((nu, N - 1), dtype=dtype) if U_init is None
              else U_init)
        cstate0 = (solver.cset.init_state(dtype=dtype)
                   if cstate_init is None else cstate_init)
        if lam_init is not None:
            lam0 = lam_init
        else:
            lam0 = (jnp.zeros((N, solver.kkt.bs), dtype=dtype) if is_sqp
                    else jnp.zeros((0,), dtype=dtype))
        # fresh soft-constraint state for watchdog cold-resets
        cstate_fresh = solver.cset.init_state(dtype=dtype)

        def step(carry, _):
            x, Xp, Up, cstate, lam = carry
            # current state enters the plan head
            Xp = Xp.at[:, 0].set(x)
            if is_sqp:
                res = solver.solve(Xp, Up, cost_params=cost_params,
                                   cstate=cstate, guess=lam)
                it, code, lam1 = res.sqp_iters, res.exit_sqp, res.lam
            else:
                res = solver.solve(Xp, Up, cost_params=cost_params,
                                   cstate=cstate)
                it, code, lam1 = res.iters, res.exit_ilqr, lam
            u0 = res.U[:, 0]
            Xs, Us = _shift_plan(res.X, res.U, self.shift)
            cstate1 = C.shift_all_soft(solver.cset, res.cstate, self.shift)
            if is_sqp:
                # shift like the plan; zero-fill the vacated tail rows (a
                # fresh multiplier guess) instead of letting roll wrap the
                # head rows — measured final EE error on the 300-step f64
                # flagship loop: zero-fill 0.0021 m, wrap 0.033 m,
                # repeat-last-row 2.28 m
                lam_s = jnp.roll(lam1, -self.shift, axis=0)
                rows = jnp.arange(lam1.shape[0])
                lam_s = jnp.where(
                    (rows < lam1.shape[0] - self.shift)[:, None],
                    lam_s, jnp.zeros_like(lam1[-1:]))
            else:
                lam_s = lam1
            if math.isfinite(self.watchdog_u_max):
                # plan watchdog: coast + cold-reset the carry on a bad
                # solve (see the field docstring)
                bad = (~jnp.all(jnp.isfinite(res.U))
                       | ~jnp.all(jnp.isfinite(res.X))
                       | (jnp.max(jnp.abs(u0)) > self.watchdog_u_max))
                u0 = jnp.where(bad, 0.0, u0)
                Xs = jnp.where(bad, jnp.tile(x[:, None], (1, N)), Xs)
                Us = jnp.where(bad, 0.0, Us)
                lam_s = jnp.where(bad, 0.0, lam_s)
                cstate1 = jax.tree_util.tree_map(
                    lambda cur, fresh: jnp.where(bad, fresh, cur),
                    cstate1, cstate_fresh)
            x1 = self.sim_plant.step(x, u0, dt)
            return ((x1, Xs, Us, cstate1, lam_s),
                    (x1, u0, res.J, it, code))

        (xf, Xp, Up, cstate_f, lam_f), (Xs, Us, Js, its, codes) = jax.lax.scan(
            step, (x0, X0, U0, cstate0, lam0), None, length=steps)
        X_applied = jnp.concatenate([x0[:, None], Xs.T], axis=1)
        return MPCResult(X_applied=X_applied, U_applied=Us.T, J_solve=Js,
                         iters=its, exit_codes=codes,
                         X_plan_last=Xp, U_plan_last=Up,
                         cstate_last=cstate_f, lam_last=lam_f)


def run_scheduled(phases, x0: jnp.ndarray, cost_params: Any = None
                  ) -> MPCResult:
    """Chain MPC phases with different solver budgets over one episode.

    ``phases`` is a sequence of ``(controller, steps)`` pairs over the SAME
    problem (plant / cost / N / dt); each phase starts from the previous
    phase's closed-loop state and inherits its full warm-start carry (plan,
    soft-constraint hyperparameters, KKT multipliers), so the chained
    episode is semantically one receding-horizon loop whose per-step solver
    budget changes on a static schedule.

    This is the standard MPC iteration-scheduling trick (the limit case is
    Diehl's RTI): spend full SQP iterations only while the plan is cold —
    the first few steps after a setpoint change — then drop to a cheaper
    steady-state budget once the warm start is doing the work.  A uniform
    low budget fails the cold start (measured: 2 SQP iters/step from a 5 m
    goal error diverges, analysis/bench_history_r2.md finding 7) while a
    uniform high budget wastes iterations in steady state; the schedule is
    jit-friendly because each phase is its own ``lax.scan``.

    Returns one MPCResult whose per-step arrays are the concatenation of
    the phases (X_applied keeps a single shared initial state column).
    """
    res = None
    parts = []
    x = x0
    for ctrl, steps in phases:
        kw = {}
        if res is not None:
            kw = dict(X_init=res.X_plan_last, U_init=res.U_plan_last,
                      cstate_init=res.cstate_last, lam_init=res.lam_last)
        res = ctrl.run(x, steps=steps, cost_params=cost_params, **kw)
        parts.append(res)
        x = res.X_applied[:, -1]
    return MPCResult(
        X_applied=jnp.concatenate(
            [parts[0].X_applied] + [p.X_applied[:, 1:] for p in parts[1:]],
            axis=1),
        U_applied=jnp.concatenate([p.U_applied for p in parts], axis=1),
        J_solve=jnp.concatenate([p.J_solve for p in parts]),
        iters=jnp.concatenate([p.iters for p in parts]),
        exit_codes=jnp.concatenate([p.exit_codes for p in parts]),
        X_plan_last=res.X_plan_last, U_plan_last=res.U_plan_last,
        cstate_last=res.cstate_last, lam_last=res.lam_last)


def make_mpc(plant: Plant, cost: Cost, cset: Optional[C.ConstraintSet],
             N: int, dt: float, method: str = "QP-S",
             options: Optional[SQPOptions] = None,
             sim_plant: Optional[Plant] = None,
             shift: int = 1) -> MPCController:
    """Build a receding-horizon MPC controller (the capability behind the
    reference's ``MPCSolverMethods`` enum, ref: TrajoptMPCReference.py:21-27,
    and the missing ``runMPCExample`` called by examples/pendulum.py:28).

    method: 'iLQR' or 'QP-X' with X in {N, S, PCG-J, PCG-BJ, PCG-SS}.
    sim_plant: optional distinct "true" plant (model-mismatch studies);
    defaults to the solver plant.
    """
    from trajoptmpcreference_tpu.solvers.methods import method_str
    method = method_str(method)
    if method not in MPC_METHODS:
        raise ValueError(f"Invalid MPC method {method!r}; options are "
                         f"{MPC_METHODS} (ref: TrajoptMPCReference.py:21-27)")
    if options is None:
        # The reference's default lower reduction-ratio bound (0.05) rejects
        # the near-zero steps of a warm-started solve, so every MPC step
        # past convergence fails its line search and the loop destabilizes.
        # The reference's own driver disables the bound
        # (ref: examples/twolinks.py:87); default MPC to that.
        options = SQPOptions(expected_reduction_min=-100.0)
    if method == "iLQR":
        solver = make_ilqr(plant, cost, cset, N, dt, options=options)
    else:
        solver = make_sqp(plant, cost, cset, N, dt, method=method[3:],
                          options=options)
    return MPCController(solver=solver, sim_plant=sim_plant or plant,
                         shift=shift)
