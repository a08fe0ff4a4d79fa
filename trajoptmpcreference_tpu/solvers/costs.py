"""Cost layer: quadratic and task-space (URDF) costs as pure functions.

The reference's class hierarchy (ref: TrajoptCost.py:12-656) becomes a
``Cost`` bundle of stage/terminal value-gradient-hessian functions over a
*params pytree* — so goals (xg) and weights can be batched with vmap, the
solver closes over the functions, and everything jits.

Stage functions take the timestep k as a traced int so the reference's
``QF_start`` shifting (ref: TrajoptCost.py:40-47) works inside lax loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.models.plants import Plant


@dataclasses.dataclass(frozen=True)
class Cost:
    nx: int
    nu: int
    stage_value: Callable      # (params, x, u, k) -> scalar
    term_value: Callable       # (params, x, k) -> scalar
    stage_gradient: Callable   # (params, x, u, k) -> (nx+nu,)
    term_gradient: Callable    # (params, x, k) -> (nx,)
    stage_hessian: Callable    # (params, x, u, k) -> (nx+nu, nx+nu)
    term_hessian: Callable     # (params, x, k) -> (nx, nx)
    default_params: Any
    # Cancellation-safe cost differences (f32 accuracy in the merit
    # acceptance test): stage(xc,uc) - stage(x,u) computed WITHOUT forming
    # the two large values first.  For the quadratic-residual costs here,
    # 0.5 rc'Q rc - 0.5 r'Q r = 0.5 (rc - r)'Q (rc + r) — the subtraction
    # happens between O(residual)-magnitude quantities, not O(J) ones, so
    # near convergence the difference keeps ~7 significant digits in f32
    # instead of none.  None => callers fall back to value subtraction.
    stage_value_diff: Optional[Callable] = None  # (p, x, u, xc, uc, k) -> scalar
    term_value_diff: Optional[Callable] = None   # (p, x, xc, k) -> scalar
    # True when stage_hessian can have nonzero (x, u) cross blocks.  Every
    # cost in the zoo is separable in x and u (state-only task terms +
    # u'Ru) except NumericalCost's outer(g, g); the KKT Schur assembly
    # exploits xu_coupled=False to invert G blockwise (kkt._inv_psd).
    xu_coupled: bool = False


class QuadraticCostParams(NamedTuple):
    Q: jnp.ndarray
    QF: jnp.ndarray
    R: jnp.ndarray
    xg: jnp.ndarray


def _quad_diff(Q, r, rc):
    """0.5 rc'Q rc - 0.5 r'Q r, evaluated as 0.5 (rc-r)'Q (rc+r) (Q
    symmetric) — cancellation-safe in f32 (see Cost.stage_value_diff)."""
    return 0.5 * ((rc - r) @ Q @ (rc + r))


def _currQ(params, k, QF_start, terminal):
    """QF on the terminal state, or from QF_start onward
    (ref: TrajoptCost.py:40-47)."""
    if terminal or QF_start is None:
        return params.QF if terminal else params.Q
    return jnp.where(k >= QF_start, params.QF, params.Q)


def QuadraticCost(Q, QF, R, xg, QF_start: Optional[int] = None) -> Cost:
    """0.5 (x-xg)^T Q (x-xg) + 0.5 u^T R u (ref: TrajoptCost.py:24-104)."""
    Q = jnp.asarray(Q)
    QF = jnp.asarray(QF)
    R = jnp.asarray(R)
    xg = jnp.asarray(xg)
    nx = Q.shape[0]
    nu = R.shape[0]
    params0 = QuadraticCostParams(Q, QF, R, xg)

    def stage_value(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        dx = x - p.xg
        return 0.5 * dx @ cQ @ dx + 0.5 * u @ p.R @ u

    def term_value(p, x, k):
        dx = x - p.xg
        return 0.5 * dx @ p.QF @ dx

    def stage_gradient(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        return jnp.concatenate([(x - p.xg) @ cQ, u @ p.R])

    def term_gradient(p, x, k):
        return (x - p.xg) @ p.QF

    def stage_hessian(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        Z1 = jnp.zeros((nx, nu), dtype=x.dtype)
        top = jnp.concatenate([cQ, Z1], axis=1)
        bot = jnp.concatenate([Z1.T, p.R], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def term_hessian(p, x, k):
        return p.QF

    def stage_value_diff(p, x, u, xc, uc, k):
        cQ = _currQ(p, k, QF_start, False)
        # residual difference is exactly xc - x (xg cancels analytically)
        return (0.5 * ((xc - x) @ cQ @ ((xc - p.xg) + (x - p.xg)))
                + _quad_diff(p.R, u, uc))

    def term_value_diff(p, x, xc, k):
        return 0.5 * ((xc - x) @ p.QF @ ((xc - p.xg) + (x - p.xg)))

    return Cost(nx, nu, stage_value, term_value, stage_gradient,
                term_gradient, stage_hessian, term_hessian, params0,
                stage_value_diff=stage_value_diff,
                term_value_diff=term_value_diff)


def UrdfCost(plant: Plant, Q, QF, R, xg, QF_start: Optional[int] = None,
             hess_mode: int = 0, ref_compat: bool = False) -> Cost:
    """Task-space cost on [ee position; ee velocity] for a URDF arm
    (ref: TrajoptCost.py:371-569).

    delta = [ee_pos_k(q); J(q) qd] - xg with k = min(3, n) task dims
    (the reference's planar (x, y) slice for 2-link arms,
    ref: TrajoptCost.py:425-435).  Gradient uses the total-state Jacobian
    [[J,0],[dJ/dq.qd, J]] (ref: TrajoptCost.py:437-458).

    hess_mode (ref: TrajoptCost.py:391-395,482-519):
      0: Gauss-Newton (Q J_tot)^T J_tot   [reference default]
      1: exact — autodiff of the analytic gradient (replaces the reference's
         hand-built dJtotdq tensor, which is 2-link-specific)
      2: grad^T grad outer product
      3: zero state Hessian

    ref_compat (2-link only): reproduce the reference's hand-coded dJdq
    shortcut (ref: RBDReference.py:256-266) *including its sign error* on the
    d J[1,0]/dq row (the reference writes ``dJdq[2,:] = -J[0,:]`` where the
    true derivative is ``+J[0,:]``; verified by finite differences).  The
    default (False) uses the correct general-n total-state Jacobian; compat
    exists so golden-parity tests can match the reference's iterates exactly.
    """
    if plant.kinematics is None:
        raise ValueError("UrdfCost requires a URDF plant with kinematics")
    kin = plant.kinematics
    n = plant.nq
    nx = plant.nx
    nu = plant.nu
    if ref_compat and n != 2:
        raise ValueError("ref_compat reproduces the reference's 2-link-only "
                         "dJdq shortcut (ref: RBDReference.py:256-266)")
    Q = jnp.asarray(Q)
    QF = jnp.asarray(QF)
    R = jnp.asarray(R)
    xg = jnp.asarray(xg)
    params0 = QuadraticCostParams(Q, QF, R, xg)
    kdim = min(3, n)

    def delta_x(p, x):
        q, qd = x[:n], x[n:]
        if kin.task_vec is not None:
            # one frames pass (and the Pallas tile kernel when the plant
            # enables it) instead of separate ee_pos + jacobian chains
            return kin.task_vec(q, qd) - p.xg
        pos = kin.ee_pos_xyz(q)[:kdim]
        vel = kin.jacobian(q) @ qd
        return jnp.concatenate([pos, vel]) - p.xg

    def stage_value(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        dx = delta_x(p, x)
        return 0.5 * dx @ cQ @ dx + 0.5 * u @ p.R @ u

    def term_value(p, x, k):
        dx = delta_x(p, x)
        return 0.5 * dx @ p.QF @ dx

    def _jt(q, qd):
        if not ref_compat:
            return kin.jacobian_tot_state(q, qd)     # (2k, 2n)
        # reference 2-link shortcut, incl. its dJ[1,0]/dq sign
        # (ref: RBDReference.py:256-266, 318-336)
        J = kin.jacobian(q)                          # (2, 2)
        D = jnp.stack([
            -J[1, :],
            jnp.stack([-J[1, 1], -J[1, 1]]),
            -J[0, :],
            jnp.stack([J[0, 1], J[0, 1]]),
        ])                                           # (4, 2)
        J2 = (D @ qd).reshape(2, 2)
        top = jnp.concatenate([J, jnp.zeros_like(J)], axis=1)
        bot = jnp.concatenate([J2, J], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def _grad_x(p, x, cQ):
        q, qd = x[:n], x[n:]
        Jt = _jt(q, qd)                              # (2k, 2n)
        return (delta_x(p, x) @ cQ) @ Jt             # (2n,)

    def stage_gradient(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        return jnp.concatenate([_grad_x(p, x, cQ), u @ p.R])

    def term_gradient(p, x, k):
        return _grad_x(p, x, p.QF)

    def _hess_x(p, x, cQ):
        q, qd = x[:n], x[n:]
        if hess_mode == 0:
            Jt = _jt(q, qd)
            return (cQ @ Jt).T @ Jt
        elif hess_mode == 1:
            # EXACT Hessian — an ORACLE mode for validation, not a batched
            # production path: the autodiff must use the plain per-sample
            # kinematics (custom_vmap lanes wrappers recurse under jvp —
            # see ops/lanes.py), so under vmap at bench batch sizes this
            # falls off the lanes fast path entirely.  The flagship uses
            # hess_mode=0 (Gauss-Newton); select 1 only to cross-check it
            # (ref: TrajoptCost.py:391 'exact' column of the grid).
            kp = kin.plain

            def grad_plain(xx):
                qq, qqd = xx[:n], xx[n:]
                Jt = kp.jacobian_tot_state(qq, qqd)
                pos = kp.ee_pos_xyz(qq)[:kdim]
                vel = kp.jacobian(qq) @ qqd
                d = jnp.concatenate([pos, vel]) - p.xg
                return (d @ cQ) @ Jt

            return jax.jacfwd(grad_plain)(x)
        elif hess_mode == 2:
            g = _grad_x(p, x, cQ)
            return jnp.outer(g, g)
        elif hess_mode == 3:
            return jnp.zeros((nx, nx), dtype=x.dtype)
        raise ValueError(f"invalid hess_mode {hess_mode}")

    def stage_hessian(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        hx = _hess_x(p, x, cQ)
        Z = jnp.zeros((nx, nu), dtype=x.dtype)
        top = jnp.concatenate([hx, Z], axis=1)
        bot = jnp.concatenate([Z.T, p.R], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def term_hessian(p, x, k):
        return _hess_x(p, x, p.QF)

    def stage_value_diff(p, x, u, xc, uc, k):
        cQ = _currQ(p, k, QF_start, False)
        return (_quad_diff(cQ, delta_x(p, x), delta_x(p, xc))
                + _quad_diff(p.R, u, uc))

    def term_value_diff(p, x, xc, k):
        return _quad_diff(p.QF, delta_x(p, x), delta_x(p, xc))

    return Cost(nx, nu, stage_value, term_value, stage_gradient,
                term_gradient, stage_hessian, term_hessian, params0,
                stage_value_diff=stage_value_diff,
                term_value_diff=term_value_diff)


def NumericalCost(plant: Plant, Q, QF, R, xg, eps: float = 1e-5,
                  QF_start: Optional[int] = None) -> Cost:
    """Central-difference gradient checker around the task-space cost
    (ref: TrajoptCost.py:573-654).  Gradient/Hessian by finite differences of
    the UrdfCost value — a test oracle, not a production cost."""
    base = UrdfCost(plant, Q, QF, R, xg, QF_start=QF_start)
    nx, nu = base.nx, base.nu

    def _fd_grad(f, z):
        def one(i):
            dz = jnp.zeros_like(z).at[i].set(eps)
            return (f(z + dz) - f(z - dz)) / (2 * eps)
        return jnp.stack([one(i) for i in range(z.shape[0])])

    def stage_gradient(p, x, u, k):
        z = jnp.concatenate([x, u])
        return _fd_grad(lambda zz: base.stage_value(p, zz[:nx], zz[nx:], k), z)

    def term_gradient(p, x, k):
        return _fd_grad(lambda zz: base.term_value(p, zz, k), x)

    def stage_hessian(p, x, u, k):
        g = stage_gradient(p, x, u, k)
        return jnp.outer(g, g)

    def term_hessian(p, x, k):
        g = term_gradient(p, x, k)
        return jnp.outer(g, g)

    return Cost(nx, nu, base.stage_value, base.term_value, stage_gradient,
                term_gradient, stage_hessian, term_hessian, base.default_params,
                xu_coupled=True)


def ArmCost(Q, QF, R, xg, l1: float = 1.0, l2: float = 1.0,
            QF_start: Optional[int] = None) -> Cost:
    """Closed-form 2-link end-effector cost (ref: TrajoptCost.py:111-363).

    The reference builds this symbolically in sympy and lambdifies; here the
    closed-form planar kinematics are written directly and the
    gradient/Hessian come from autodiff (exact, replacing the symbolic
    diff + lambdify pipeline).
    """
    Q = jnp.asarray(Q)
    QF = jnp.asarray(QF)
    R = jnp.asarray(R)
    xg = jnp.asarray(xg)
    params0 = QuadraticCostParams(Q, QF, R, xg)
    nx, nu = 4, 2

    def _delta(p, x):
        q1, q2, qd = x[0], x[1], x[2:4]
        s1, c1 = jnp.sin(q1), jnp.cos(q1)
        s12, c12 = jnp.sin(q1 + q2), jnp.cos(q1 + q2)
        pos = jnp.stack([-l2 * s12 - l1 * s1, l2 * c12 + l1 * c1])
        J = jnp.stack([
            jnp.stack([-l2 * c12 - l1 * c1, -l2 * c12]),
            jnp.stack([-l2 * s12 - l1 * s1, -l2 * s12]),
        ])
        return jnp.concatenate([pos, J @ qd]) - p.xg

    def stage_value(p, x, u, k):
        cQ = _currQ(p, k, QF_start, False)
        dx = _delta(p, x)
        return 0.5 * dx @ cQ @ dx + 0.5 * u @ p.R @ u

    def term_value(p, x, k):
        dx = _delta(p, x)
        return 0.5 * dx @ p.QF @ dx

    stage_gradient = lambda p, x, u, k: jnp.concatenate([
        jax.grad(lambda xx: stage_value(p, xx, jnp.zeros(nu, x.dtype), k))(x),
        u @ p.R])
    term_gradient = lambda p, x, k: jax.grad(lambda xx: term_value(p, xx, k))(x)

    def stage_hessian(p, x, u, k):
        hx = jax.hessian(lambda xx: term_value(
            QuadraticCostParams(p.Q, _currQ(p, k, QF_start, False), p.R, p.xg), xx, k))(x)
        Z = jnp.zeros((nx, nu), dtype=x.dtype)
        top = jnp.concatenate([hx, Z], axis=1)
        bot = jnp.concatenate([Z.T, p.R], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def term_hessian(p, x, k):
        return jax.hessian(lambda xx: term_value(p, xx, k))(x)

    def stage_value_diff(p, x, u, xc, uc, k):
        cQ = _currQ(p, k, QF_start, False)
        return (_quad_diff(cQ, _delta(p, x), _delta(p, xc))
                + _quad_diff(p.R, u, uc))

    def term_value_diff(p, x, xc, k):
        return _quad_diff(p.QF, _delta(p, x), _delta(p, xc))

    return Cost(nx, nu, stage_value, term_value, stage_gradient,
                term_gradient, stage_hessian, term_hessian, params0,
                stage_value_diff=stage_value_diff,
                term_value_diff=term_value_diff)


def total_cost_diff(cost: Cost, cset, cstate, N: int,
                    X, U, Xc, Uc, cost_params):
    """J(Xc, Uc) - J(X, U), summed from per-stage differences.

    An f32 merit acceptance must resolve cost changes of order
    exit_tolerance while J itself can be 1e4..1e6; subtracting two
    separately-accumulated totals leaves no significant bits.  Summing
    per-stage differences — each computed in residual form when the cost
    provides stage_value_diff — keeps the cancellation at
    O(stage-residual) magnitudes instead of O(J).  Shared by the SQP and
    iLQR line searches (solvers/sqp.py, solvers/ilqr.py)."""
    from trajoptmpcreference_tpu.solvers import constraints as C

    ks = jnp.arange(N - 1)
    svd = cost.stage_value_diff

    def stage(x, u, xc, uc, k):
        if svd is not None:
            d = svd(cost_params, x, u, xc, uc, k)
        else:
            d = (cost.stage_value(cost_params, xc, uc, k)
                 - cost.stage_value(cost_params, x, u, k))
        if cset.has_soft():
            d = d + (C.stage_soft_value(cset, cstate, xc, uc, k)
                     - C.stage_soft_value(cset, cstate, x, u, k))
        return d

    d = jnp.sum(jax.vmap(stage)(X[:, :-1].T, U.T, Xc[:, :-1].T, Uc.T, ks))
    kN = jnp.asarray(N - 1)
    if cost.term_value_diff is not None:
        d = d + cost.term_value_diff(cost_params, X[:, -1], Xc[:, -1], kN)
    else:
        d = d + (cost.term_value(cost_params, Xc[:, -1], kN)
                 - cost.term_value(cost_params, X[:, -1], kN))
    if cset.has_soft():
        d = d + (C.term_soft_value(cset, cstate, Xc[:, -1], kN)
                 - C.term_soft_value(cset, cstate, X[:, -1], kN))
    return d
