"""Box constraints on joint position / velocity / torque per timestep.

Re-design of the reference's BoxConstraint/TrajoptConstraint
(ref: TrajoptConstraint.py:5-387) with *static shapes*: under jit, the
active set cannot change array sizes, so hard constraints always contribute
their full 2*size rows per timestep with a boolean activity mask; inactive
rows are zeroed and the KKT system pins their multipliers to zero via a unit
diagonal (mathematically identical to dropping the rows — see kkt.py).

Soft-constraint hyperparameters (mu, lambda, phi) are a pytree
``ConstraintState`` carried through the solve, with the reference's
AL/penalty update schedule (ref: TrajoptConstraint.py:138-166) and the
MPC warm-shift (ref: TrajoptConstraint.py:168-176).

Deliberate deviation from the reference: its soft *value* penalizes the
squared margin of EVERY bound row — satisfied or not (ref:
TrajoptConstraint.py:76-86) — while its soft *jacobian* masks to violated
rows only (ref: :114-125), i.e. the value is inconsistent with its own
gradient, and once mu escalates (x10 per outer round, ref: :154-158) the
satisfied-side margin term explodes the cost.  That code path is dead in
the reference (soft constraints crash for every surviving plant — see
tests/test_sqp_parity.py docstring), so we implement the standard AL for
inequalities instead: penalize violations only, which is exactly what the
reference's own jacobian differentiates.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

HARD_MODES = ("ACTIVE_SET", "FULL_SET")
SOFT_MODES = ("QUADRATIC_PENALTY", "AUGMENTED_LAGRANGIAN")


def _validate_mode(mode: str) -> str:
    """(ref: TrajoptConstraint.py:33-51; ADMM_PROJECTION is declared but
    unimplemented in the reference, ref: :88-91 'NOT IMPLEMENTED YET')."""
    if mode == "ADMM_PROJECTION":
        raise NotImplementedError(
            "ADMM_PROJECTION is declared but not implemented (matching the "
            "reference, ref: TrajoptConstraint.py:88-91)")
    if mode not in HARD_MODES + SOFT_MODES:
        raise ValueError(
            f"Invalid constraint mode {mode!r}; options are "
            f"{HARD_MODES + SOFT_MODES} (ref: TrajoptConstraint.py:46-51)")
    return mode


@dataclasses.dataclass(frozen=True)
class BoxLimitSpec:
    """One box-constrained slice of the per-knot decision vector [x; u]."""

    kind: str            # 'joint' | 'velocity' | 'torque'
    size: int
    col_offset: int      # start column within [x; u]
    lower: Tuple[float, ...]
    upper: Tuple[float, ...]
    mode: str
    num_timesteps: int   # N for joint/velocity (terminal column), N-1 for torque
    at_terminal: bool    # does this limit apply at k = N-1?
    mu_init: float = 1e-2
    mu_factor: float = 10.0
    mu_max: float = 1e12
    phi_init: float = 1e-2
    phi_factor: float = 10.0
    # ACTIVE_SET activation band: rows with margin < band stay in the
    # working set.  The reference activates strictly on violation
    # (margin < 0, ref: TrajoptConstraint.py:99-113), so a row clamped
    # exactly onto its bound deactivates, the next QP jumps back across,
    # and EXIT_TOL can fire mid-oscillation (measured: |u| settles 60%
    # past a 0.5 torque bound on arm2).  A small positive band keeps
    # clamped rows pinned to the bound.  0.0 = reference parity.
    activation_band: float = 0.0

    @property
    def rows(self) -> int:
        return 2 * self.size

    @property
    def is_hard(self) -> bool:
        return self.mode in HARD_MODES

    @property
    def is_soft(self) -> bool:
        return self.mode in SOFT_MODES

    def bounds(self, dtype):
        lo = jnp.asarray(self.lower, dtype=dtype)
        hi = jnp.asarray(self.upper, dtype=dtype)
        return lo, hi


class SoftLimitState(NamedTuple):
    """AL/penalty hyperparameters, shape (2*size, num_timesteps) each
    (ref: TrajoptConstraint.py:23-25)."""

    mu: jnp.ndarray
    lam: jnp.ndarray
    phi: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ConstraintSet:
    """Aggregates joint/velocity/torque limits (ref: TrajoptConstraint.py:178-208)."""

    nq: int
    nv: int
    nu: int
    N: int
    limits: Tuple[BoxLimitSpec, ...] = ()

    # ---- construction ----
    def with_joint_limits(self, upper, lower, mode, **opts) -> "ConstraintSet":
        # N columns (not the reference's N-1, ref: TrajoptConstraint.py:195):
        # joint limits apply at the terminal knot, so the soft state must
        # carry a column for k = N-1 — otherwise terminal violations index
        # out of bounds and never drive the AL updates or convergence check.
        spec = BoxLimitSpec("joint", self.nq, 0, _bt(lower, self.nq),
                            _bt(upper, self.nq), _validate_mode(mode),
                            self.N, True, **opts)
        return dataclasses.replace(self, limits=self.limits + (spec,))

    def with_velocity_limits(self, upper, lower, mode, size=None,
                             **opts) -> "ConstraintSet":
        size = self.nv if size is None else size
        spec = BoxLimitSpec("velocity", size, self.nq, _bt(lower, size),
                            _bt(upper, size), _validate_mode(mode),
                            self.N, True, **opts)
        return dataclasses.replace(self, limits=self.limits + (spec,))

    def with_torque_limits(self, upper, lower, mode, size=None,
                           **opts) -> "ConstraintSet":
        """``size`` < nu constrains the first ``size`` controls — the
        reference's semantics, where the bounds-list length IS the
        constraint size (ref: TrajoptConstraint.py:12-19,205-208)."""
        size = self.nu if size is None else size
        spec = BoxLimitSpec("torque", size, self.nq + self.nv,
                            _bt(lower, size), _bt(upper, size),
                            _validate_mode(mode), self.N - 1, False, **opts)
        return dataclasses.replace(self, limits=self.limits + (spec,))

    # ---- static row counts ----
    @property
    def hard_limits(self):
        return tuple(l for l in self.limits if l.is_hard)

    @property
    def soft_limits(self):
        return tuple(l for l in self.limits if l.is_soft)

    @property
    def hard_rows_stage(self) -> int:
        return sum(l.rows for l in self.hard_limits)

    @property
    def hard_rows_term(self) -> int:
        return sum(l.rows for l in self.hard_limits if l.at_terminal)

    def has_soft(self) -> bool:
        return len(self.soft_limits) > 0

    def has_hard(self) -> bool:
        return len(self.hard_limits) > 0

    def soft_xu_separable(self) -> bool:
        """True when the soft limits touch only the state slice or only the
        control slice of [x; u] — then the summed soft jacobian gc has
        support in exactly one partition, the Gauss-Newton term
        outer(gc, gc) cannot mix x and u rows, and the cost-Hessian blocks
        G stay (x, u)-block-diagonal (the property kkt._g_split needs for
        the split/condensed Schur assemblies).  A torque AL limit (the
        reference's own recipe, ref: examples/pendulum.py:17-24) is
        separable; stacking a torque limit with a joint/velocity soft
        limit is not."""
        u_soft = any(l.kind == "torque" for l in self.soft_limits)
        x_soft = any(l.kind != "torque" for l in self.soft_limits)
        return not (u_soft and x_soft)

    # ---- state ----
    def init_state(self, dtype=jnp.float64) -> Tuple[SoftLimitState, ...]:
        out = []
        for l in self.soft_limits:
            shape = (l.rows, l.num_timesteps)
            out.append(SoftLimitState(
                mu=jnp.full(shape, l.mu_init, dtype=dtype),
                lam=jnp.zeros(shape, dtype=dtype),
                phi=jnp.full(shape, l.phi_init, dtype=dtype),
            ))
        return tuple(out)


def _bt(vals, size) -> Tuple[float, ...]:
    vals = np.asarray(vals, dtype=float).ravel()
    if vals.size == 1:
        vals = np.full(size, vals[0])
    if vals.size != size:
        raise ValueError("bounds must have the constraint size or be scalar "
                         "(ref: TrajoptConstraint.py:12-16)")
    return tuple(vals.tolist())


# --------------------------------------------------------------- primitives

def margin(spec: BoxLimitSpec, z):
    """Full-set margins [z - lb; ub - z], negative = violated
    (ref: TrajoptConstraint.py:53-61)."""
    lo, hi = spec.bounds(z.dtype)
    zz = z[:spec.size]
    return jnp.concatenate([zz - lo, hi - zz])


def signed_selector(spec: BoxLimitSpec, width: int, dtype):
    """Static (2s, width) matrix: +1 rows for lower bounds, -1 for upper,
    placed at col_offset (the reference's head/tail padding,
    ref: TrajoptConstraint.py:99-106,191-208)."""
    J = np.zeros((spec.rows, width))
    for i in range(spec.size):
        J[i, spec.col_offset + i] = 1.0
        J[spec.size + i, spec.col_offset + i] = -1.0
    return jnp.asarray(J, dtype=dtype)


def hard_rows(spec: BoxLimitSpec, z, width: int):
    """Masked hard-constraint rows: (values, jacobian, active_mask).

    values/jacobian are zeroed on inactive rows (ACTIVE_SET semantics under
    static shapes); FULL_SET keeps every row live.
    """
    m = margin(spec, z)
    if spec.mode == "ACTIVE_SET":
        band = jnp.asarray(spec.activation_band, dtype=z.dtype)
        active = m < band
    else:
        active = jnp.ones_like(m, dtype=bool)
    J = signed_selector(spec, width, z.dtype)
    vals = jnp.where(active, m, 0.0)
    Jm = jnp.where(active[:, None], J, 0.0)
    return vals, Jm, active


def soft_value(spec: BoxLimitSpec, state: SoftLimitState, z, k):
    """mu . err^2 (+ lambda . err for AL) over VIOLATED rows.

    The reference evaluates this over all rows (ref: TrajoptConstraint.py:
    70-86) — inconsistent with its own jacobian (ref: :114-125) and
    divergent once mu escalates; see module docstring.  We penalize
    violations only, the standard inequality-AL and exactly the function
    the reference's jacobian differentiates."""
    m = margin(spec, z)
    mv = jnp.where(m < 0, m, 0.0)
    val = jnp.sum(state.mu[:, k] * mv * mv)
    if spec.mode == "AUGMENTED_LAGRANGIAN":
        val = val + state.lam[:, k] @ mv
    return val


def soft_jacobian(spec: BoxLimitSpec, state: SoftLimitState, z, k, width: int):
    """Gradient row (width,) of the soft penalty, masked to violated rows
    (ref: TrajoptConstraint.py:114-125)."""
    m = margin(spec, z)
    active = m < 0
    J = signed_selector(spec, width, z.dtype)
    Jm = jnp.where(active[:, None], J, 0.0)
    g = 2.0 * (state.mu[:, k] * m) @ Jm
    if spec.mode == "AUGMENTED_LAGRANGIAN":
        g = g + state.lam[:, k] @ Jm
    return g


def update_soft_state(spec: BoxLimitSpec, state: SoftLimitState, Z):
    """AL / penalty schedule over all timesteps (ref: TrajoptConstraint.py:
    138-166).  Z: (dim, num_timesteps) slice of the trajectory this limit
    constrains.  Returns (new_state, mu_all_at_max_flag)."""
    lo, hi = spec.bounds(Z.dtype)
    zz = Z[:spec.size, :]
    m = jnp.concatenate([zz - lo[:, None], hi[:, None] - zz])  # (2s, T)
    active = m < 0
    lam_near = jnp.abs(m) < state.phi
    lam_upd = active & lam_near
    mu_upd = active & ~lam_near
    mu_below = state.mu < spec.mu_max
    new_mu = jnp.where(mu_upd & mu_below,
                       jnp.minimum(spec.mu_max, state.mu * spec.mu_factor),
                       state.mu)
    new_lam = jnp.where(lam_upd, state.lam + state.mu * m, state.lam)
    new_phi = jnp.where(lam_upd, state.phi / spec.phi_factor, state.phi)
    # flag False iff any mu update happened below the cap or any lambda update
    any_progress = jnp.any(mu_upd & mu_below) | jnp.any(lam_upd)
    return SoftLimitState(new_mu, new_lam, new_phi), ~any_progress


def shift_soft_state(spec: BoxLimitSpec, state: SoftLimitState,
                     shift_steps: int) -> SoftLimitState:
    """MPC warm shift (ref: TrajoptConstraint.py:168-176)."""
    def sh(a, fill):
        rolled = jnp.roll(a, -shift_steps, axis=1)
        cols = jnp.arange(a.shape[1])
        keep = cols < (a.shape[1] - shift_steps)
        return jnp.where(keep[None, :], rolled, fill)
    return SoftLimitState(
        mu=sh(state.mu, spec.mu_init),
        lam=sh(state.lam, 0.0),
        phi=sh(state.phi, spec.phi_init),
    )


# ---------------------------------------------------- aggregate operations

def _z_slice(cs: ConstraintSet, spec: BoxLimitSpec, xk, uk):
    if spec.kind == "torque":
        return uk
    if spec.kind == "velocity":
        return xk[cs.nq:]
    return xk[:cs.nq]


def stage_soft_value(cs: ConstraintSet, state, xk, uk, k):
    """Sum of soft penalties at stage k (ref: TrajoptConstraint.py:295-307)."""
    val = 0.0
    si = 0
    for spec in cs.soft_limits:
        if spec.kind == "torque":
            val = val + soft_value(spec, state[si], uk, k)
        else:
            val = val + soft_value(spec, state[si], _z_slice(cs, spec, xk, None), k)
        si += 1
    return val


def term_soft_value(cs: ConstraintSet, state, xN, k):
    val = 0.0
    si = 0
    for spec in cs.soft_limits:
        if spec.at_terminal:
            val = val + soft_value(spec, state[si], _z_slice(cs, spec, xN, None), k)
        si += 1
    return val


def stage_soft_jacobian(cs: ConstraintSet, state, xk, uk, k):
    """(nx+nu,) gradient of the stage soft penalty
    (ref: TrajoptConstraint.py:309-337)."""
    width = cs.nq + cs.nv + cs.nu
    g = jnp.zeros(width, dtype=xk.dtype)
    si = 0
    for spec in cs.soft_limits:
        z = uk if spec.kind == "torque" else _z_slice(cs, spec, xk, None)
        g = g + soft_jacobian(spec, state[si], z, k, width)
        si += 1
    return g


def term_soft_jacobian(cs: ConstraintSet, state, xN, k):
    width = cs.nq + cs.nv
    g = jnp.zeros(width, dtype=xN.dtype)
    si = 0
    for spec in cs.soft_limits:
        if spec.at_terminal:
            z = _z_slice(cs, spec, xN, None)
            # terminal jacobian only spans [x]; build at x-width
            Jrow = soft_jacobian(
                dataclasses.replace(spec), state[si], z, k, width)
            g = g + Jrow
        si += 1
    return g


def stage_hard_rows(cs: ConstraintSet, xk, uk, terminal: bool):
    """Stacked masked hard rows at one knot: (vals (m,), jac (m, width), active).

    width = nx+nu for stages, nx at the terminal knot (torque limits are
    excluded at N-1, ref: TrajoptConstraint.py:230,305).
    """
    width = cs.nq + cs.nv + (0 if terminal else cs.nu)
    vals, jacs, actives = [], [], []
    for spec in cs.hard_limits:
        if terminal and not spec.at_terminal:
            continue
        z = uk if spec.kind == "torque" else _z_slice(cs, spec, xk, None)
        v, J, a = hard_rows(spec, z, width)
        vals.append(v)
        jacs.append(J)
        actives.append(a)
    if not vals:
        zdt = xk.dtype
        return (jnp.zeros((0,), zdt), jnp.zeros((0, width), zdt),
                jnp.zeros((0,), bool))
    return jnp.concatenate(vals), jnp.concatenate(jacs, axis=0), jnp.concatenate(actives)


def max_soft_violation(cs: ConstraintSet, state, X, U):
    """max over limits/timesteps of the VIOLATION |min(margin, 0)|
    (ref: TrajoptConstraint.py:131-136,358-367 — deliberate fix: the
    reference takes abs(min(margin)) unconditionally, so a trajectory that
    satisfies every bound with margin m > tol reads as a 'violation' of m
    and the soft outer loop can never declare convergence; its own comment
    'if active value < 0' documents the intent).  X: (nx, N), U: (nu, N-1)."""
    best = jnp.zeros((), dtype=X.dtype)
    for spec in cs.soft_limits:
        if spec.kind == "torque":
            Z = U[:spec.size, :spec.num_timesteps]
        elif spec.kind == "velocity":
            Z = X[cs.nq:cs.nq + spec.size, :spec.num_timesteps]
        else:
            Z = X[:spec.size, :spec.num_timesteps]
        lo, hi = spec.bounds(X.dtype)
        m = jnp.concatenate([Z - lo[:, None], hi[:, None] - Z])
        worst = jnp.minimum(jnp.min(m, axis=0), 0.0)
        best = jnp.maximum(best, jnp.max(jnp.abs(worst)))
    return best


def max_hard_violation(cs: ConstraintSet, X, U):
    """max over HARD limits/timesteps of the violation |min(margin, 0)|.

    Instrument for SQPOptions.hard_violation_exit_tol: the reference has no
    feasibility term in its EXIT_TOL test (ref: TrajoptMPCReference.py:
    463-481), so an active-set solve can exit 'converged' mid-chatter with
    a bound still violated.  X: (nx, N), U: (nu, N-1)."""
    best = jnp.zeros((), dtype=X.dtype)
    for spec in cs.hard_limits:
        if spec.kind == "torque":
            Z = U[:spec.size, :spec.num_timesteps]
        elif spec.kind == "velocity":
            Z = X[cs.nq:cs.nq + spec.size, :spec.num_timesteps]
        else:
            Z = X[:spec.size, :spec.num_timesteps]
        lo, hi = spec.bounds(X.dtype)
        m = jnp.concatenate([Z - lo[:, None], hi[:, None] - Z])
        worst = jnp.minimum(jnp.min(m, axis=0), 0.0)
        best = jnp.maximum(best, jnp.max(jnp.abs(worst)))
    return best


def update_all_soft(cs: ConstraintSet, state, X, U):
    """Update every soft limit's hyperparameters; returns (state', all_at_max)
    (ref: TrajoptConstraint.py:369-378)."""
    new_states = []
    all_flag = jnp.array(True)
    si = 0
    for spec in cs.soft_limits:
        if spec.kind == "torque":
            Z = U[:, :spec.num_timesteps]
        elif spec.kind == "velocity":
            Z = X[cs.nq:, :spec.num_timesteps]
        else:
            Z = X[:cs.nq, :spec.num_timesteps]
        ns, flag = update_soft_state(spec, state[si], Z)
        new_states.append(ns)
        all_flag = all_flag & flag
        si += 1
    return tuple(new_states), all_flag


def shift_all_soft(cs: ConstraintSet, state, shift_steps: int):
    """(ref: TrajoptConstraint.py:380-387)."""
    return tuple(
        shift_soft_state(spec, st, shift_steps)
        for spec, st in zip(cs.soft_limits, state)
    )
