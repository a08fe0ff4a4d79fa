"""Golden-parity tests: our SQP vs the reference implementation's output.

The fixtures in tests/golden/*.npz were produced by running the reference
(VCA-EPFL/TrajoptMPCReference) via tests/golden/generate.py on the 2-link
arm task-space problem (the reference's only working configuration — see
notes below).  Our solver must reproduce the reference's control sequences
to <= 1e-4 (BASELINE.json requires 1e-4; we match to ~1e-12 because with
ref_compat=True the iterates are identical in exact arithmetic).

Notes on what CAN'T have goldens (all verified against the snapshot):
  * Canonical plants (pendulum/cartpole/double integrator): dropped from the
    snapshot (ref: __init__.py:1 imports classes that no longer exist).
  * SOFT-constrained solves: BoxConstraint.value builds a (2, s) matrix via
    np.vstack((delta_lb, delta_ub)) and dots it with a (2s,) mu vector
    (ref: TrajoptConstraint.py:76-81), which raises for every surviving
    plant (nu >= 2) — executed proof committed as
    golden/arm2_S_AL_traceback.txt.  Soft semantics are instead unit-tested
    against the reference formulas in test_constraints.py.
    HARD (ACTIVE_SET) solves DO run in the reference; their golden is
    arm2_S_active_set.npz, covered by test_hard_constrained_controls below.
  * arm3 (threelinks.py:39-78): the snapshot CANNOT run it — UrdfCost.
    delta_x reshapes [ee_pos (3 incl. theta); J qd (2)] = 5 values into
    (2*n,) = 6 (ref: TrajoptCost.py:434); the task-space cost is
    2-link-only, so threelinks.py as committed crashes.  Executed proof:
    golden/arm3_traceback.txt.  Our generalized kinematics cover arm3+
    (tests/test_rbd.py, tests/test_lanes.py); behavioral arm3 solve
    coverage is test_arm3_solves_beyond_reference below.
  * PCG-SS end-to-end: the reference run exits at max_iter (exit 3) with a
    long tail of line-search failures — its PCG solves are inexact and the
    SQP iterates become chaotic, so bit-parity is not meaningful; we check
    behavioral parity (final cost / violation) plus exact linear-solver
    parity at the PCG level (test_btridiag.py).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.plants import URDFPlant
from trajoptmpcreference_tpu.models.urdf import serial_arm
from trajoptmpcreference_tpu.solvers.costs import UrdfCost
from trajoptmpcreference_tpu.solvers.sqp import make_sqp, SQPOptions

pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

GOLDEN = pathlib.Path(__file__).parent / "golden"

N, DT = 10, 0.1


def _solver(method):
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0])),
        jnp.diag(jnp.array([100.0] * 4)),
        0.1 * jnp.eye(2),
        jnp.array([0.5, 1.5, 0.0, 0.0]),
        ref_compat=True,
    )
    # the reference's own working driver disables the lower reduction check
    # (ref: examples/twolinks.py:87)
    opts = SQPOptions(expected_reduction_min=-100.0)
    return make_sqp(plant, cost, None, N, DT, method=method, options=opts)


@pytest.mark.parametrize("method,fixture", [
    ("N", "arm2_N"),
    ("S", "arm2_S"),
])
def test_controls_match_reference(method, fixture):
    gold = np.load(GOLDEN / f"{fixture}.npz")
    solver = _solver(method)
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    assert int(res.exit_sqp) == int(gold["exit_sqp"])
    assert int(res.exit_soft) == int(gold["exit_soft"])
    np.testing.assert_allclose(np.asarray(res.U), gold["u"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.X), gold["x"], atol=1e-4)
    # we actually track the reference iterates to roundoff
    assert np.abs(np.asarray(res.U) - gold["u"]).max() < 1e-9


def test_midpoint_behavioral_parity():
    """Non-euler integrator golden: midpoint (type 2), behavioral parity.

    Iterate-level parity is impossible BY DESIGN: the reference's midpoint
    value path feeds xk (not the midpoint state) to qdd_to_xdot, so the
    velocity half of its stage-2 xdot is stale AND inconsistent with its
    own gradient (which differentiates the consistent form) — ref:
    TrajoptPlant.py:141-144 vs :153-168; we implement the exact midpoint
    + chain rule (ops/integrators.py docstring).  The behavioral bar: our
    midpoint solve must converge with the same exit and a final cost at
    in the same accuracy class as the reference's run.  The golden (x, u)
    obeys the reference's (stale-velocity) discretization, so it is
    dynamically INFEASIBLE under the exact midpoint and its cost is not a
    lower bound for ours — the two solvers optimize slightly different
    discretizations whose optima differ at the O(dt^2) discretization-
    error scale (~4% here)."""
    gold = np.load(GOLDEN / "arm2_S_midpoint.npz")
    plant = URDFPlant(robot=serial_arm(2), integrator_type=2)
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0])),
        jnp.diag(jnp.array([100.0] * 4)),
        0.1 * jnp.eye(2),
        jnp.array([0.5, 1.5, 0.0, 0.0]),
        ref_compat=True,
    )
    opts = SQPOptions(expected_reduction_min=-100.0)
    solver = make_sqp(plant, cost, None, N, DT, method="S", options=opts)
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    assert int(res.exit_sqp) == int(gold["exit_sqp"])
    cost_of = lambda X, U: float(solver.total_cost(
        jnp.asarray(X), jnp.asarray(U), cost.default_params,
        solver.cset.init_state()))
    J_gold = cost_of(gold["x"], gold["u"])
    assert float(res.J) <= 1.05 * J_gold, (float(res.J), J_gold)


def test_arm3_solves_beyond_reference():
    """The reference crashes on every arm3 task-space solve
    (golden/arm3_traceback.txt); our generalized UrdfCost must solve the
    threelinks.py:39-78 config (goal [-1, 1.5], +/-7 ACTIVE_SET) and
    actually reach the goal with the bound respected."""
    from trajoptmpcreference_tpu.solvers.constraints import ConstraintSet

    plant = URDFPlant(robot=serial_arm(3))
    cost = UrdfCost(
        plant,
        jnp.eye(6),
        100.0 * jnp.eye(6),
        0.1 * jnp.eye(3),
        jnp.array([-1.0, 1.5, 0.0, 0.0, 0.0, 0.0]),
    )
    cset = ConstraintSet(3, 3, 3, N).with_torque_limits(7.0, -7.0,
                                                        "ACTIVE_SET")
    opts = SQPOptions(expected_reduction_min=-100.0)
    solver = make_sqp(plant, cost, cset, N, DT, method="S", options=opts)
    res = jax.jit(solver.solve)(jnp.zeros((6, N)), jnp.zeros((3, N - 1)))
    assert int(res.exit_sqp) in (1, 3)
    ee = plant.kinematics.ee_pos_xyz(res.X[:3, -1])[:2]
    err = float(jnp.linalg.norm(ee - jnp.array([-1.0, 1.5])))
    assert err < 0.2, err
    assert float(jnp.max(jnp.abs(res.U))) <= 7.0 + 1e-6


def test_hard_constrained_controls_match_reference():
    """Hard ACTIVE_SET torque limits (+/-0.2 on both controls): controls
    must match the reference run (tests/golden/generate.py
    arm2_S_active_set; ref: TrajoptConstraint.py:64-68,99-113)."""
    from trajoptmpcreference_tpu.solvers.constraints import ConstraintSet

    gold = np.load(GOLDEN / "arm2_S_active_set.npz")
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0])),
        jnp.diag(jnp.array([100.0] * 4)),
        0.1 * jnp.eye(2),
        jnp.array([0.5, 1.5, 0.0, 0.0]),
        ref_compat=True,
    )
    cset = ConstraintSet(2, 2, 2, N).with_torque_limits(
        0.2, -0.2, "ACTIVE_SET")
    opts = SQPOptions(expected_reduction_min=-100.0)
    solver = make_sqp(plant, cost, cset, N, DT, method="S", options=opts)
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    assert int(res.exit_sqp) == int(gold["exit_sqp"])
    np.testing.assert_allclose(np.asarray(res.U), gold["u"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.X), gold["x"], atol=1e-4)
    # torque bound actually respected
    assert np.abs(np.asarray(res.U)).max() <= 0.2 + 1e-6


def test_pcg_behavioral_parity():
    """PCG-SS: same problem, same final accuracy class as the reference
    (exact-iterate parity is meaningless; see module docstring)."""
    gold = np.load(GOLDEN / "arm2_PCG_SS.npz")
    solver = _solver("PCG-SS")
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    # reference final cost on this problem
    ref_solver = _solver("S")
    cost_of = lambda X, U: float(ref_solver.total_cost(
        jnp.asarray(X), jnp.asarray(U), ref_solver.cost.default_params,
        ref_solver.cset.init_state()))
    J_gold = cost_of(gold["x"], gold["u"])
    J_ours = float(res.J)
    # Both land in the same inexact-PCG regime slightly above the exact-Schur
    # optimum (J* ~ 4.022; reference PCG ~4.036): require the same accuracy
    # class, not bit parity.
    assert J_ours <= J_gold + 0.05


def test_correct_gradient_beats_reference():
    """Without ref_compat (correct dJdq), the solver must find a solution at
    least as good as the reference's (whose task-space gradient carries a
    dJ[1,0]/dq sign error, ref: RBDReference.py:264)."""
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0])),
        jnp.diag(jnp.array([100.0] * 4)),
        0.1 * jnp.eye(2),
        jnp.array([0.5, 1.5, 0.0, 0.0]),
    )
    opts = SQPOptions(expected_reduction_min=-100.0)
    solver = make_sqp(plant, cost, None, N, DT, method="S", options=opts)
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    gold = np.load(GOLDEN / "arm2_S.npz")
    cost_of = lambda X, U: float(solver.total_cost(
        jnp.asarray(X), jnp.asarray(U), cost.default_params,
        solver.cset.init_state()))
    assert float(res.J) < cost_of(gold["x"], gold["u"])
