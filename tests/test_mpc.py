"""Closed-loop MPC tests: stabilization, warm-start effectiveness, shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu import (
    ConstraintSet,
    PendulumPlant,
    QuadraticCost,
    URDFPlant,
    UrdfCost,
    make_mpc,
    serial_arm,
)
from trajoptmpcreference_tpu.solvers.mpc import _shift_plan


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def _pendulum_ctrl(method, cset=None):
    plant = PendulumPlant()
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    return make_mpc(plant, cost, cset, 20, 0.1, method=method)


@pytest.mark.parametrize("method", ["iLQR", "QP-N", "QP-S", "QP-PCG-SS"])
def test_pendulum_stabilizes(method):
    ctrl = _pendulum_ctrl(method)
    res = jax.jit(lambda x: ctrl.run(x, steps=50))(jnp.zeros(2))
    assert abs(float(res.X_applied[0, -1]) - np.pi) < 1e-2, method
    assert abs(float(res.X_applied[1, -1])) < 1e-2


def test_constrained_mpc_respects_limits():
    cset = ConstraintSet(1, 1, 1, 20).with_torque_limits(
        [7.0], [-7.0], "AUGMENTED_LAGRANGIAN")
    ctrl = _pendulum_ctrl("QP-S", cset)
    res = jax.jit(lambda x: ctrl.run(x, steps=50))(jnp.zeros(2))
    # AL is soft: per-step re-solves tolerate a few % transient overshoot
    assert float(jnp.max(jnp.abs(res.U_applied))) < 7.0 * 1.05
    assert abs(float(res.X_applied[0, -1]) - np.pi) < 5e-2


def test_warm_start_reduces_iterations():
    """After the transient, warm-started solves converge in far fewer
    iterations than the cold first solve."""
    ctrl = _pendulum_ctrl("QP-S")
    res = jax.jit(lambda x: ctrl.run(x, steps=30))(jnp.zeros(2))
    iters = np.asarray(res.iters)
    assert iters[0] >= 3 * iters[1]          # cold start works much harder
    assert (np.diff(iters[1:]) <= 0).all()   # monotone decay along transient
    assert np.median(iters[-5:]) <= 2        # converged regime is cheap


def test_arm_tracking():
    robot = serial_arm(2)
    plant = URDFPlant(robot=robot)
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    ctrl = make_mpc(plant, cost, None, 10, 0.1, method="QP-PCG-SS")
    res = jax.jit(lambda x: ctrl.run(x, steps=40))(jnp.zeros(4))
    from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
    kin = make_kinematics(robot)
    ee = kin.ee_pos_xyz(res.X_applied[:2, -1])[:2]
    assert float(jnp.linalg.norm(ee - jnp.array([0.5, 1.5]))) < 0.05


def test_shift_plan():
    X = jnp.arange(12.0).reshape(2, 6)
    U = jnp.arange(5.0).reshape(1, 5)
    Xs, Us = _shift_plan(X, U, 2)
    np.testing.assert_allclose(np.asarray(Xs[0]), [2, 3, 4, 5, 5, 5])
    np.testing.assert_allclose(np.asarray(Us[0]), [2, 3, 4, 4, 4])


def test_model_mismatch_sim_plant():
    """Controller plans with a nominal pendulum but acts on a heavier one —
    closed loop must still stabilize (robustness of the receding horizon)."""
    nominal = PendulumPlant(mass=1.0)
    true = PendulumPlant(mass=1.15)
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    ctrl = make_mpc(nominal, cost, None, 20, 0.1, method="QP-S",
                    sim_plant=true)
    res = jax.jit(lambda x: ctrl.run(x, steps=60))(jnp.zeros(2))
    assert abs(float(res.X_applied[0, -1]) - np.pi) < 0.05


def test_long_horizon_stability_f64():
    """300-step closed loop on the flagship 6-DoF config stays finite and
    tracks (f64 CPU; the f32 gap is documented in README/bench — this
    guards the solver itself against regressions like the PCG 0/0 NaN)."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_mpc

    plant, cost, ctrl = _flagship_mpc(N=64, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(0.1 * rng.standard_normal(12))
    goal = jnp.asarray([3.0, 2.0, 0.0, 0.0, 0.0, 0.0])
    cp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64),
        cost.default_params._replace(xg=goal))
    res = jax.jit(lambda x: ctrl.run(x, steps=300, cost_params=cp))(x0)
    X = np.asarray(res.X_applied)
    assert np.isfinite(X).all()
    ee = plant.kinematics.ee_pos_xyz(res.X_applied[:6, -1])[:2]
    err = float(jnp.linalg.norm(ee - goal[:2]))
    assert err < 0.5, err


def test_run_scheduled_identity():
    """Chaining two phases with the SAME controller is bit-identical to one
    run — the carry handoff (plan, cstate, multipliers) is lossless."""
    from trajoptmpcreference_tpu import run_scheduled

    cset = ConstraintSet(1, 1, 1, 20).with_torque_limits(
        7.0, -7.0, "AUGMENTED_LAGRANGIAN")
    ctrl = _pendulum_ctrl("QP-S", cset)
    one = jax.jit(lambda x: ctrl.run(x, steps=30))(jnp.zeros(2))
    two = jax.jit(lambda x: run_scheduled(
        [(ctrl, 12), (ctrl, 18)], x))(jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(one.X_applied),
                                  np.asarray(two.X_applied))
    np.testing.assert_array_equal(np.asarray(one.U_applied),
                                  np.asarray(two.U_applied))
    np.testing.assert_array_equal(np.asarray(one.iters),
                                  np.asarray(two.iters))
    np.testing.assert_array_equal(np.asarray(one.lam_last),
                                  np.asarray(two.lam_last))


def test_run_scheduled_budget_drop():
    """Cold phase at the full budget + steady-state phase at 1 SQP iter/step
    still stabilizes the pendulum: after the transient the warm start does
    the work (the iteration-scheduling premise)."""
    from trajoptmpcreference_tpu import SQPOptions, run_scheduled
    from trajoptmpcreference_tpu.solvers.mpc import make_mpc as _mk

    plant = PendulumPlant()
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    cold = make_mpc(plant, cost, None, 20, 0.1, method="QP-S")
    warm = _mk(plant, cost, None, 20, 0.1, method="QP-S",
               options=SQPOptions(max_iter=1,
                                  expected_reduction_min=-100.0))
    res = jax.jit(lambda x: run_scheduled(
        [(cold, 15), (warm, 35)], x))(jnp.zeros(2))
    assert abs(float(res.X_applied[0, -1]) - np.pi) < 0.02
    assert abs(float(res.X_applied[1, -1])) < 0.02
    assert int(np.max(np.asarray(res.iters)[15:])) <= 1


@pytest.mark.slow
def test_plan_watchdog_coasts_and_recovers():
    """watchdog_u_max: a solve whose first control exceeds the bound makes
    the controller coast (u = 0) for that step and cold-reset the warm
    carry; a sane solve is untouched (bit-identical to watchdog off)."""
    from trajoptmpcreference_tpu.solvers.mpc import MPCController, make_mpc

    plant = PendulumPlant()
    N = 20
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    base = make_mpc(plant, cost, None, N, 0.1, method="QP-S")
    wd = MPCController(solver=base.solver, sim_plant=plant,
                       watchdog_u_max=50.0)
    x0 = jnp.zeros(2)
    a = jax.jit(lambda x: base.run(x, steps=25))(x0)
    b = jax.jit(lambda x: wd.run(x, steps=25))(x0)
    # sane solves: the watchdog is transparent
    np.testing.assert_array_equal(np.asarray(a.U_applied),
                                  np.asarray(b.U_applied))
    # a bound tighter than the swing-up's needed |u| ~ 9.4 trips it: the
    # applied control is then EXACTLY zero on tripped steps, never the
    # over-bound plan value
    wd2 = MPCController(solver=base.solver, sim_plant=plant,
                        watchdog_u_max=5.0)
    c = jax.jit(lambda x: wd2.run(x, steps=25))(x0)
    U = np.asarray(c.U_applied)
    assert np.all(np.isfinite(np.asarray(c.X_applied)))
    assert np.all((np.abs(U) <= 5.0) | (U == 0.0))
    assert np.any(U == 0.0)          # it actually tripped
