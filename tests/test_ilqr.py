"""iLQR solver tests: swing-up physics, constraint handling, SQP agreement.

The reference snapshot dropped its iLQR implementation (ref: README.md:17
still advertises it; MPCSolverMethods still lists it,
TrajoptMPCReference.py:21-27), so there is no golden to diff against.
Instead we check physics outcomes and cross-solver agreement: on a smooth
unconstrained problem iLQR and SQP must find the same local optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.plants import (
    CartPolePlant,
    DoubleIntegratorPlant,
    PendulumPlant,
    URDFPlant,
)
from trajoptmpcreference_tpu.models.urdf import serial_arm
from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
from trajoptmpcreference_tpu.solvers import constraints as C
from trajoptmpcreference_tpu.solvers.costs import QuadraticCost, UrdfCost
from trajoptmpcreference_tpu.solvers.ilqr import make_ilqr
from trajoptmpcreference_tpu.solvers.sqp import SQPOptions, make_sqp


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def test_pendulum_swing_up():
    """(config per ref: examples/pendulum.py:13-16)."""
    plant = PendulumPlant()
    N, dt = 20, 0.1
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    solver = make_ilqr(plant, cost, None, N, dt)
    res = jax.jit(solver.solve)(jnp.zeros((2, N)), jnp.zeros((1, N - 1)))
    assert int(res.exit_ilqr) == 1
    assert abs(float(res.X[0, -1]) - np.pi) < 0.2
    assert abs(float(res.X[1, -1])) < 0.05


def test_cartpole_swing_up():
    plant = CartPolePlant()
    N, dt = 50, 0.05
    cost = QuadraticCost(jnp.diag(jnp.array([0.1, 1.0, 0.1, 0.1])),
                         100.0 * jnp.eye(4), 0.01 * jnp.eye(1),
                         jnp.array([0.0, np.pi, 0.0, 0.0]))
    solver = make_ilqr(plant, cost, None, N, dt)
    res = jax.jit(solver.solve)(jnp.zeros((4, N)), 0.01 * jnp.ones((1, N - 1)))
    assert int(res.exit_ilqr) == 1
    assert abs(float(res.X[1, -1]) - np.pi) < 0.2


def test_double_integrator_matches_lqr():
    """On an LQR problem iLQR must converge in ~1 iteration to the exact
    QP solution, identical to SQP's."""
    plant = DoubleIntegratorPlant()
    N, dt = 12, 0.1
    cost = QuadraticCost(jnp.eye(2), 10.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([1.0, 0.0]))
    x0 = jnp.zeros((2, N))
    u0 = jnp.zeros((1, N - 1))
    # near-zero regularization so the one-step solutions are exact LQR
    opts = SQPOptions(rho_init=1e-10, rho_min=1e-10)
    ilqr = make_ilqr(plant, cost, None, N, dt, options=opts)
    sqp = make_sqp(plant, cost, None, N, dt, method="N", options=opts)
    ri = jax.jit(ilqr.solve)(x0, u0)
    rs = jax.jit(sqp.solve)(x0, u0)
    # both sit on the exit-tolerance plateau around the optimum
    np.testing.assert_allclose(np.asarray(ri.U), np.asarray(rs.U), atol=1e-3)
    assert abs(float(ri.J) - float(rs.J)) < 1e-5
    # the exact QP optimum: one dense-KKT Newton step from the zero iterate
    blocks = sqp.kkt.form_blocks(x0, u0, x0[:, 0], cost.default_params,
                                 sqp.cset.init_state())
    dxu, _, _ = sqp.kkt.solve_dense(blocks, 0.0)
    U_star = -dxu[:-1, 2:].T
    np.testing.assert_allclose(np.asarray(ri.U), np.asarray(U_star), atol=1e-3)


def test_agrees_with_sqp_on_arm():
    """Smooth unconstrained arm problem: same local optimum as SQP."""
    robot = serial_arm(2)
    plant = URDFPlant(robot=robot)
    N, dt = 10, 0.1
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    opts = SQPOptions(expected_reduction_min=-100.0)
    ilqr = make_ilqr(plant, cost, None, N, dt, options=opts)
    sqp = make_sqp(plant, cost, None, N, dt, method="S", options=opts)
    ri = jax.jit(ilqr.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    rs = jax.jit(sqp.solve)(jnp.zeros((4, N)), jnp.zeros((2, N - 1)))
    assert abs(float(ri.J) - float(rs.J)) < 1e-4
    kin = make_kinematics(robot)
    ee = kin.ee_pos_xyz(ri.X[:2, -1])[:2]
    assert np.linalg.norm(np.asarray(ee) - np.array([0.5, 1.5])) < 0.1


def test_soft_constraints_respected():
    plant = PendulumPlant()
    N, dt = 20, 0.1
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    cset = C.ConstraintSet(1, 1, 1, N).with_torque_limits(
        7.0, -7.0, "AUGMENTED_LAGRANGIAN")
    solver = make_ilqr(plant, cost, cset, N, dt)
    res = jax.jit(solver.solve)(jnp.zeros((2, N)), jnp.zeros((1, N - 1)))
    assert float(jnp.max(jnp.abs(res.U))) < 7.0 + 1e-2


def test_hard_constraints_rejected():
    plant = PendulumPlant()
    N = 10
    cost = QuadraticCost(jnp.eye(2), jnp.eye(2), jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    cset = C.ConstraintSet(1, 1, 1, N).with_torque_limits(
        7.0, -7.0, "ACTIVE_SET")
    solver = make_ilqr(plant, cost, cset, N, 0.1)
    with pytest.raises(ValueError, match="soft"):
        solver.solve(jnp.zeros((2, N)), jnp.zeros((1, N - 1)))


def test_vmap_batch_of_goals():
    """The scenario-batching axis: vmap over goal positions."""
    plant = PendulumPlant()
    N, dt = 20, 0.1
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    solver = make_ilqr(plant, cost, None, N, dt)
    goals = jnp.stack([jnp.array([th, 0.0]) for th in (2.5, 3.0, np.pi)])

    def solve_goal(xg):
        p = cost.default_params._replace(xg=xg)
        return solver.solve(jnp.zeros((2, N)), jnp.zeros((1, N - 1)),
                            cost_params=p)

    res = jax.jit(jax.vmap(solve_goal))(goals)
    assert res.X.shape == (3, 2, N)
    for i, th in enumerate((2.5, 3.0, np.pi)):
        assert abs(float(res.X[i, 0, -1]) - th) < 0.25


def test_parallel_riccati_matches_sequential():
    """The associative-scan backward pass (Sarkka & Garcia-Fernandez
    conditional-value-function elements) must reproduce the sequential
    reverse-scan Riccati exactly: gains at every knot, the model-reduction
    scalars, and full solve iterates."""
    plant = PendulumPlant()
    N, dt = 20, 0.1
    cost = QuadraticCost(jnp.diag(jnp.array([1.0, 0.1])), 100.0 * jnp.eye(2),
                         0.01 * jnp.eye(1), jnp.array([np.pi, 0.0]))
    seq = make_ilqr(plant, cost, None, N, dt)
    par = make_ilqr(plant, cost, None, N, dt, parallel_riccati=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(0.3 * rng.standard_normal((plant.nx, N)))
    U = jnp.asarray(0.3 * rng.standard_normal((plant.nu, N - 1)))
    cp = cost.default_params
    cs = seq.cset.init_state(dtype=X.dtype)
    A, B, g, H, gN, HN = seq._expansions(X, U, cp, cs)
    rho = jnp.asarray(1e-3)
    K1, k1, d11, d21, bad1 = seq.backward(A, B, g, H, gN, HN, rho)
    K2, k2, d12, d22, bad2 = par.backward_parallel(A, B, g, H, gN, HN, rho)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-10)
    np.testing.assert_allclose(float(d11), float(d12), rtol=1e-12)
    np.testing.assert_allclose(float(d21), float(d22), rtol=1e-12)
    assert bool(bad1) == bool(bad2) is False

    x0 = jnp.tile(jnp.array([0.1, 0.0])[:, None], (1, N))
    u0 = jnp.zeros((1, N - 1))
    r1 = jax.jit(seq.solve)(x0, u0)
    r2 = jax.jit(par.solve)(x0, u0)
    assert int(r1.exit_ilqr) == int(r2.exit_ilqr) == 1
    np.testing.assert_allclose(np.asarray(r1.U), np.asarray(r2.U), atol=1e-10)


def test_parallel_riccati_swing_up_on_arm():
    """End-to-end physics check of the parallel backward pass on the
    6-DoF task-space problem (not just LQR agreement)."""
    robot = serial_arm(3)
    plant = URDFPlant(robot=robot)
    N, dt = 16, 0.05
    goal = jnp.array([1.0, 1.5, 0.0, 0.0, 0.0, 0.0])
    cost = UrdfCost(plant, jnp.eye(6), 100.0 * jnp.eye(6),
                    0.01 * jnp.eye(3), goal)
    solver = make_ilqr(plant, cost, None, N, dt, parallel_riccati=True)
    res = jax.jit(solver.solve)(jnp.zeros((plant.nx, N)),
                                jnp.zeros((plant.nu, N - 1)))
    kin = make_kinematics(robot)
    ee = kin.ee_pos_xyz(res.X[: plant.nq, -1])
    # the 0.8 s horizon gets the EE near (not onto) the goal
    assert float(jnp.linalg.norm(ee[:2] - goal[:2])) < 0.25
    # agreement bar: the redundant 3-link reach has a continuum of
    # near-minimizers, so iterates drift apart in float round-off over
    # many accepted steps — the invariants are equal achieved cost and
    # equal per-call gains, not bitwise-equal trajectories
    seq = make_ilqr(plant, cost, None, N, dt)
    ref = jax.jit(seq.solve)(jnp.zeros((plant.nx, N)),
                             jnp.zeros((plant.nu, N - 1)))
    np.testing.assert_allclose(float(res.J), float(ref.J), rtol=1e-5)
    cp = cost.default_params
    cs = seq.cset.init_state(dtype=res.X.dtype)
    A, B, g, H, gN, HN = seq._expansions(ref.X, ref.U, cp, cs)
    rho = jnp.asarray(1.0)
    K1, k1, _, _, _ = seq.backward(A, B, g, H, gN, HN, rho)
    K2, k2, _, _, _ = solver.backward_parallel(A, B, g, H, gN, HN, rho)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-8)


def test_cho_guarded_jitter_fallback():
    """Non-PD Quu: the guarded factor stays finite (jittered refactor) and
    the flag still reports the failure so the rho schedule reacts."""
    from trajoptmpcreference_tpu.solvers.ilqr import _cho_guarded

    rho = jnp.asarray(1e-3)
    good = jnp.asarray([[4.0, 1.0], [1.0, 3.0]])
    (L, low), ok = _cho_guarded(good, rho)
    assert bool(ok)
    x = jax.scipy.linalg.cho_solve((L, low), jnp.ones(2))
    np.testing.assert_allclose(np.asarray(good @ x), np.ones(2), atol=1e-10)

    bad = jnp.asarray([[1.0, 0.0], [0.0, -1e-4]])   # indefinite
    (Lb, lowb), okb = _cho_guarded(bad, rho)
    assert not bool(okb)
    assert bool(jnp.all(jnp.isfinite(Lb)))
    xb = jax.scipy.linalg.cho_solve((Lb, lowb), jnp.ones(2))
    assert bool(jnp.all(jnp.isfinite(xb)))


def test_mpc_warm_rollout_plan_reset():
    """Regression for the closed-loop NaN spiral (round-4 bench finding 7 /
    round-5 forensics): on the 6-DoF arm at N=16 the shifted single-
    shooting warm start eventually overflows, the non-finite base cost
    then rejects EVERY candidate (dJ = NaN), and the stale plan walks the
    episode off — f32 reached |x| > 1e6 by step 23 and NaN by step 28.
    With the plan-reset guard + jittered backward the same episode must
    stay finite and bounded at BOTH precisions (the f64-vs-f32 knife edge
    is exactly what finding 7 recorded)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _flagship_mpc

    for dtype in (jnp.float32, jnp.float64):
        plant, cost, ctrl = _flagship_mpc(
            N=16, max_iter=8, dtype=dtype, method="iLQR",
            use_pallas=False, use_pallas_fd=False, use_pallas_task=False)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(0.1 * rng.standard_normal(plant.nx), dtype)
        goal = jnp.asarray([3.0, 2.0, 0, 0, 0, 0], dtype)
        cp = cost.default_params._replace(xg=goal)
        res = jax.jit(lambda x0, cp: ctrl.run(x0, steps=30,
                                              cost_params=cp))(x0, cp)
        X = np.asarray(res.X_applied)
        assert np.all(np.isfinite(X)), dtype
        assert np.max(np.abs(X)) < 1e4, (dtype, np.max(np.abs(X)))
