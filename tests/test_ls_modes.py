"""Line-search mode variants: base-point directional derivative and RTI
fixed-step.

The reference line search re-evaluates the cost gradient at every
candidate trajectory to form the acceptance test's directional derivative
(ref: TrajoptMPCReference.py:633-646) — a full gradient sweep per ladder
trial.  Two variants trade that for speed:

* ls_grad_at_base: standard Armijo — D = g(X, U) . dxu with the KKT
  gradient already formed, once per iterate.  Semantics: identical
  candidate iterates and ladder; only the acceptance threshold uses the
  base-point D (which every accepted D converges to as alpha -> 0).
* ls_fixed_alpha > 0: real-time iteration (no ladder, no acceptance
  test) — the warm-started MPC scheme.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu import (
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_sqp,
    serial_arm,
)


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def _solver(opts_kwargs, N=12, dtype=jnp.float64):
    robot = serial_arm(3)
    plant = URDFPlant(robot=robot, integrator_type=1)
    nu = plant.nu
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 0.1, 0.1, 0.1], dtype)),
        100.0 * jnp.eye(6, dtype=dtype),
        0.01 * jnp.eye(nu, dtype=dtype),
        jnp.asarray([1.5, 1.0, 0.0, 0.0, 0.0, 0.0], dtype),
    )
    opts = SQPOptions(expected_reduction_min=-100.0, exit_tolerance=1e-8,
                      **opts_kwargs)
    solver = make_sqp(plant, cost, None, N, 0.05, method="S", options=opts)
    x0 = jnp.zeros((plant.nx, N), dtype)
    u0 = jnp.zeros((nu, N - 1), dtype)
    return solver, x0, u0


def test_grad_at_base_converges_to_same_solution():
    """Both D conventions accept full steps on a well-scaled problem and
    land on the same optimum."""
    ref, x0, u0 = _solver({"max_iter": 30})
    alt, _, _ = _solver({"max_iter": 30, "ls_grad_at_base": True})
    r = jax.jit(ref.solve)(x0, u0)
    a = jax.jit(alt.solve)(x0, u0)
    assert int(r.exit_sqp) in (1, 3)
    assert int(a.exit_sqp) in (1, 3)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(r.U),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(float(a.J), float(r.J), rtol=1e-9)


def test_grad_at_base_D_matches_candidate_D_at_small_alpha():
    """The base-point D is the alpha -> 0 limit of the reference's
    candidate-point D: check the two agree to first order."""
    solver, x0, u0 = _solver({"max_iter": 4})
    # one QP from the initial point
    xs = x0[:, 0]
    cp = solver.cost.default_params
    blocks = solver.kkt.form_blocks(x0, u0, xs, cp, ())
    dxu, _, _, _ = solver.solve_qp_from_blocks(
        blocks, jnp.asarray(1e-3, x0.dtype),
        jnp.zeros((solver.N, solver.kkt.bs), x0.dtype))
    D_base = float(jnp.sum(blocks.g * dxu))
    alpha = 1e-6
    nx = solver.plant.nx
    Xc = x0 - alpha * dxu[:, :nx].T
    Uc = u0 - alpha * dxu[:-1, nx:].T
    D_cand = float(solver.directional_derivative(Xc, Uc, dxu, cp, ()))
    assert abs(D_base - D_cand) < 1e-5 * max(1.0, abs(D_base))


def test_rti_fixed_alpha_closed_loop_tracks():
    """RTI is a warm-started MPC scheme, not a globally convergent cold
    solver (full steps oscillate from cold starts — verified); the
    meaningful check is the closed loop: the RTI controller must track
    the goal like the line-searched controller does."""
    from trajoptmpcreference_tpu.solvers.mpc import MPCController

    ref, x0, _ = _solver({"max_iter": 3})
    rti, _, _ = _solver({"max_iter": 3, "ls_fixed_alpha": 1.0})
    xcold = x0[:, 0]
    goal = ref.cost.default_params.xg[:2]

    def final_ee(solver):
        ctrl = MPCController(solver=solver, sim_plant=solver.plant)
        res = jax.jit(lambda x: ctrl.run(x, steps=120))(xcold)
        q = res.X_applied[:solver.plant.nq, -1]
        return jnp.linalg.norm(solver.plant.kinematics.ee_pos_xyz(q)[:2] - goal)

    err_ref = float(final_ee(ref))
    err_rti = float(final_ee(rti))
    assert np.isfinite(err_rti)
    assert err_ref < 0.1, err_ref
    assert err_rti < 0.1, err_rti


def test_rti_carried_totals_consistent():
    """The RTI branch's carried J equals a fresh total_cost at the
    returned trajectory (dJ bookkeeping is exact)."""
    rti, x0, u0 = _solver({"max_iter": 5, "ls_fixed_alpha": 1.0})
    res = jax.jit(rti.solve)(x0, u0)
    J_direct = float(rti.total_cost(res.X, res.U, rti.cost.default_params, ()))
    assert abs(float(res.J) - J_direct) < 1e-8 * max(1.0, abs(J_direct))


def test_rti_lean_matches_full_rti_iterates():
    """Lean RTI (rti_lean: no merit/exit metrics at all) takes exactly the
    same steps as metric-carrying RTI — the metrics never influence the
    fixed-alpha update — so with early exit disabled the two produce
    identical U after the same iteration budget."""
    robot = serial_arm(3)
    plant = URDFPlant(robot=robot, integrator_type=1)
    nu = plant.nu
    N = 10
    cost = UrdfCost(
        plant,
        jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 0.1, 0.1, 0.1])),
        100.0 * jnp.eye(6),
        0.01 * jnp.eye(nu),
        jnp.asarray([1.5, 1.0, 0.0, 0.0, 0.0, 0.0]),
    )
    base = dict(expected_reduction_min=-100.0, exit_tolerance=0.0,
                max_iter=4, ls_fixed_alpha=1.0)
    full = make_sqp(plant, cost, None, N, 0.05, method="S",
                    options=SQPOptions(**base))
    lean = make_sqp(plant, cost, None, N, 0.05, method="S",
                    options=SQPOptions(**base, rti_lean=True))
    x0 = jnp.zeros((plant.nx, N))
    u0 = jnp.zeros((nu, N - 1))
    rf = jax.jit(full.solve)(x0, u0)
    rl = jax.jit(lean.solve)(x0, u0)
    np.testing.assert_allclose(np.asarray(rl.U), np.asarray(rf.U),
                               atol=1e-12, rtol=0)
    assert int(rl.sqp_iters) == int(rf.sqp_iters)
    # lean never computes metrics: carried J is the zero placeholder
    assert float(rl.J) == 0.0
