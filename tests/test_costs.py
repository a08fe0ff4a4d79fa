"""Cost-layer tests: cross-implementation agreement, QF_start, Hessian modes
(the reference's compare_cost pattern, ref: examples/compare_cost.py:39-64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu import (
    ArmCost,
    NumericalCost,
    QuadraticCost,
    URDFPlant,
    UrdfCost,
    serial_arm,
)

Q = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0]))
QF = jnp.diag(jnp.array([100.0] * 4))
R = 0.1 * jnp.eye(2)
XG = jnp.array([0.5, 1.5, 0.0, 0.0])
X = jnp.array([0.3, -0.7, 0.2, -0.1])
U = jnp.array([0.5, -0.4])
K = jnp.asarray(3)


@pytest.fixture(scope="module")
def plant():
    return URDFPlant(robot=serial_arm(2))


@pytest.fixture(scope="module")
def plant_plain():
    """Plain (non-lanes) kinematics for second-order autodiff oracles."""
    return URDFPlant(robot=serial_arm(2), use_lanes=False)


def test_three_implementations_agree(plant):
    """UrdfCost (general kinematics) == ArmCost (closed-form 2-link) ==
    NumericalCost (finite differences)."""
    urdf = UrdfCost(plant, Q, QF, R, XG)
    arm = ArmCost(Q, QF, R, XG)
    num = NumericalCost(plant, Q, QF, R, XG)
    vs = [float(c.stage_value(c.default_params, X, U, K))
          for c in (urdf, arm, num)]
    assert max(vs) - min(vs) < 1e-12
    gu = np.asarray(urdf.stage_gradient(urdf.default_params, X, U, K))
    ga = np.asarray(arm.stage_gradient(arm.default_params, X, U, K))
    gn = np.asarray(num.stage_gradient(num.default_params, X, U, K))
    np.testing.assert_allclose(gu, ga, atol=1e-12)
    np.testing.assert_allclose(gu, gn, atol=1e-7)


def test_gradient_matches_autodiff(plant):
    urdf = UrdfCost(plant, Q, QF, R, XG)
    p = urdf.default_params
    g = urdf.stage_gradient(p, X, U, K)
    g_ad = jax.grad(lambda x: urdf.stage_value(p, x, U, K))(X)
    np.testing.assert_allclose(np.asarray(g[:4]), np.asarray(g_ad), atol=1e-10)


@pytest.mark.slow
def test_hessian_modes(plant_plain):
    plant = plant_plain
    p = UrdfCost(plant, Q, QF, R, XG).default_params
    exact = UrdfCost(plant, Q, QF, R, XG, hess_mode=1)
    gn = UrdfCost(plant, Q, QF, R, XG, hess_mode=0)
    zero = UrdfCost(plant, Q, QF, R, XG, hess_mode=3)
    H_exact = np.asarray(exact.stage_hessian(p, X, U, K))
    # exact == autodiff hessian of the value
    H_ad = np.asarray(jax.hessian(
        lambda x: exact.stage_value(p, x, U, K))(X))
    np.testing.assert_allclose(H_exact[:4, :4], H_ad, atol=1e-9)
    # GN is the PSD part: equal at a stationary residual, different generally
    H_gn = np.asarray(gn.stage_hessian(p, X, U, K))
    assert np.linalg.eigvalsh(H_gn[:4, :4]).min() > -1e-10   # PSD
    assert np.asarray(zero.stage_hessian(p, X, U, K))[:4, :4].max() == 0.0


def test_qf_start_shifting(plant):
    """QF applies from QF_start onward (ref: TrajoptCost.py:40-47)."""
    c = QuadraticCost(Q, QF, R, XG, QF_start=5)
    p = c.default_params
    x = jnp.array([1.0, 0.0, 0.0, 0.0])
    u = jnp.zeros(2)
    v_before = float(c.stage_value(p, x, u, jnp.asarray(3)))
    v_after = float(c.stage_value(p, x, u, jnp.asarray(7)))
    dx = np.asarray(x - XG)
    assert v_before == pytest.approx(0.5 * dx @ np.asarray(Q) @ dx)
    assert v_after == pytest.approx(0.5 * dx @ np.asarray(QF) @ dx)


def test_params_batching(plant):
    """Goals live in the params pytree so vmap can sweep them."""
    c = UrdfCost(plant, Q, QF, R, XG)
    goals = jnp.stack([XG, XG + 0.1, XG - 0.1])
    vals = jax.vmap(
        lambda g: c.stage_value(c.default_params._replace(xg=g), X, U, K))(goals)
    assert vals.shape == (3,)
    assert len(set(np.asarray(vals).round(10))) == 3
