"""Integrator correctness: gradients vs autodiff (all 5 types) and order.

The reference's rk3/rk4 gradient chain rules reuse dxdot1 for the B2..B4
terms — a bug (ref: TrajoptPlant.py:189-265, flagged in SURVEY.md); ours are
exact compositions, so checking A, B against jax.jacfwd of the step is the
real test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.plants import (
    CartPolePlant,
    PendulumPlant,
    URDFPlant,
)
from trajoptmpcreference_tpu.models.urdf import serial_arm

TYPES = [0, 1, 2, 3, 4]   # euler, semi-implicit, midpoint, rk3, rk4
                          # (ref: TrajoptPlant.py:24-27)


@pytest.mark.parametrize("itype", TYPES)
@pytest.mark.parametrize("make", [
    PendulumPlant, CartPolePlant,
    pytest.param(lambda **kw: URDFPlant(robot=serial_arm(2), **kw),
                 id="urdf2", marks=pytest.mark.slow)])
def test_step_gradient_matches_autodiff(itype, make):
    plant = make(integrator_type=itype)
    rng = np.random.default_rng(itype)
    x = jnp.array(rng.standard_normal(plant.nx) * 0.3)
    u = jnp.array(rng.standard_normal(plant.nu) * 0.3)
    dt = 0.07
    A, B = plant.step_gradient(x, u, dt)
    A_ad = jax.jacfwd(lambda xx: plant.step(xx, u, dt))(x)
    B_ad = jax.jacfwd(lambda uu: plant.step(x, uu, dt))(u)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-9)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad), atol=1e-9)


def test_convergence_order():
    """RK4 error shrinks ~16x when dt halves; euler ~2x (on the pendulum)."""
    x = jnp.array([0.4, -0.2])
    u = jnp.array([0.3])

    def err(itype, dt):
        plant = PendulumPlant(integrator_type=itype)
        fine = PendulumPlant(integrator_type=4)
        # reference solution: many tiny rk4 steps
        xf = x
        for _ in range(64):
            xf = fine.step(xf, u, dt / 64)
        return float(jnp.linalg.norm(plant.step(x, u, dt) - xf))

    # one-step (local truncation) error ratios for dt -> dt/2:
    # euler O(dt^2) ~4x, midpoint O(dt^3) ~8x, rk4 O(dt^5) ~32x
    for itype, lo, hi in [(0, 3.0, 6.0), (2, 5.5, 12.0), (4, 18.0, 50.0)]:
        r = err(itype, 0.2) / max(err(itype, 0.1), 1e-14)
        assert lo < r < hi, (itype, r)


def test_semi_implicit_structure():
    """Semi-implicit euler: q advances with the NEW qd
    (ref: TrajoptPlant.py:110-135)."""
    plant = PendulumPlant(integrator_type=1)
    x = jnp.array([0.3, 0.5])
    u = jnp.array([0.2])
    dt = 0.1
    x1 = plant.step(x, u, dt)
    qd_new = x[1] + dt * plant.xdot(x, u)[1]
    np.testing.assert_allclose(float(x1[1]), float(qd_new), atol=1e-12)
    np.testing.assert_allclose(float(x1[0]), float(x[0] + dt * qd_new),
                               atol=1e-12)
