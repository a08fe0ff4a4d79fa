"""Tracing / op-accounting / timing utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu import (
    PendulumPlant,
    QuadraticCost,
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_sqp,
    serial_arm,
)
from trajoptmpcreference_tpu.utils import cost_analysis, solve_traced, time_fn


def _arm_solver():
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    return make_sqp(plant, cost, None, 10, 0.1, method="S",
                    options=SQPOptions(expected_reduction_min=-100.0,
                                       max_iter=30))


@pytest.mark.slow
def test_trace_matches_untraced_solve():
    solver = _arm_solver()
    x0 = jnp.zeros((4, 10))
    u0 = jnp.zeros((2, 9))
    X, U, tr = jax.jit(lambda a, b: solve_traced(solver, a, b))(x0, u0)
    res = jax.jit(solver.solve)(x0, u0)
    # same final iterate as the production while_loop path
    np.testing.assert_allclose(np.asarray(U), np.asarray(res.U), atol=1e-10)
    assert int(tr.exit_code) == int(res.exit_sqp)
    it = int(tr.iters)
    assert it == int(res.sqp_iters) + 1  # trace counts the exiting iteration
    live = np.asarray(tr.live)
    assert live[:it].all() and not live[it:].any()
    # J non-increasing over accepted iterations
    J = np.asarray(tr.J)[live]
    acc = np.asarray(tr.accepted)[live]
    assert (np.diff(J) <= 1e-9).all()
    assert acc[:-1].all()  # this problem accepts every step until exit


@pytest.mark.slow
def test_trace_is_vmappable():
    solver = _arm_solver()
    B = 3
    x0s = jnp.zeros((B, 4, 10))
    u0s = jnp.zeros((B, 2, 9))
    X, U, tr = jax.jit(jax.vmap(lambda a, b: solve_traced(solver, a, b)))(
        x0s, u0s)
    assert tr.J.shape == (B, 30)
    assert (np.asarray(tr.exit_code) == 1).all()


@pytest.mark.slow
def test_trace_linsys_dual_trace():
    """trace_linsys=True surfaces the PCG dual trace (|nu| + true residual
    histories, the reference's (trace, trace2) — ref: PCG.py:82-95) per SQP
    iteration, and the histories are consistent: both decrease to the exit
    and the true residual at the exit iteration is small."""
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    solver = make_sqp(plant, cost, None, 10, 0.1, method="PCG-SS",
                      options=SQPOptions(expected_reduction_min=-100.0,
                                         max_iter=8, max_iter_linSys=40,
                                         exit_tolerance_linSys=1e-10,
                                         trace_linsys=True))
    x0 = jnp.zeros((4, 10))
    u0 = jnp.zeros((2, 9))
    X, U, tr = jax.jit(lambda a, b: solve_traced(solver, a, b))(x0, u0)
    assert tr.pcg_nu.shape == (8, 41)
    assert tr.pcg_resid.shape == (8, 41)
    it0_pcg = int(np.asarray(tr.pcg_iters)[0])
    assert it0_pcg > 0
    nu = np.asarray(tr.pcg_nu)[0]
    resid = np.asarray(tr.pcg_resid)[0]
    # nu at the exit met the tolerance; true residual shrank with it
    assert nu[it0_pcg] < 1e-10
    assert resid[it0_pcg] < 1e-4 * max(resid[0], 1.0)
    # untraced solver produces the same iterates (the trace is pure output)
    plain = make_sqp(plant, cost, None, 10, 0.1, method="PCG-SS",
                     options=SQPOptions(expected_reduction_min=-100.0,
                                        max_iter=8, max_iter_linSys=40,
                                        exit_tolerance_linSys=1e-10))
    res = jax.jit(plain.solve)(x0, u0)
    np.testing.assert_allclose(np.asarray(U), np.asarray(res.U), atol=1e-10)


def test_cost_analysis_reports_flops():
    plant = PendulumPlant()
    cost = QuadraticCost(jnp.eye(2), jnp.eye(2), jnp.eye(1),
                         jnp.array([3.14, 0.0]))
    solver = make_sqp(plant, cost, None, 10, 0.1, method="S")
    stats = cost_analysis(solver.solve, jnp.zeros((2, 10)), jnp.zeros((1, 9)))
    assert stats.get("flops", 0) > 0


def test_time_fn_syncs():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((256, 256))
    dt, out = time_fn(f, x, reps=2)
    assert dt > 0 and out.shape == (256, 256)
