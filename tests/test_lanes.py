"""Batch-minor (lanes) dynamics vs the per-sample reference kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.urdf import serial_arm
from trajoptmpcreference_tpu.ops import lanes
from trajoptmpcreference_tpu.ops.rbd import make_rbd

ARMS = [2, 3, 6]


@pytest.fixture(scope="module", params=ARMS)
def setup(request):
    n = request.param
    robot = serial_arm(n)
    rbd = make_rbd(robot)
    rng = np.random.default_rng(7 + n)
    L = 5
    q = jnp.asarray(rng.standard_normal((n, L)))
    qd = jnp.asarray(rng.standard_normal((n, L)))
    u = jnp.asarray(rng.standard_normal((n, L)))
    return robot, rbd, q, qd, u


def test_fd_lanes_matches(setup):
    robot, rbd, q, qd, u = setup
    out = lanes.fd_lanes(robot, q, qd, u)
    # one vmapped+jitted oracle call instead of L eager traces
    ref = jax.jit(jax.vmap(rbd.fd, in_axes=1, out_axes=1))(q, qd, u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_fd_grad_lanes_matches(setup):
    robot, rbd, q, qd, u = setup
    out = lanes.fd_grad_lanes(robot, q, qd, u)
    ref = jax.jit(jax.vmap(rbd.fd_grad, in_axes=1, out_axes=2))(q, qd, u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


@pytest.mark.slow
def test_custom_vmap_folding(setup):
    """Single, vmapped, and nested-vmapped calls all agree (lane folding)."""
    robot, rbd, q, qd, u = setup
    n, L = q.shape
    fd1, fdg1 = lanes.make_rbd_lanes(robot)
    # single sample
    np.testing.assert_allclose(
        np.asarray(fd1(q[:, 0], qd[:, 0], u[:, 0])),
        np.asarray(rbd.fd(q[:, 0], qd[:, 0], u[:, 0])), atol=1e-10)
    # one vmap level — oracle is ONE vmapped+jitted call, not L eager traces
    out = jax.jit(jax.vmap(fdg1))(q.T, qd.T, u.T)    # (L, n, 3n)
    ref1 = jax.jit(jax.vmap(rbd.fd_grad))(q.T, qd.T, u.T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref1), atol=1e-10)
    # nested vmap (scenarios x knots)
    B, K = 3, 4
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((B, K, n)))
    QD = jnp.asarray(rng.standard_normal((B, K, n)))
    UU = jnp.asarray(rng.standard_normal((B, K, n)))
    nested = jax.jit(jax.vmap(jax.vmap(fdg1)))(Q, QD, UU)
    ref2 = jax.jit(jax.vmap(jax.vmap(rbd.fd_grad)))(Q, QD, UU)
    np.testing.assert_allclose(np.asarray(nested), np.asarray(ref2),
                               atol=1e-10)


@pytest.mark.slow
def test_pallas_fd_grad_interpret():
    """The fused Pallas fd_grad kernel (interpreter mode on CPU; the
    compiled path is validated on real TPU) matches the XLA lanes path to
    f32 roundoff."""
    robot = serial_arm(6)
    rng = np.random.default_rng(11)
    # 128 lanes split as two 64-lane tiles: exercises the multi-tile
    # lax.map path at half the (slow) interpreter cost of the old 2x128
    L = 128
    q = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    qd = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    u = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    ref = lanes.fd_grad_lanes(robot, q, qd, u)
    out = lanes._pallas_fd_grad(robot, -9.81, q, qd, u, block_l=64,
                                interpret=True)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4


def test_pallas_fd_interpret():
    """The fused Pallas forward-only fd kernel (interpreter mode on CPU;
    the compiled path is A/B'd on real TPU) matches the XLA lanes path to
    f32 roundoff."""
    robot = serial_arm(6)
    rng = np.random.default_rng(12)
    L = 256
    q = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    qd = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    u = jnp.asarray(rng.standard_normal((6, L)) * 0.3, jnp.float32)
    ref = lanes.fd_lanes(robot, q, qd, u)
    out = lanes._pallas_fd(robot, -9.81, q, qd, u, block_l=128,
                           interpret=True)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4


@pytest.mark.slow
def test_task_vec_plain_and_lanes():
    """task_vec = [ee_pos_k; J qd] in one frames pass must equal the
    separate ee_pos + jacobian calls, in both plain and lanes kinematics,
    and its custom JVP must match jacobian_tot_state."""
    from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
    for n in ARMS:
        robot = serial_arm(n)
        rng = np.random.default_rng(3 + n)
        q = jnp.asarray(rng.standard_normal(n))
        qd = jnp.asarray(rng.standard_normal(n))
        k = min(3, n)
        for use_lanes in (False, True):
            kin = make_kinematics(robot, use_lanes=use_lanes)
            ref = jnp.concatenate([kin.ee_pos_xyz(q)[:k], kin.jacobian(q) @ qd])
            out = kin.task_vec(q, qd)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-12)
            # tangent = jacobian_tot_state @ [tq; tqd]
            t = jnp.asarray(rng.standard_normal(2 * n))
            _, jvp = jax.jvp(lambda x: kin.task_vec(x[:n], x[n:]),
                             (jnp.concatenate([q, qd]),), (t,))
            ref_t = kin.jacobian_tot_state(q, qd) @ t
            np.testing.assert_allclose(np.asarray(jvp), np.asarray(ref_t),
                                       atol=1e-9)


def test_pallas_task_vec_interpret():
    """The fused Pallas task-residual kernel (interpreter mode on CPU; the
    compiled path is A/B'd on real TPU) matches the XLA lanes path."""
    from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
    robot = serial_arm(6)
    rng = np.random.default_rng(13)
    B = 256
    q = jnp.asarray(rng.standard_normal((B, 6)) * 0.3, jnp.float32)
    qd = jnp.asarray(rng.standard_normal((B, 6)) * 0.3, jnp.float32)
    kin_p = make_kinematics(robot, use_lanes=True, use_pallas_task=True,
                            pallas_interpret=True)
    kin_x = make_kinematics(robot, use_lanes=True)
    out = jax.vmap(kin_p.task_vec)(q, qd)
    ref = jax.vmap(kin_x.task_vec)(q, qd)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-5
