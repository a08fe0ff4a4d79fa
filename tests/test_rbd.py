"""Cross-validation of the rigid-body dynamics kernels.

Strategy (mirrors the reference's cross-implementation testing,
ref: GRiD/test/testGRiDRefactorings.py:20-101, but strengthened):
every algorithm is checked against an independent oracle —
autodiff of a sibling algorithm, an algebraic identity, or physics
invariants — rather than a port of itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.urdf import serial_arm
from trajoptmpcreference_tpu.ops import spatial
from trajoptmpcreference_tpu.ops.rbd import make_rbd
from trajoptmpcreference_tpu.ops.kinematics import make_kinematics

ARMS = [2, 3, 6]


@pytest.fixture(scope="module", params=ARMS)
def setup(request):
    n = request.param
    robot = serial_arm(n)
    rbd = make_rbd(robot)
    # jit the bundle once per robot so CPU test time is compile + O(us) eval
    rbd = dataclasses.replace(
        rbd,
        rnea=jax.jit(rbd.rnea, static_argnames=("gravity", "use_damping")),
        rnea_grad=jax.jit(rbd.rnea_grad, static_argnames=("gravity", "use_damping")),
        minv=jax.jit(rbd.minv, static_argnames=("output_dense",)),
        crba=jax.jit(rbd.crba),
        aba=jax.jit(rbd.aba, static_argnames=("gravity",)),
        idsva=jax.jit(rbd.idsva, static_argnames=("gravity",)),
        fd=jax.jit(rbd.fd, static_argnames=("gravity",)),
        fd_grad=jax.jit(rbd.fd_grad, static_argnames=("gravity",)),
    )
    kin = make_kinematics(robot)
    rng = np.random.default_rng(1234 + n)
    q = jnp.array(rng.standard_normal(n))
    qd = jnp.array(rng.standard_normal(n))
    u = jnp.array(rng.standard_normal(n))
    return robot, rbd, kin, q, qd, u


def test_spatial_identities():
    rng = np.random.default_rng(0)
    a = jnp.array(rng.standard_normal(6))
    b = jnp.array(rng.standard_normal(6))
    # motion-cross antisymmetry used to matrix-ify the reference's loops
    np.testing.assert_allclose(spatial.crm(a) @ b, -(spatial.crm(b) @ a), atol=1e-14)
    # force-cross swap identity
    np.testing.assert_allclose(spatial.crf(a) @ b, spatial.icrf(b) @ a, atol=1e-14)
    # spatial transform inverse
    X = spatial.crm(a)  # not a transform; build a real one instead
    E = spatial.joint_free_rotation(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.7))
    Xr = jnp.block([[E, jnp.zeros((3, 3))], [jnp.zeros((3, 3)), E]])
    t = jnp.array(rng.standard_normal(3))
    Xt = jnp.eye(6).at[3:, :3].set(-spatial._skew(t))
    X = Xr @ Xt
    np.testing.assert_allclose(spatial.spatial_inv(X) @ X, np.eye(6), atol=1e-13)


def test_crba_inverts_minv(setup):
    _, rbd, _, q, _, _ = setup
    H = rbd.crba(q)
    Mi = rbd.minv(q)
    np.testing.assert_allclose(H @ Mi, np.eye(len(q)), atol=1e-10)
    # symmetry
    np.testing.assert_allclose(H, H.T, atol=1e-12)
    np.testing.assert_allclose(Mi, Mi.T, atol=1e-12)


def test_aba_matches_minv_fd(setup):
    _, rbd, _, q, qd, u = setup
    np.testing.assert_allclose(rbd.aba(q, qd, u), rbd.fd(q, qd, u), atol=1e-10)


def test_rnea_inverts_fd(setup):
    """tau = RNEA(q, qd, FD(q, qd, tau)) round-trip."""
    _, rbd, _, q, qd, u = setup
    qdd = rbd.fd(q, qd, u)
    c, _, _, _ = rbd.rnea(q, qd, qdd)
    np.testing.assert_allclose(c, u, atol=1e-10)


def test_rnea_grad_matches_autodiff(setup):
    _, rbd, _, q, qd, u = setup
    n = len(q)
    qdd = rbd.fd(q, qd, u)

    def tau(xx):
        c, _, _, _ = rbd.rnea(xx[:n], xx[n:], qdd)
        return c

    J_auto = jax.jacfwd(tau)(jnp.concatenate([q, qd]))
    J_ana = rbd.rnea_grad(q, qd, qdd)
    np.testing.assert_allclose(J_ana, J_auto, atol=1e-10)


def test_idsva_matches_rnea_grad(setup):
    _, rbd, _, q, qd, u = setup
    n = len(q)
    qdd = rbd.fd(q, qd, u)
    dq, dqd = rbd.idsva(q, qd, qdd)
    J = rbd.rnea_grad(q, qd, qdd)
    np.testing.assert_allclose(dq, J[:, :n], atol=1e-9)
    np.testing.assert_allclose(dqd, J[:, n:], atol=1e-9)


def test_fd_grad_matches_autodiff(setup):
    _, rbd, _, q, qd, u = setup
    n = len(q)

    def fd_flat(z):
        return rbd.fd(z[:n], z[n:2 * n], z[2 * n:])

    J_auto = jax.jacfwd(fd_flat)(jnp.concatenate([q, qd, u]))
    J_ana = rbd.fd_grad(q, qd, u)
    np.testing.assert_allclose(J_ana, J_auto, atol=1e-9)


def test_gravity_free_energy_conservation():
    """Hamiltonian 0.5 qd^T H qd is conserved under zero torque, zero gravity."""
    robot = serial_arm(3)
    rbd = make_rbd(robot)
    q = jnp.array([0.3, -0.4, 0.2])
    qd = jnp.array([0.5, 0.1, -0.2])
    u = jnp.zeros(3)
    dt = 1e-4

    def energy(q, qd):
        return 0.5 * qd @ rbd.crba(q) @ qd

    @jax.jit
    def rollout(q, qd):
        def body(carry, _):
            q, qd = carry
            qdd = rbd.aba(q, qd, u, gravity=0.0)
            return (q + dt * qd, qd + dt * qdd), None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=100)
        return q, qd

    e0 = energy(q, qd)
    q, qd = rollout(q, qd)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 1e-5


def test_kinematics_geometry():
    """2-link planar arm: closed-form forward kinematics.

    Joint axes are +z, links along the rotated +y: with the reference's hom
    convention the ee point is the analytic 2-link position used by ArmCost
    (ref: TrajoptCost.py:149-160): x = -l2 sin(q1+q2) - l1 sin(q1),
    y = l2 cos(q1+q2) + l1 cos(q1).
    """
    robot = serial_arm(2)
    kin = make_kinematics(robot)
    rng = np.random.default_rng(7)
    for _ in range(5):
        q = jnp.array(rng.uniform(-np.pi, np.pi, 2))
        p = kin.ee_pos_xyz(q)
        x_expected = -np.sin(q[0] + q[1]) - np.sin(q[0])
        y_expected = np.cos(q[0] + q[1]) + np.cos(q[0])
        np.testing.assert_allclose(p[0], x_expected, atol=1e-12)
        np.testing.assert_allclose(p[1], y_expected, atol=1e-12)
        np.testing.assert_allclose(p[2], 0.0, atol=1e-12)


def test_jacobian_matches_closed_form():
    robot = serial_arm(2)
    kin = make_kinematics(robot)
    q = jnp.array([0.3, -0.8])
    J = kin.jacobian(q)
    c1, s1 = np.cos(q[0]), np.sin(q[0])
    c12, s12 = np.cos(q[0] + q[1]), np.sin(q[0] + q[1])
    J_exp = np.array([[-c12 - c1, -c12], [-s12 - s1, -s12]])
    np.testing.assert_allclose(J, J_exp, atol=1e-12)


def test_jacobian_tot_state_structure():
    robot = serial_arm(2)
    kin = make_kinematics(robot)
    q = jnp.array([0.3, -0.8])
    qd = jnp.array([0.5, 0.25])
    Jt = kin.jacobian_tot_state(q, qd)
    assert Jt.shape == (4, 4)

    # top-left and bottom-right are J; bottom-left is dJ/dt = (dJ/dq) qd
    J = kin.jacobian(q)
    np.testing.assert_allclose(Jt[:2, :2], J, atol=1e-12)
    np.testing.assert_allclose(Jt[2:, 2:], J, atol=1e-12)
    np.testing.assert_allclose(Jt[:2, 2:], 0.0, atol=1e-12)

    # bottom-left against autodiff of the full task-space map
    def task(z):
        qq, qqd = z[:2], z[2:]
        return jnp.concatenate([kin.ee_pos(qq), kin.jacobian(qq) @ qqd])

    J_auto = jax.jacfwd(task)(jnp.concatenate([q, qd]))
    np.testing.assert_allclose(Jt, J_auto, atol=1e-12)


@pytest.mark.slow
def test_vmap_batching():
    robot = serial_arm(3)
    rbd = make_rbd(robot)
    rng = np.random.default_rng(3)
    Q = jnp.array(rng.standard_normal((8, 3)))
    Qd = jnp.array(rng.standard_normal((8, 3)))
    U = jnp.array(rng.standard_normal((8, 3)))
    batched = jax.vmap(rbd.fd)(Q, Qd, U)
    single = jnp.stack([rbd.fd(Q[i], Qd[i], U[i]) for i in range(8)])
    np.testing.assert_allclose(batched, single, atol=1e-12)


@pytest.mark.slow
def test_geometric_kinematics_match_autodiff():
    """The geometric J / dJdq recursions vs a jax.jacfwd oracle (the
    autodiff path OOMs on TPU at scale; the geometric path must match it)."""
    for n in (2, 4, 6):
        robot = serial_arm(n)
        kin = make_kinematics(robot)
        rng = np.random.default_rng(42 + n)
        q = jnp.array(rng.standard_normal(n))
        J_ad = jax.jacfwd(kin.ee_pos_xyz)(q)[: min(3, n)]
        np.testing.assert_allclose(np.asarray(kin.jacobian(q)),
                                   np.asarray(J_ad), atol=1e-12)
        dJ_ad = jax.jacfwd(lambda qq: jax.jacfwd(kin.ee_pos_xyz)(qq)[: min(3, n)])(q)
        np.testing.assert_allclose(np.asarray(kin.djdq(q)),
                                   np.asarray(dJ_ad), atol=1e-12)


@pytest.mark.slow
def test_d2jdq2_matches_autodiff():
    """Exact d2J/dq2 vs double-jacfwd oracle (reference only has the 2-link
    shortcut, ref: RBDReference.py:273-315)."""
    robot = serial_arm(3)
    kin = make_kinematics(robot)
    q = jnp.array(np.random.default_rng(9).standard_normal(3))
    dd = kin.d2jdq2(q)                      # (k, n, n, n)
    dd_ad = jax.jacfwd(jax.jacfwd(jax.jacfwd(
        lambda qq: kin.ee_pos_xyz(qq)[:3])))(q)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(dd_ad), atol=1e-11)
