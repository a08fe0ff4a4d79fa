"""Native C++ dynamics vs the JAX implementation — the reference's
cross-implementation pattern (ref: GRiD/test/testGRiDRefactorings.py:20-101,
tolerance 1e-10) across the language/compiler boundary."""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.urdf import serial_arm
from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
from trajoptmpcreference_tpu.ops.rbd import make_rbd

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

ARMS = [2, 3, 6]
TOL = 1e-10   # (ref: GRiD/util/util.py:59-69)


@pytest.fixture(scope="module", params=ARMS)
def setup(request):
    from trajoptmpcreference_tpu.native import NativeDynamics
    n = request.param
    robot = serial_arm(n)
    native = NativeDynamics(robot)
    rbd = make_rbd(robot)
    kin = make_kinematics(robot)
    rng = np.random.default_rng(1337)   # (ref: printGRiD.cu:10 fixed seed)
    q = rng.standard_normal(n)
    qd = rng.standard_normal(n)
    u = rng.standard_normal(n)
    return native, rbd, kin, q, qd, u


def test_rnea(setup):
    native, rbd, kin, q, qd, u = setup
    c_n = native.rnea(q, qd)
    c_j, _, _, _ = rbd.rnea(jnp.asarray(q), jnp.asarray(qd))
    np.testing.assert_allclose(c_n, np.asarray(c_j), atol=TOL)
    qdd = np.sin(q)
    c_n2 = native.rnea(q, qd, qdd)
    c_j2, _, _, _ = rbd.rnea(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
    np.testing.assert_allclose(c_n2, np.asarray(c_j2), atol=TOL)


def test_crba_and_minv(setup):
    native, rbd, kin, q, qd, u = setup
    np.testing.assert_allclose(native.crba(q), np.asarray(rbd.crba(jnp.asarray(q))),
                               atol=TOL)
    np.testing.assert_allclose(native.minv(q), np.asarray(rbd.minv(jnp.asarray(q))),
                               atol=1e-8)


def test_fd(setup):
    native, rbd, kin, q, qd, u = setup
    np.testing.assert_allclose(
        native.fd(q, qd, u),
        np.asarray(rbd.fd(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))),
        atol=1e-8)


def test_rnea_grad(setup):
    native, rbd, kin, q, qd, u = setup
    qdd = np.cos(q)
    g_n = native.rnea_grad(q, qd, qdd)
    g_j = rbd.rnea_grad(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
    np.testing.assert_allclose(g_n, np.asarray(g_j), atol=TOL)


def test_fd_grad(setup):
    native, rbd, kin, q, qd, u = setup
    g_n = native.fd_grad(q, qd, u)
    g_j = rbd.fd_grad(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    np.testing.assert_allclose(g_n, np.asarray(g_j), atol=1e-7)


def test_aba(setup):
    """Native ABA vs JAX ABA and vs Minv(u - c) (the FD identity; ref:
    RBDReference_generalized.py:913-998, GRiD/test/test_aba.cu)."""
    native, rbd, kin, q, qd, u = setup
    qdd_n = native.aba(q, qd, u)
    qdd_j = np.asarray(rbd.aba(jnp.asarray(q), jnp.asarray(qd),
                               jnp.asarray(u)))
    np.testing.assert_allclose(qdd_n, qdd_j, atol=TOL)
    np.testing.assert_allclose(qdd_n, native.fd(q, qd, u), atol=1e-8)


def test_idsva(setup):
    """Native IDSVA vs JAX IDSVA and vs the 4-pass rnea_grad (ref:
    RBDReference_generalized.py:717-826)."""
    native, rbd, kin, q, qd, u = setup
    qdd = np.sin(q)
    dq_n, dqd_n = native.idsva(q, qd, qdd)
    dq_j, dqd_j = rbd.idsva(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
    np.testing.assert_allclose(dq_n, np.asarray(dq_j), atol=TOL)
    np.testing.assert_allclose(dqd_n, np.asarray(dqd_j), atol=TOL)
    # rnea_grad's (n, 2n) [d/dq, d/dqd] agrees (no damping in either)
    g4 = native.rnea_grad(q, qd, qdd)
    np.testing.assert_allclose(dq_n, g4[:, : native.n], atol=1e-8)
    np.testing.assert_allclose(dqd_n, g4[:, native.n:], atol=1e-8)


def test_kinematics(setup):
    native, rbd, kin, q, qd, u = setup
    p_n = native.ee_pos(q)
    p_j = np.asarray(kin.ee_pos_xyz(jnp.asarray(q)))
    np.testing.assert_allclose(p_n, p_j, atol=TOL)
    J_n = native.ee_jacobian(q)
    J_j = np.asarray(kin.jacobian(jnp.asarray(q)))
    np.testing.assert_allclose(J_n, J_j[: J_n.shape[0]], atol=1e-5)


def test_cli_smoke(tmp_path, capsys):
    """The printGRiD-analogue CLI: emit + full print/cross-check run
    (ref: GRiD/printGRiD.py:27-47, printReferenceValues.py)."""
    from trajoptmpcreference_tpu.native.__main__ import main
    out = tmp_path / "arm2.cpp"
    assert main(["arm2", "--emit", str(out)]) == 0
    assert "tmr::rnea" in out.read_text()
    assert main(["arm2"]) == 0
    assert "ALL CHECKS PASSED" in capsys.readouterr().out
