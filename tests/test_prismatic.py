"""Prismatic-joint coverage: the reference supports revolute AND prismatic
joints (ref: GRiD/URDFParser/Joint.py:52-98, Px/Py/Pz transforms) but ships
only revolute arm URDFs — these tests exercise the prismatic paths of the
parser, the RBD algorithms, the lanes/kinematics layers, the native C++
kernels, and an end-to-end SQP solve on a mixed R-P-R arm."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.robot import PRISMATIC, REVOLUTE
from trajoptmpcreference_tpu.models.urdf import parse_urdf
from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
from trajoptmpcreference_tpu.ops.rbd import make_rbd

_RPR_URDF = """<?xml version="1.0" ?>
<robot name="rpr_arm">
  <link name="base_link"/>
  <joint name="joint1" type="revolute">
    <parent link="base_link"/>
    <child link="link1"/>
    <origin rpy="0 0 0" xyz="0 0 0"/>
    <axis xyz="0 0 1"/>
  </joint>
  <link name="link1">
    <inertial>
      <origin rpy="1.5707963267948966 0 0" xyz="0 0.5 0"/>
      <mass value="0.1"/>
      <inertia ixx="0.0084" ixy="0.0" ixz="0.0" iyy="0.0084" iyz="0.0"
               izz="0.000125"/>
    </inertial>
  </link>
  <joint name="joint2" type="prismatic">
    <parent link="link1"/>
    <child link="link2"/>
    <origin rpy="0 0 0" xyz="0 1 0"/>
    <axis xyz="0 1 0"/>
  </joint>
  <link name="link2">
    <inertial>
      <origin rpy="1.5707963267948966 0 0" xyz="0 0.5 0"/>
      <mass value="0.1"/>
      <inertia ixx="0.0084" ixy="0.0" ixz="0.0" iyy="0.0084" iyz="0.0"
               izz="0.000125"/>
    </inertial>
  </link>
  <joint name="joint3" type="revolute">
    <parent link="link2"/>
    <child link="link3"/>
    <origin rpy="0 0 0" xyz="0 1 0"/>
    <axis xyz="0 0 1"/>
  </joint>
  <link name="link3">
    <inertial>
      <origin rpy="1.5707963267948966 0 0" xyz="0 0.5 0"/>
      <mass value="0.1"/>
      <inertia ixx="0.0084" ixy="0.0" ixz="0.0" iyy="0.0084" iyz="0.0"
               izz="0.000125"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def robot(tmp_path_factory):
    p = tmp_path_factory.mktemp("urdf") / "rpr.urdf"
    p.write_text(_RPR_URDF)
    return parse_urdf(str(p))


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal(3) * 0.5)
    qd = jnp.asarray(rng.standard_normal(3) * 0.5)
    u = jnp.asarray(rng.standard_normal(3))
    return q, qd, u


def test_parse_joint_types(robot):
    assert tuple(robot.joint_type) == (REVOLUTE, PRISMATIC, REVOLUTE)
    np.testing.assert_allclose(robot.axis[1], [0.0, 1.0, 0.0])


def test_rbd_identities(robot, state):
    """fd == aba == Minv (u - c); Minv inverts CRBA; the analytic RNEA
    gradient matches autodiff — all with a prismatic joint in the chain."""
    rbd = make_rbd(robot)
    q, qd, u = state
    qdd_fd = rbd.fd(q, qd, u)
    qdd_aba = rbd.aba(q, qd, u)
    np.testing.assert_allclose(np.asarray(qdd_aba), np.asarray(qdd_fd),
                               atol=1e-9)
    HM = rbd.crba(q) @ rbd.minv(q)
    np.testing.assert_allclose(np.asarray(HM), np.eye(3), atol=1e-9)

    def tau(xx):
        c, _, _, _ = rbd.rnea(xx[:3], xx[3:], jnp.sin(q))
        return c

    g_ad = jax.jacfwd(tau)(jnp.concatenate([q, qd]))
    g_an = rbd.rnea_grad(q, qd, jnp.sin(q))
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_ad), atol=1e-8)
    dq, dqd = rbd.idsva(q, qd, jnp.sin(q))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(g_an[:, :3]),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(dqd), np.asarray(g_an[:, 3:]),
                               atol=1e-8)


def test_kinematics_jacobian(robot, state):
    """Geometric Jacobian (prismatic columns = world axis, not axis x rel)
    matches autodiff of the EE position; lanes == plain; task_vec agrees."""
    q, qd, u = state
    for use_lanes in (False, True):
        kin = make_kinematics(robot, use_lanes=use_lanes)
        J_geo = kin.jacobian(q)
        J_ad = jax.jacfwd(kin.plain.ee_pos_xyz)(q)
        np.testing.assert_allclose(np.asarray(J_geo), np.asarray(J_ad),
                                   atol=1e-9)
        tv = kin.task_vec(q, qd)
        ref = jnp.concatenate([kin.ee_pos_xyz(q), kin.jacobian(q) @ qd])
        np.testing.assert_allclose(np.asarray(tv), np.asarray(ref),
                                   atol=1e-12)
    # total-state Jacobian (dJ/dq has prismatic branches) vs autodiff
    kin = make_kinematics(robot)
    Jt = kin.jacobian_tot_state(q, qd)
    Jt_ad = jax.jacfwd(
        lambda xx: jnp.concatenate(
            [kin.ee_pos_xyz(xx[:3]),
             kin.jacobian(xx[:3]) @ xx[3:]]))(jnp.concatenate([q, qd]))
    np.testing.assert_allclose(np.asarray(Jt), np.asarray(Jt_ad), atol=1e-8)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_cross_check(robot, state):
    from trajoptmpcreference_tpu.native import NativeDynamics
    rbd = make_rbd(robot)
    nd = NativeDynamics(robot)
    q, qd, u = (np.asarray(a) for a in state)
    np.testing.assert_allclose(nd.rnea(q, qd, np.sin(q)),
                               np.asarray(rbd.rnea(*state[:2],
                                                   jnp.sin(state[0]))[0]),
                               atol=1e-10)
    np.testing.assert_allclose(nd.aba(q, qd, u),
                               np.asarray(rbd.aba(*state)), atol=1e-10)
    dq_n, dqd_n = nd.idsva(q, qd, np.sin(q))
    dq_j, dqd_j = rbd.idsva(*state[:2], jnp.sin(state[0]))
    np.testing.assert_allclose(dq_n, np.asarray(dq_j), atol=1e-10)
    np.testing.assert_allclose(dqd_n, np.asarray(dqd_j), atol=1e-10)
    kin = make_kinematics(robot)
    np.testing.assert_allclose(nd.ee_pos(q),
                               np.asarray(kin.ee_pos_xyz(state[0])),
                               atol=1e-10)


@pytest.mark.slow
def test_sqp_solve_rpr(robot):
    """End-to-end: task-space SQP on the R-P-R arm converges and reaches."""
    import trajoptmpcreference_tpu as tmr

    plant = tmr.URDFPlant(robot=robot)
    goal = jnp.array([0.8, 2.2, 0.0, 0.0, 0.0, 0.0])
    cost = tmr.UrdfCost(plant, jnp.eye(6), 100.0 * jnp.eye(6),
                        0.1 * jnp.eye(3), goal)
    opts = tmr.SQPOptions(expected_reduction_min=-100.0)
    solver = tmr.make_sqp(plant, cost, None, N=12, dt=0.1, method="S",
                          options=opts)
    res = jax.jit(solver.solve)(jnp.zeros((plant.nx, 12)),
                                jnp.zeros((plant.nu, 11)))
    assert int(res.exit_sqp) == 1
    kin = plant.kinematics
    ee = kin.ee_pos_xyz(res.X[:plant.nq, -1])
    assert float(jnp.linalg.norm(ee[:2] - goal[:2])) < 0.15
