"""URDF parsing: the file parser must agree with the programmatic builder
and handle the reference's model files (read-only fixtures, not copied)."""

import os
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.models.urdf import parse_urdf, serial_arm
from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
from trajoptmpcreference_tpu.ops.rbd import make_rbd

REF_MODELS = pathlib.Path("/root/reference/models")


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_parse_matches_serial_arm(n):
    """parse_urdf on the reference's arm files == our programmatic model."""
    path = REF_MODELS / f"arm{n}.urdf"
    if not path.exists():
        pytest.skip("reference models not available")
    parsed = parse_urdf(str(path))
    built = serial_arm(n)
    assert parsed.n == built.n
    np.testing.assert_array_equal(parsed.parent, built.parent)
    np.testing.assert_allclose(parsed.axis, built.axis, atol=1e-12)
    np.testing.assert_allclose(parsed.X_fixed, built.X_fixed, atol=1e-12)
    np.testing.assert_allclose(parsed.I_spatial, built.I_spatial, atol=1e-12)


def test_reference_arm6_urdf_is_malformed():
    """The reference's arm6.urdf has a copy-paste bug: joint6 re-declares
    joint5's parent/child (link4 -> link5), orphaning link6
    (ref: models/arm6.urdf:75-80).  The parser must reject it rather than
    silently build a 5-DoF robot."""
    path = REF_MODELS / "arm6.urdf"
    if not path.exists():
        pytest.skip("reference models not available")
    with pytest.raises(ValueError, match="root link"):
        parse_urdf(str(path))


@pytest.mark.parametrize("n", [2, 5])
def test_parsed_dynamics_match_built(n):
    path = REF_MODELS / f"arm{n}.urdf"
    if not path.exists():
        pytest.skip("reference models not available")
    rbd_p = make_rbd(parse_urdf(str(path)))
    rbd_b = make_rbd(serial_arm(n))
    rng = np.random.default_rng(0)
    q = jnp.array(rng.standard_normal(n))
    qd = jnp.array(rng.standard_normal(n))
    u = jnp.array(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(rbd_p.fd(q, qd, u)),
                               np.asarray(rbd_b.fd(q, qd, u)), atol=1e-12)
    kin_p = make_kinematics(parse_urdf(str(path)))
    kin_b = make_kinematics(serial_arm(n))
    np.testing.assert_allclose(np.asarray(kin_p.ee_pos_xyz(q)),
                               np.asarray(kin_b.ee_pos_xyz(q)), atol=1e-12)


def test_fixed_joint_elimination(tmp_path):
    """Fixed joints fold their transform into the child chain
    (ref: URDFParser.py:330-351)."""
    urdf = """<?xml version="1.0"?>
<robot name="fixed_test">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin rpy="0 0 0" xyz="0 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <link name="l1">
    <inertial><origin rpy="0 0 0" xyz="0 0.5 0"/><mass value="0.1"/>
      <inertia ixx="0.008" ixy="0" ixz="0" iyy="0.008" iyz="0" izz="0.0001"/>
    </inertial>
  </link>
  <joint name="jfix" type="fixed">
    <parent link="l1"/><child link="l2"/>
    <origin rpy="0 0 0" xyz="0 0.25 0"/>
  </joint>
  <link name="l2"/>
  <joint name="j2" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin rpy="0 0 0" xyz="0 0.75 0"/><axis xyz="0 0 1"/>
  </joint>
  <link name="l3">
    <inertial><origin rpy="0 0 0" xyz="0 0.5 0"/><mass value="0.1"/>
      <inertia ixx="0.008" ixy="0" ixz="0" iyy="0.008" iyz="0" izz="0.0001"/>
    </inertial>
  </link>
</robot>"""
    p = tmp_path / "fixed.urdf"
    p.write_text(urdf)
    robot = parse_urdf(str(p))
    assert robot.n == 2           # fixed joint eliminated
    # second joint origin = 0.25 + 0.75 = 1.0 along y
    np.testing.assert_allclose(robot.t_fixed[1], [0.0, 1.0, 0.0], atol=1e-12)


def test_bfs_secondary_numbering(tmp_path):
    """BFS levels/order on a branched tree (the reference's secondary
    bfs numbering, ref: URDFParser.py:389-418): a Y-shaped robot —
    base -> j0 -> l1, then l1 -> {jA -> lA -> jA2 -> lA2, jB -> lB}."""
    inertial = """<inertial><origin rpy="0 0 0" xyz="0 0.5 0"/>
      <mass value="0.1"/>
      <inertia ixx="0.008" ixy="0" ixz="0" iyy="0.008" iyz="0" izz="0.0001"/>
    </inertial>"""
    j = lambda name, p, c: f"""<joint name="{name}" type="revolute">
    <parent link="{p}"/><child link="{c}"/>
    <origin rpy="0 0 0" xyz="0 1 0"/><axis xyz="0 0 1"/></joint>"""
    urdf = f"""<?xml version="1.0"?>
<robot name="ytree">
  <link name="base"/>
  {j("j0", "base", "l1")}<link name="l1">{inertial}</link>
  {j("jA", "l1", "lA")}<link name="lA">{inertial}</link>
  {j("jA2", "lA", "lA2")}<link name="lA2">{inertial}</link>
  {j("jB", "l1", "lB")}<link name="lB">{inertial}</link>
</robot>"""
    p = tmp_path / "y.urdf"
    p.write_text(urdf)
    robot = parse_urdf(str(p))
    assert robot.n == 4
    # DFS ids: j0=0, jA=1, jA2=2, jB=3 (subtree before sibling)
    assert robot.parent == (-1, 0, 1, 0)
    np.testing.assert_array_equal(robot.bfs_level, [0, 1, 2, 1])
    # BFS order visits level-by-level: j0, then {jA, jB}, then jA2
    np.testing.assert_array_equal(robot.bfs_order, [0, 1, 3, 2])
    assert robot.joints_by_bfs_level() == ((0,), (1, 3), (2,))
    assert not robot.is_serial_chain()
