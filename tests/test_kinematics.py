"""URDF compiler + FK tests (golden-file strategy from SURVEY.md §4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.models.assets import generate

ASSET_DIR = generate.ASSET_DIR
G1_7DOF = os.path.join(ASSET_DIR, "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf")

SIMPLE_PENDULUM = """
<robot name="pend">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <link name="tip">
    <inertial><mass value="0.5"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
  </link>
  <joint name="swing" type="revolute">
    <origin xyz="0 0 0"/><parent link="base"/><child link="arm"/>
    <axis xyz="0 1 0"/><limit lower="-3.14" upper="3.14" effort="10" velocity="10"/>
  </joint>
  <joint name="tip_weld" type="fixed">
    <origin xyz="0 0 -1.0"/><parent link="arm"/><child link="tip"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def g1():
    if not os.path.exists(G1_7DOF):
        generate.generate_all()
    return K.load_asset(G1_7DOF)


def test_pendulum_fk_angles():
    tree = K.compile_tree(U.parse_urdf(SIMPLE_PENDULUM, from_string=True))
    assert tree.n_dof == 1 and tree.n_bodies == 3
    base_pos = jnp.zeros(3)
    base_quat = jnp.asarray([0.0, 0, 0, 1.0])
    # swing by pi/2 about +y: tip (0,0,-1) -> (-1, 0, 0)
    states = K.fk_body_states(tree, base_pos, base_quat, jnp.asarray([np.pi / 2]), jnp.zeros(1))
    tip = np.asarray(states[2, 0:3])
    np.testing.assert_allclose(tip, [-1.0, 0.0, 0.0], atol=1e-5)
    # zero angle: tip straight down
    states0 = K.fk_body_states(tree, base_pos, base_quat, jnp.zeros(1), jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(states0[2, 0:3]), [0, 0, -1.0], atol=1e-6)


def test_pendulum_tip_velocity_matches_fd():
    tree = K.compile_tree(U.parse_urdf(SIMPLE_PENDULUM, from_string=True))
    base_pos = jnp.zeros(3)
    base_quat = jnp.asarray([0.0, 0, 0, 1.0])
    q0, qd = 0.3, 1.7
    eps = 1e-4
    s = K.fk_body_states(tree, base_pos, base_quat, jnp.asarray([q0]), jnp.asarray([qd]))
    s2 = K.fk_body_states(tree, base_pos, base_quat, jnp.asarray([q0 + qd * eps]), jnp.asarray([qd]))
    fd_vel = (np.asarray(s2[2, 0:3]) - np.asarray(s[2, 0:3])) / eps
    np.testing.assert_allclose(np.asarray(s[2, 7:10]), fd_vel, atol=1e-2)
    # angular velocity: qd about +y
    np.testing.assert_allclose(np.asarray(s[2, 10:13]), [0, qd, 0], atol=1e-5)


def test_g1_tree_shape(g1):
    assert g1.n_bodies == 40
    assert g1.n_dof == 7
    assert g1.body_names[0] == "pelvis"
    assert g1.body_names[39] == "pingpong_paddle"
    assert g1.dof_names == tuple(generate.RIGHT_ARM_DOF_NAMES)
    # paddle welded to the right-arm wrist-yaw dof (dof 6)
    assert g1.body_ref_dof[39] == 6
    # composite masses conserve total mass
    total = g1.base_comp_mass + float(np.sum(g1.comp_mass))
    np.testing.assert_allclose(total, float(np.sum(g1.mass)), rtol=1e-6)


def test_g1_zero_pose_paddle_position(g1):
    base_pos = jnp.asarray([0.0, 0.0, 1.0])
    base_quat = jnp.asarray([0.0, 0, 0, 1.0])
    states = K.fk_body_states(tree=g1, base_pos=base_pos, base_quat=base_quat,
                              q=jnp.zeros(7), qd=jnp.zeros(7))
    assert states.shape == (40, 13)
    paddle = np.asarray(states[39, 0:3])
    # paddle should hang in front-right of the pelvis, near incoming ball height
    assert 0.15 < paddle[0] < 0.55, paddle
    assert -0.35 < paddle[1] < -0.05, paddle
    assert 0.9 < paddle[2] < 1.35, paddle
    # pelvis is the base
    np.testing.assert_allclose(np.asarray(states[0, 0:3]), [0, 0, 1.0], atol=1e-6)


def test_g1_batched_fk(g1):
    B = 8
    q = jnp.tile(jnp.linspace(-0.3, 0.3, 7)[None], (B, 1))
    states = K.fk_body_states(g1, jnp.zeros((B, 3)), jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (B, 1)),
                              q, jnp.zeros((B, 7)))
    assert states.shape == (B, 40, 13)
    # all envs identical inputs -> identical outputs
    np.testing.assert_allclose(np.asarray(states[0]), np.asarray(states[-1]), atol=1e-6)


def test_g1_moving_shoulder_moves_paddle_only_right_arm(g1):
    base_pos = jnp.asarray([0.0, 0.0, 1.0])
    base_quat = jnp.asarray([0.0, 0, 0, 1.0])
    s0 = K.fk_body_states(g1, base_pos, base_quat, jnp.zeros(7), jnp.zeros(7))
    q = jnp.zeros(7).at[0].set(0.8)
    s1 = K.fk_body_states(g1, base_pos, base_quat, q, jnp.zeros(7))
    # left arm bodies (21-28) unchanged, right arm (31-39) moved
    np.testing.assert_allclose(np.asarray(s0[21:29, :3]), np.asarray(s1[21:29, :3]), atol=1e-6)
    assert np.linalg.norm(np.asarray(s1[39, :3]) - np.asarray(s0[39, :3])) > 0.05


def test_g1_velocity_consistency(g1):
    """FK-reported body velocities must match finite differences of position."""
    base_pos = jnp.asarray([0.0, 0.0, 1.0])
    base_quat = jnp.asarray([0.0, 0, 0, 1.0])
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, 7).astype(np.float32))
    qd = jnp.asarray(rng.uniform(-1, 1, 7).astype(np.float32))
    eps = 1e-4
    s = K.fk_body_states(g1, base_pos, base_quat, q, qd)
    s2 = K.fk_body_states(g1, base_pos, base_quat, q + qd * eps, qd)
    fd = (np.asarray(s2[:, 0:3]) - np.asarray(s[:, 0:3])) / eps
    np.testing.assert_allclose(np.asarray(s[:, 7:10]), fd, atol=5e-2)


def test_table_and_ball_assets():
    table = K.load_asset(os.path.join(ASSET_DIR, "pingpong_table.urdf"))
    assert table.n_dof == 0 and table.n_bodies == 1
    assert len(table.geom_kind) == 2  # top + net
    ball = K.load_asset(os.path.join(ASSET_DIR, "small_ball.urdf"))
    assert ball.n_bodies == 1
    assert ball.geom_kind[0] == U.GEOM_SPHERE
    np.testing.assert_allclose(ball.geom_size[0, 0], 0.02)
    np.testing.assert_allclose(ball.mass[0], 0.0027, rtol=1e-6)


def test_27dof_variant():
    tree = K.load_asset(os.path.join(ASSET_DIR, "g1_27dof_pingpong.urdf"), floating_base=True)
    assert tree.n_dof == 27
    assert tree.n_bodies == 40
    assert tree.floating_base
