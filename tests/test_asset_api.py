"""Asset-introspection + force-sensor + viewer-camera API parity tests
(reference surface: get_asset_* family joint_monkey2_new.py:237-316,
create_asset_force_sensor `...only_3_actor.py:455-460`,
get_viewer_camera_transform joint_monkey2_new.py:661)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.models.assets import generate
from isaacgym_tpu.sim import asset_api as A
from isaacgym_tpu.sim import tensor_api as T
from isaacgym_tpu.sim.scene import (
    ActorSpec, PlaneParams, SceneSpec, compile_scene, DRIVE_POS,
)
from isaacgym_tpu.sim.simulator import Simulator

ASSET_DIR = generate.ASSET_DIR
G1_7DOF = os.path.join(
    ASSET_DIR, "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf")

PENDULUM = """
<robot name="pend">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <joint name="swing" type="revolute">
    <origin xyz="0 0 0"/><parent link="base"/><child link="arm"/>
    <axis xyz="0 1 0"/><limit lower="-3.14" upper="3.14" effort="10" velocity="10"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module", autouse=True)
def _ensure_assets():
    if not os.path.exists(G1_7DOF):
        generate.generate_all()


@pytest.fixture(scope="module")
def g1():
    return K.load_asset(G1_7DOF)


def test_get_asset_introspection_g1(g1):
    # counts match the reference 40-body / 7-DOF contract (pingpong_note.txt:12-33)
    assert A.get_asset_rigid_body_count(g1) == g1.n_bodies == 40
    assert A.get_asset_dof_count(g1) == g1.n_dof == 7
    assert A.get_asset_joint_count(g1) == g1.n_bodies - 1
    assert len(A.get_asset_joint_names(g1)) == A.get_asset_joint_count(g1)
    names = A.get_asset_rigid_body_names(g1)
    assert names == list(g1.body_names)
    assert A.get_asset_rigid_body_name(g1, 39) == names[39]
    # the paddle is body 39 (reference `...only_3_actor.py:161-164`)
    assert A.find_asset_rigid_body_index(g1, "pingpong_paddle") == 39
    assert A.find_asset_rigid_body_index(g1, "no_such_body") == -1
    assert A.get_asset_dof_names(g1) == list(g1.dof_names)
    assert A.get_asset_dof_name(g1, 0) == g1.dof_names[0]
    for d in range(g1.n_dof):  # the G1 arm is all-revolute
        assert A.get_asset_dof_type(g1, d) == A.DOF_ROTATION
    assert A.get_dof_type_string(A.DOF_ROTATION) == "DOF_ROTATION"
    assert A.get_dof_type_string(A.DOF_TRANSLATION) == "DOF_TRANSLATION"
    assert A.get_dof_type_string(99) == "DOF_INVALID"


def test_get_asset_dof_properties(g1):
    props = A.get_asset_dof_properties(g1)
    for key in ("hasLimits", "lower", "upper", "driveMode", "velocity",
                "effort", "stiffness", "damping", "friction", "armature"):
        assert key in props and len(props[key]) == g1.n_dof
    np.testing.assert_array_equal(props["lower"], g1.lower)
    np.testing.assert_array_equal(props["upper"], g1.upper)
    assert (props["stiffness"] == 0).all()  # asset-level default: no drive
    # mutating the returned arrays must not touch the frozen tree
    props["lower"][:] = -99.0
    assert not (np.asarray(g1.lower) == -99.0).any()


def test_dof_type_prismatic():
    xml = PENDULUM.replace('type="revolute"', 'type="prismatic"')
    tree = K.compile_tree(U.parse_urdf(xml, from_string=True))
    assert A.get_asset_dof_type(tree, 0) == A.DOF_TRANSLATION


def _ball_scene_with_sensor():
    ball = K.load_asset(os.path.join(ASSET_DIR, "small_ball.urdf"))
    sid = A.create_asset_force_sensor(ball, 0)
    assert sid == 0 and A.get_asset_force_sensor_count(ball) == 1
    spec = SceneSpec(
        actors=[ActorSpec("ball", ball, pos=(0, 0, 0.3), fixed_base=False,
                          restitution=0.0, friction=0.5)],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    return Simulator(compile_scene(spec))


def test_force_sensor_reads_contact_force():
    import jax
    sim = _ball_scene_with_sensor()
    rows = A.scene_force_sensor_body_indices(sim.scene)
    np.testing.assert_array_equal(rows, [0])
    B = 2
    state = sim.initial_state(B)
    zeros = jnp.zeros((B, 0))

    def body(s, _):
        s = sim.step(s, zeros, zeros)
        return s, T.acquire_force_sensor_tensor(sim, s)

    _, wrench = jax.lax.scan(body, state, None, length=120)
    wrench = np.asarray(wrench)           # (T, B, 1, 6)
    assert wrench.shape == (120, B, 1, 6)
    fz = wrench[..., 0, 2]
    assert fz.max() > 0.0                 # impact force registered
    assert np.allclose(wrench[..., 0, 3:], 0.0)  # torque zero by contract
    # ball at rest on the plane: sensor reads ~ m*g upward
    m = sim.scene.free_bodies[0].mass
    np.testing.assert_allclose(fz[-1], m * 9.81, rtol=0.15)


def test_force_sensor_g1_feet_rows(g1):
    # sensors on two distinct articulation bodies resolve to env-level rows
    tree = K.load_asset(G1_7DOF)
    A.create_asset_force_sensor(tree, 5)
    A.create_asset_force_sensor(tree, 12)
    ball = K.load_asset(os.path.join(ASSET_DIR, "small_ball.urdf"))
    spec = SceneSpec(
        actors=[
            ActorSpec("ball", ball, pos=(1, 0, 1), fixed_base=False),
            ActorSpec("g1", tree, pos=(0, 0, 0.8), fixed_base=True,
                      drive_mode=DRIVE_POS,
                      stiffness=np.full(7, 20.0, np.float32),
                      damping=np.full(7, 0.5, np.float32)),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    scene = compile_scene(spec)
    rows = A.scene_force_sensor_body_indices(scene)
    # ball contributes 1 body; g1 sensors land at offset 1 + body index
    np.testing.assert_array_equal(rows, [1 + 5, 1 + 12])


def test_get_dof_frame_and_handles():
    tree = K.compile_tree(U.parse_urdf(PENDULUM, from_string=True))
    spec = SceneSpec(
        actors=[ActorSpec("pend", tree, pos=(0.5, 0.2, 1.0), fixed_base=True,
                          drive_mode=DRIVE_POS,
                          stiffness=np.asarray([10.0], np.float32),
                          damping=np.asarray([1.0], np.float32))],
        plane=None, dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(3)
    assert A.get_actor_dof_handle(sim, "pend", 0) == 0
    with pytest.raises(IndexError):
        A.get_actor_dof_handle(sim, "pend", 1)
    origin, axis = A.get_dof_frame(sim, state, "pend", 0)
    assert origin.shape == (3, 3) and axis.shape == (3, 3)
    np.testing.assert_allclose(origin, [[0.5, 0.2, 1.0]] * 3, atol=1e-6)
    np.testing.assert_allclose(axis, [[0.0, 1.0, 0.0]] * 3, atol=1e-6)
    # rotating about the joint's own axis leaves the axis fixed
    state2 = state._replace(dof_pos=state.dof_pos.at[:, 0].set(np.pi / 2))
    _, axis2 = A.get_dof_frame(sim, state2, "pend", 0)
    np.testing.assert_allclose(axis2, axis, atol=1e-6)
    # yawing the base 90 deg about z carries the axis: +y -> -x
    yaw = np.asarray([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)
    state3 = state._replace(root=state.root.at[:, 0, 3:7].set(yaw))
    _, axis3 = A.get_dof_frame(sim, state3, "pend", 0)
    np.testing.assert_allclose(axis3, [[-1.0, 0.0, 0.0]] * 3, atol=1e-5)


def test_env_origin_add_ground_and_refresh_aliases():
    np.testing.assert_array_equal(A.get_env_origin(None, 7), np.zeros(3))
    spec = SceneSpec(actors=[], plane=None)
    A.add_ground(spec, PlaneParams(restitution=0.3))
    assert spec.plane is not None and spec.plane.restitution == 0.3
    A.add_ground(spec)
    assert spec.plane.restitution == 0.0
    sentinel = object()
    for fn in (T.refresh_actor_root_state_tensor, T.refresh_dof_state_tensor,
               T.refresh_rigid_body_state_tensor, T.refresh_dof_force_tensor,
               T.refresh_net_contact_force_tensor,
               T.refresh_force_sensor_tensor):
        assert fn(sentinel) is sentinel


def test_viewer_camera_transform_roundtrip():
    from isaacgym_tpu.viewer.render import (
        _Camera, get_viewer_camera_transform, viewer_camera_look_at)
    from isaacgym_tpu.utils import rotations as rot

    cam = _Camera(eye=(3.0, -2.0, 1.5), target=(0.5, 0.0, 0.9),
                  width=640, height=360)
    pos, quat = get_viewer_camera_transform(cam)
    np.testing.assert_allclose(pos, [3.0, -2.0, 1.5])
    # gymapi convention: quat maps camera x-fwd / y-left / z-up into world
    right, up, fwd = cam.R
    m = np.stack([fwd, -right, up], axis=1)
    assert np.linalg.det(m) > 0.99  # right-handed
    # camera +x looks at the target
    look = np.asarray([0.5, 0.0, 0.9]) - pos
    np.testing.assert_allclose(m[:, 0], look / np.linalg.norm(look), atol=1e-6)
    for i, e in enumerate(np.eye(3)):
        v = np.asarray(rot.quat_rotate(jnp.asarray(quat, jnp.float32),
                                       jnp.asarray(e, jnp.float32)))
        np.testing.assert_allclose(v, m[:, i], atol=1e-5)
    # re-aiming keeps size/FOV and lands the new eye
    cam2 = viewer_camera_look_at(cam, eye=(0.0, 4.0, 2.0), target=(0, 0, 1))
    assert (cam2.w, cam2.h) == (cam.w, cam.h)
    np.testing.assert_allclose(cam2.f, cam.f, rtol=1e-6)
    pos2, _ = get_viewer_camera_transform(cam2)
    np.testing.assert_allclose(pos2, [0.0, 4.0, 2.0])
