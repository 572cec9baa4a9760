"""Raycast camera sensor (sensors/camera.py) — closed-form depth, per-actor
segmentation, env wiring behind the reference's ``enableCameraSensors`` key."""

import os

import numpy as np
import jax.numpy as jnp

import isaacgym_tpu
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.models.assets import generate
from isaacgym_tpu.sensors import Camera
from isaacgym_tpu.sim.scene import ActorSpec, PlaneParams, SceneSpec, compile_scene
from isaacgym_tpu.sim.simulator import Simulator
from isaacgym_tpu.sim import tensor_api as T


def _ball_scene(z=1.0):
    tree = K.load_asset(os.path.join(generate.ASSET_DIR, "small_ball.urdf"))
    return compile_scene(SceneSpec(
        actors=[ActorSpec("ball", tree, pos=(0.0, 0.0, z), fixed_base=False,
                          restitution=1.5, friction=0.2)],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    ))


def test_camera_depth_closed_form_and_seg():
    scene = _ball_scene(z=1.0)
    sim = Simulator(scene)
    state = sim.initial_state(2)
    # camera 2 m in front of the ball, looking straight at it
    cam = Camera(scene, pos=(2.0, 0.0, 1.0), target=(0.0, 0.0, 1.0),
                 width=33, height=33, fov_deg=60)
    out = cam.render(sim, state)
    d = np.asarray(out["depth"][0])
    seg = np.asarray(out["seg"][0])
    # center pixel: first sphere surface at distance 2 - r = 1.98
    np.testing.assert_allclose(d[16, 16], 2.0 - 0.02, atol=1e-3)
    assert seg[16, 16] == 0          # the ball actor
    # top corners: sky
    assert seg[0, 0] == -1 and not np.isfinite(d[0, 0])
    # bottom rows: ground plane, farther than the ball
    assert seg[-1, 16] == -2 and d[-1, 16] > 1.0
    # batched: both envs identical at reset
    np.testing.assert_allclose(np.asarray(out["depth"][1]), d)


def test_camera_tracks_moving_ball():
    scene = _ball_scene(z=1.0)
    sim = Simulator(scene)
    state = sim.initial_state(1)
    cam = Camera(scene, pos=(2.0, 0.0, 1.0), target=(0.0, 0.0, 1.0),
                 width=17, height=17, fov_deg=60)
    d0 = float(cam.render(sim, state)["depth"][0, 8, 8])
    # move the ball 0.5 m toward the camera
    state = state._replace(root=state.root.at[:, 0, 0].set(0.5))
    d1 = float(cam.render(sim, state)["depth"][0, 8, 8])
    np.testing.assert_allclose(d0 - d1, 0.5, atol=1e-3)


def test_env_camera_sensor_wiring():
    """enableCameraSensors + cameras config -> env.render_camera over the
    full pingpong scene; tensor-api acquire_camera_image_tensor surface."""
    env = isaacgym_tpu.make(
        seed=0, task="HumanoidPingpongTiltG1", num_envs=2,
        enableCameraSensors=True,
        cameras=[dict(pos=(4.2, -2.6, 2.2), target=(1.4, 0.0, 0.9),
                      width=48, height=36)])
    assert len(env.cameras) == 1
    state, obs = env.reset()
    out = env.render_camera(state)
    assert out["depth"].shape == (2, 36, 48)
    assert out["rgb"].shape == (2, 36, 48, 3)
    seg = np.asarray(out["seg"][0])
    # humanoid (0), table (1) and ground (-2) all visible from this pose
    assert {0, 1, -2} <= set(seg.flatten().tolist())
    rgb = T.acquire_camera_image_tensor(env.cameras[0], env.sim, state.sim, "rgb")
    assert rgb.shape == (2, 36, 48, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    # default stays off (reference yamls: enableCameraSensors: false)
    env_off = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltG1", num_envs=2)
    assert env_off.cameras == []
