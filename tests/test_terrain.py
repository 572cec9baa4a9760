"""Terrain tests: trimesh conversion + heightfield contact + heightmap obs
(SURVEY.md §2 N5)."""

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import terrain as T
from isaacgym_tpu.sim.scene import ActorSpec, PlaneParams, SceneSpec, compile_scene
from isaacgym_tpu.sim.simulator import Simulator
from isaacgym_tpu.tasks import pingpong_common as P


def test_trimesh_conversion_shapes():
    hf = np.zeros((4, 5))
    hf[2, 3] = 10.0
    verts, tris = T.convert_heightfield_to_trimesh(hf, horizontal_scale=0.5, vertical_scale=0.1)
    assert verts.shape == (20, 3)
    assert tris.shape == (2 * 3 * 4, 3)
    # the raised cell appears at the right world position and height
    idx = 2 * 5 + 3
    np.testing.assert_allclose(verts[idx], [1.0, 1.5, 1.0], atol=1e-6)
    assert tris.max() < len(verts)


def test_heightfield_bilinear_sampling():
    hf = np.arange(16, dtype=np.float32).reshape(4, 4)  # plane-ish ramp
    field = T.Heightfield(heights=hf, origin=np.asarray([0.0, 0.0], np.float32), scale=1.0)
    # exact interior grid point (edges clip by one cell-thousandth)
    np.testing.assert_allclose(float(field.sample(jnp.asarray([2.0, 2.0]))), hf[2, 2], atol=1e-5)
    # midpoint interpolation
    mid = float(field.sample(jnp.asarray([1.5, 1.5])))
    np.testing.assert_allclose(mid, np.mean([hf[1, 1], hf[1, 2], hf[2, 1], hf[2, 2]]), atol=1e-5)
    # normal of the ramp tilts away from +z
    n = np.asarray(field.normal(jnp.asarray([1.5, 1.5])))
    assert n[2] > 0 and abs(n[0]) > 0.1


def test_ball_bounces_on_heightfield():
    # a flat heightfield at z = 0.5 -> ball dropped from 1.5 bounces at 0.5
    hf = np.full((32, 32), 0.5, np.float32)
    field = T.Heightfield(heights=hf, origin=np.asarray([-8.0, -8.0], np.float32), scale=0.5)
    ball = P.load_tree("small_ball.urdf")
    spec = SceneSpec(
        actors=[ActorSpec("ball", ball, pos=(0, 0, 1.5), fixed_base=False,
                          restitution=1.0, friction=0.2)],
        plane=PlaneParams(restitution=1.0), terrain=field, dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(1)
    zeros = jnp.zeros((1, 0))

    def body(s, _):
        s2 = sim.step(s, zeros, zeros)
        return s2, s2.root[:, 0, 2]

    state, z = jax.lax.scan(body, state, None, length=180)
    z = np.asarray(z[:, 0])
    assert z.min() > 0.5  # never passes through the raised terrain
    # bounced back up meaningfully (e=1 both -> near-elastic)
    assert z[-60:].max() > 1.0


def test_heightmap_observations():
    hf = np.zeros((64, 64), np.float32)
    hf[32:, :] = 1.0  # step in +x half
    field = T.Heightfield(heights=hf, origin=np.asarray([-16.0, -16.0], np.float32), scale=0.5)
    grid = T.make_meshgrid()
    body_states = jnp.zeros((1, 13)).at[0, 3:7].set(jnp.asarray([0, 0, 0, 1.0]))
    body_states = body_states.at[0, 2].set(0.9)
    obs = T.compute_heightmap_observations(body_states, None, grid, field)
    assert obs.shape == (225,)
    # root at origin: points with x<0 sample height 0, obs = 0 - 0.9 + 0.9 = 0
    assert np.isfinite(np.asarray(obs)).all()
    assert np.asarray(obs).min() >= -0.01 and np.asarray(obs).max() <= 1.01


def test_c7_env_with_terrain():
    """A full task env running on heightfield terrain instead of the flat
    plane (the reference's _create_trimesh path, N5 integrated)."""
    import isaacgym_tpu
    from isaacgym_tpu.utils.config import load_task_config
    from isaacgym_tpu.tasks import task_registry

    hf = np.zeros((64, 64), np.float32)
    field = T.Heightfield(heights=hf, origin=np.asarray([-8.0, -8.0], np.float32), scale=0.5)

    cfg = load_task_config("HumanoidPingpongTiltNoEarlyStopG1")
    cfg["env"]["numEnvs"] = 2
    cfg["env"]["episodeLength"] = 12
    env = task_registry()["HumanoidPingpongTiltNoEarlyStopG1"](cfg, seed=0)
    # inject terrain into the compiled scene spec (flat field == plane here)
    env.scene.spec.terrain = field
    env.sim.scene.spec.terrain = field
    state, obs = env.reset()
    for _ in range(6):
        state, obs, rew, done, info = env.step(state, jnp.zeros((2, 7)))
    assert np.isfinite(np.asarray(obs)).all()


def test_terrain_from_config_npy(tmp_path):
    """plane.terrain npy path -> Heightfield in the scene (reference key)."""
    import isaacgym_tpu
    from isaacgym_tpu.utils.config import load_task_config
    from isaacgym_tpu.tasks import task_registry

    npy = tmp_path / "height_map.npy"
    np.save(npy, np.zeros((128, 128), np.float32))
    cfg = load_task_config("HumanoidPingpongTiltNoEarlyStopG1")
    cfg["env"]["numEnvs"] = 2
    cfg["env"]["episodeLength"] = 8
    cfg["env"]["plane"]["terrain"] = str(npy)
    cfg["env"]["plane"]["transform_x"] = -0.5
    cfg["env"]["plane"]["transform_y"] = -0.5
    env = task_registry()["HumanoidPingpongTiltNoEarlyStopG1"](cfg, seed=0)
    assert env.scene.spec.terrain is not None
    state, obs = env.reset()
    state, obs, rew, done, info = env.step(state, jnp.zeros((2, 7)))
    assert np.isfinite(np.asarray(obs)).all()


def test_heightmap_observations_wired_into_task(tmp_path):
    """VERDICT r1 item 6: config-flagged heightmap obs block on C7 — obs
    dims grow by the grid size and the block reflects terrain height deltas."""
    import isaacgym_tpu
    from isaacgym_tpu.utils.config import load_task_config
    from isaacgym_tpu.tasks import task_registry

    # sloped terrain: height rises with the row index
    raw = np.tile(np.linspace(0.0, 0.4, 256, dtype=np.float32)[:, None], (1, 256))
    npy = tmp_path / "slope.npy"
    np.save(npy, raw)

    def build(terrain_path):
        cfg = load_task_config("HumanoidPingpongTiltNoEarlyStopG1")
        cfg["env"]["numEnvs"] = 2
        cfg["env"]["episodeLength"] = 8
        cfg["env"]["heightmap"] = {"enabled": True, "xSplit": 5, "ySplit": 5,
                                   "xRange": 0.6, "yRange": 0.6}
        if terrain_path:
            cfg["env"]["plane"]["terrain"] = str(terrain_path)
            cfg["env"]["plane"]["horizontal_scale"] = 0.05
            cfg["env"]["plane"]["transform_x"] = -3.0
            cfg["env"]["plane"]["transform_y"] = -3.0
        return task_registry()["HumanoidPingpongTiltNoEarlyStopG1"](cfg, seed=0)

    env_flat = build(None)
    env_slope = build(npy)
    assert env_flat.num_obs == 80 + 25
    assert env_slope.num_obs == 80 + 25

    _, obs_flat = env_flat.reset()
    _, obs_slope = env_slope.reset()
    assert obs_flat.shape == (2, 105) and obs_slope.shape == (2, 105)
    # base 80 dims identical at reset; heightmap block differs with terrain
    np.testing.assert_allclose(np.asarray(obs_flat[:, :80]),
                               np.asarray(obs_slope[:, :80]), atol=1e-5)
    hm_flat = np.asarray(obs_flat[:, 80:])
    hm_slope = np.asarray(obs_slope[:, 80:])
    assert np.abs(hm_slope - hm_flat).max() > 0.01
    # the sloped field's heightmap block varies across the grid; flat doesn't
    assert hm_slope.std() > 1e-3
    np.testing.assert_allclose(hm_flat.std(), 0.0, atol=1e-6)
    # stepping keeps everything finite
    state, obs = env_slope.reset()
    state, obs, rew, done, info = env_slope.step(state, jnp.zeros((2, 7)))
    assert np.isfinite(np.asarray(obs)).all()
