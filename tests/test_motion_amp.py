"""Motion library + AMP plumbing tests (N12/N13)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgym_tpu.rl import motion_lib as M
from isaacgym_tpu.rl import amp as A
from isaacgym_tpu.rl.ppo import PPOConfig


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("motions")
    T, D = 60, 7
    t = np.linspace(0, 2 * np.pi, T)
    for i, freq in enumerate([1.0, 2.0]):
        dof_pos = 0.3 * np.sin(freq * t)[:, None] * np.ones((1, D))
        dof_vel = 0.3 * freq * np.cos(freq * t)[:, None] * np.ones((1, D))
        root_rot = np.tile([0, 0, 0, 1.0], (T, 1))
        M.save_motion_clip(os.path.join(d, f"clip{i}.npz"), fps=30.0,
                           root_pos=np.zeros((T, 3)), root_rot=root_rot,
                           dof_pos=dof_pos, dof_vel=dof_vel)
    return str(d)


def test_motion_lib_loads_and_interpolates(clip_dir):
    lib = M.MotionLib(clip_dir, num_dofs=7)
    assert lib.num_motions == 2
    np.testing.assert_allclose(np.asarray(lib.motion_lengths), (60 - 1) / 30.0, rtol=1e-5)
    ids = jnp.asarray([0, 1, 0])
    times = jnp.asarray([0.0, 0.5, 1.9])
    state = lib.get_motion_state(ids, times)
    assert state["dof_pos"].shape == (3, 7)
    assert state["root_rot"].shape == (3, 4)
    # t=0 matches the first frame exactly
    np.testing.assert_allclose(np.asarray(state["dof_pos"][0]), 0.0, atol=1e-5)
    # interpolation between frames is within clip amplitude
    assert np.abs(np.asarray(state["dof_pos"])).max() <= 0.3 + 1e-5


def test_motion_lib_sampling(clip_dir):
    lib = M.MotionLib(clip_dir, num_dofs=7)
    key = jax.random.PRNGKey(0)
    ids = lib.sample_motions(key, 64)
    assert set(np.unique(np.asarray(ids))) <= {0, 1}
    times = lib.sample_time(jax.random.PRNGKey(1), ids)
    assert np.asarray(times).min() >= 0
    assert np.asarray(times).max() <= float(lib.motion_lengths.max())


def test_skeleton_tree_from_urdf():
    from isaacgym_tpu.tasks.pingpong_common import ASSET_DIR
    sk = M.SkeletonTree.from_mjcf(os.path.join(
        ASSET_DIR, "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf"))
    assert sk.num_nodes == 40
    assert sk.node_names[0] == "pelvis"
    assert sk.parent_indices[0] == -1


def test_amp_discriminator_learns_to_separate():
    dim = 14
    rng = np.random.RandomState(0)
    demo = jnp.asarray(rng.randn(256, dim).astype(np.float32) + 2.0)
    agent = jnp.asarray(rng.randn(256, dim).astype(np.float32) - 2.0)

    disc = A.AMPDiscriminator(units=(32, 32))
    params = disc.init(jax.random.PRNGKey(0), demo[:1])
    import optax
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    apply_fn = lambda p, x: disc.apply(p, x)

    @jax.jit
    def step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: A.disc_loss(apply_fn, p, agent, demo), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, aux

    for _ in range(200):
        params, opt_state, aux = step(params, opt_state)
    assert float(aux["disc_demo_logit"]) > 0.5
    assert float(aux["disc_agent_logit"]) < -0.5
    # style reward is higher for demo-like transitions
    r_demo = A.style_reward(apply_fn, params, demo).mean()
    r_agent = A.style_reward(apply_fn, params, agent).mean()
    assert float(r_demo) > float(r_agent)
