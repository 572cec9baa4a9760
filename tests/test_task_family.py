"""Parity tests across the task family (C5, C6, C8) — obs dims, reward
events, early-stop semantics (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

import isaacgym_tpu


def _roll(env, steps, actions=None):
    state, obs = env.reset()
    B = env.num_envs
    a = actions if actions is not None else jnp.zeros((B, env.num_actions))
    hist = {"rew": [], "done": [], "ball": [], "obs0": np.asarray(obs)}
    for _ in range(steps):
        state, obs, rew, done, info = env.step(state, a)
        hist["rew"].append(np.asarray(rew))
        hist["done"].append(np.asarray(done))
        hist["ball"].append(np.asarray(state.sim.root[:, env.ball_actor, :]))
    return state, hist


def test_c5_dims_and_launch():
    env = isaacgym_tpu.make(seed=1, task="HumanoidPingpongG1", num_envs=4)
    assert env.num_obs == 80 and env.num_actions == 7
    assert env.max_episode_length == 64
    state, obs = env.reset()
    ball = np.asarray(state.sim.root[:, 2, :])
    # planar launch: vz = 0, vx in -(7.5..6.5)cos(5deg)
    np.testing.assert_allclose(ball[:, 9], 0.0, atol=1e-6)
    assert np.all(ball[:, 7] < -6.4) and np.all(ball[:, 7] > -7.6)
    # humanoid yawed -30 deg
    hq = np.asarray(state.sim.root[0, 0, 3:7])
    np.testing.assert_allclose(hq[2], -np.sin(np.radians(15)), atol=1e-4)


def test_c5_early_reset_on_miss():
    env = isaacgym_tpu.make(seed=2, task="HumanoidPingpongG1", num_envs=4)
    state, hist = _roll(env, 63)
    done = np.stack(hist["done"])
    # with zero actions the ball passes the paddle -> early reset well before
    # the 64-step timeout in at least one env
    assert done.any()
    first_done = done.any(axis=1).argmax()
    assert first_done < 60


def test_c6_dims_flags_and_events():
    env = isaacgym_tpu.make(seed=3, task="HumanoidPingpongTiltG1", num_envs=4)
    assert env.num_obs == 80 and env.num_actions == 7
    assert env.max_episode_length == 140
    state, obs = env.reset()
    assert set(state.flags) == {"condition_calculated", "reward_calculated",
                                "no_bounce_before_half_mask",
                                "hit_table_good", "crossed_net"}
    ball = np.asarray(state.sim.root[:, 2, :])
    # 3-D launch at 8.0-8.6 m/s
    speed = np.linalg.norm(ball[:, 7:10], axis=1)
    assert np.all(speed > 7.9) and np.all(speed < 8.7)
    assert np.all(ball[:, 9] > 0)


def test_c6_super_elastic_table_event():
    env = isaacgym_tpu.make(seed=4, task="HumanoidPingpongTiltG1", num_envs=8)
    state, hist = _roll(env, 100)
    ball = np.stack(hist["ball"])  # (T,B,13)
    # ball must bounce on the table: z-velocity flips negative->positive
    vz = ball[..., 9]
    flipped = ((vz[:-1] < 0) & (vz[1:] > 0)).any(axis=0)
    assert flipped.any()


def test_c8_two_humanoids():
    env = isaacgym_tpu.make(seed=5, task="Humanoid12PingpongTiltG1", num_envs=2)
    assert env.num_actions == 14
    assert env.num_obs == 94
    assert env.scene.num_dofs == 14
    assert env.scene.num_bodies == 82
    assert env.scene.num_actors == 4
    state, obs = env.reset()
    assert obs.shape == (2, 94)
    # humanoid2 faces the other way at x=3.5
    h2 = np.asarray(state.sim.root[0, 1, :])
    np.testing.assert_allclose(h2[0], 3.5, atol=1e-5)
    np.testing.assert_allclose(abs(h2[5]), 1.0, atol=1e-4)  # yaw 180: quat z=±1
    # steps run and stay finite
    actions = jnp.zeros((2, 14))
    for _ in range(5):
        state, obs, rew, done, info = env.step(state, actions)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_registry_complete():
    from isaacgym_tpu.tasks import task_registry
    reg = task_registry()
    for name in ["HumanoidPingpongG1", "HumanoidPingpongTiltG1",
                 "HumanoidPingpongTiltNoEarlyStopG1", "Humanoid12PingpongTiltG1"]:
        assert name in reg, name


def test_c10_27dof_floating_base():
    env = isaacgym_tpu.make(seed=6, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=2, episodeLength=24)
    assert env.num_obs == 313 and env.num_actions == 27
    assert env.scene.num_dofs == 27
    assert env.scene.articulations[0].model.floating
    state, obs = env.reset()
    assert obs.shape == (2, 313)
    # neutral-pose actions keep the humanoid standing (feet-ground contact)
    a0 = -np.asarray(env._pd_action_offset) / np.asarray(env._pd_action_scale)
    actions = jnp.tile(jnp.asarray(a0, dtype=jnp.float32), (2, 1))
    for _ in range(20):
        state, obs, rew, done, info = env.step(state, actions)
    pelvis_z = float(state.sim.root[0, 0, 2])
    assert 0.7 < pelvis_z < 1.0, pelvis_z
    assert np.isfinite(np.asarray(obs)).all()
    assert not np.asarray(state.flags["fall_down_count"]).any()
    # diagnostic *_count flags surface as per-episode event outcomes
    # (reference event counters, ...all_dof.py:283-292,918-931)
    assert set(info["episode_events"]) == {
        "hit_paddle", "closer_to_paddle", "hit_table", "fall_down",
        "cross_net"}
    assert all(v.shape == (2,) for v in info["episode_events"].values())
    # ball start y/z randomized per env within the C10 ranges
    ball0 = np.asarray(env.reset()[0].sim.root[:, 2, :])
    assert np.all(ball0[:, 1] > -0.55) and np.all(ball0[:, 1] < 0.15)
    assert np.all(ball0[:, 2] > 0.95) and np.all(ball0[:, 2] < 1.06)


def test_c10_gradient_table_reward_scripted():
    """C10 parity: ball crossing z in [0.82,0.83] with vx>0 inside the square
    x in [1.9,3.1], |y|<0.6 gets +hitTableReward once; outside the square a
    distance-proportional penalty (reference compute_gradient_penalty,
    .../all_dof.py:1246-1301)."""
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=2, episodeLength=50)
    state, obs = env.reset()

    def rewards_at(ball_pos, ball_vel, flags):
        sim1 = state.sim._replace(root=state.sim.root
                                  .at[:, 2, 0:3].set(jnp.asarray(ball_pos))
                                  .at[:, 2, 7:10].set(jnp.asarray(ball_vel)))
        pre = sim1.root[:, 2, :]
        rb1 = env._rb_fn(sim1)
        return jax.vmap(env.reward_single)(pre, sim1, rb1, flags, state.progress + 1)

    # inside the square at the crossing height
    r_in, _, f_in = rewards_at([2.5, 0.0, 0.825], [2.0, 0.0, -1.0], state.flags)
    # outside (y beyond the table): penalty proportional to distance
    r_out, _, _ = rewards_at([2.5, 1.5, 0.825], [2.0, 0.0, -1.0], state.flags)
    assert float(r_in[0]) - float(r_out[0]) > 2000.0  # 3000 reward vs -100*d
    assert bool(f_in["hit_table_calculated"][0])
    # one-shot: second crossing with the flag set gives no table term
    r_again, _, _ = rewards_at([2.5, 0.0, 0.825], [2.0, 0.0, -1.0], f_in)
    assert float(r_in[0]) - float(r_again[0]) > 2000.0


# ---------------------------------------------------------------------------
# C9 alignment variant — scripted reward-event parity
# (/root/reference/tasks/humanoid_pingpong_alignment.py:1098-1230)
# ---------------------------------------------------------------------------

def _c9_parts():
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongAlignmentG1",
                            num_envs=2, episodeLength=30)
    state, obs = env.reset()
    sim1 = jax.tree.map(lambda x: x[0], state.sim)
    bs_fn = env.sim.make_body_state_fn(env.rb_body_ids())
    rb1 = bs_fn(state.sim)[0]
    return env, sim1, rb1


def _c9_reward(env, sim1, rb1, ball_pos, ball_vel, pre_vel, flags=None,
               progress=0):
    ball = sim1.root[env.ball_actor]
    ball = ball.at[0:3].set(jnp.asarray(ball_pos)).at[7:10].set(jnp.asarray(ball_vel))
    sim1 = sim1._replace(root=sim1.root.at[env.ball_actor].set(ball))
    pre = ball.at[7:10].set(jnp.asarray(pre_vel))
    flags = flags or {"reward_calculated": jnp.asarray(False)}
    return env.reward_single(pre, sim1, rb1, flags, jnp.asarray(progress))


def test_c9_velocity_flip_bonus_is_not_one_shot():
    env, sim1, rb1 = _c9_parts()
    pos = [1.0, 0.0, 1.0]
    r1, _, f1 = _c9_reward(env, sim1, rb1, pos, [2.0, 0, 0], [-1.0, 0, 0])
    r_no, _, _ = _c9_reward(env, sim1, rb1, pos, [2.0, 0, 0], [1.0, 0, 0])
    bonus = float(r1) - float(r_no)
    np.testing.assert_allclose(bonus, env.alpha * 2.0, rtol=1e-5)
    # same flip with the SAME flags again -> bonus again (dense, not gated)
    r2, _, _ = _c9_reward(env, sim1, rb1, pos, [2.0, 0, 0], [-1.0, 0, 0],
                          flags=f1)
    np.testing.assert_allclose(float(r2) - float(r_no), bonus, rtol=1e-5)


def test_c9_overshoot_penalty_fires_once():
    env, sim1, rb1 = _c9_parts()
    pos = [3.2, 0.0, 1.0]
    r1, _, f1 = _c9_reward(env, sim1, rb1, pos, [1.0, 0, 0], [1.0, 0, 0])
    r_ref, _, _ = _c9_reward(env, sim1, rb1, pos, [-1.0, 0, 0], [-1.0, 0, 0])
    # overshoot (x>=3.1 while moving +x) costs nothitTablePenalty exactly once
    np.testing.assert_allclose(float(r1) - float(r_ref),
                               env.not_hit_table_penalty, rtol=1e-5)
    assert bool(f1["reward_calculated"])
    r2, _, _ = _c9_reward(env, sim1, rb1, pos, [1.0, 0, 0], [1.0, 0, 0], flags=f1)
    np.testing.assert_allclose(float(r2), float(r_ref), rtol=1e-5)


def test_c9_bounce_reward_conjunction_never_fires():
    """Faithful to the reference (:1167-1171): the same-step conjunction of
    x<2.2 and 2.2<x<3.1 is unsatisfiable, so the hit-table reward is dead."""
    env, sim1, rb1 = _c9_parts()
    pos = [2.6, 0.0, 0.9]  # over the opponent half
    r_bounce, _, fb = _c9_reward(env, sim1, rb1, pos, [1.0, 0, 0.5],
                                 [1.0, 0, -0.5])  # z-velocity flip = bounce
    r_plain, _, _ = _c9_reward(env, sim1, rb1, pos, [1.0, 0, 0.5],
                               [1.0, 0, 0.5])
    np.testing.assert_allclose(float(r_bounce), float(r_plain), rtol=1e-6)
    assert not bool(fb["reward_calculated"])


def test_c9_miss_penalty_every_step_and_drop_resets():
    env, sim1, rb1 = _c9_parts()
    hum_x = float(sim1.root[0, 0])
    pos = [hum_x - 0.3, 0.0, 1.0]
    r1, _, f1 = _c9_reward(env, sim1, rb1, pos, [-1.0, 0, 0], [-1.0, 0, 0])
    r2, _, _ = _c9_reward(env, sim1, rb1, pos, [-1.0, 0, 0], [-1.0, 0, 0],
                          flags=f1)
    np.testing.assert_allclose(float(r1), float(r2), rtol=1e-6)  # per-step
    # behind the robot the miss penalty is included
    r_front, _, _ = _c9_reward(env, sim1, rb1, [1.0, 0.0, 1.0],
                               [-1.0, 0, 0], [-1.0, 0, 0])
    assert float(r1) < float(r_front)
    # early stop when the ball drops below z=0.1
    _, reset, _ = _c9_reward(env, sim1, rb1, [1.0, 0.0, 0.05],
                             [-1.0, 0, 0], [-1.0, 0, 0])
    assert bool(reset)


# ---------------------------------------------------------------------------
# C11 draft 5-actor — effort drive + symmetric two-ball reward
# (/root/reference/tasks/humanoid_pingpong.py:581-585,622-667)
# ---------------------------------------------------------------------------

def test_c11_effort_drive_scales_with_motor_efforts_and_power_scale():
    env1 = isaacgym_tpu.make(seed=0, task="HumanoidPingpong5ActorG1",
                             num_envs=2, episodeLength=20)
    env2 = isaacgym_tpu.make(seed=0, task="HumanoidPingpong5ActorG1",
                             num_envs=2, episodeLength=20, powerScale=0.5)
    a = jnp.full((2, 52), 0.01)
    t1, e1 = env1.action_to_drive(a)
    t2, e2 = env2.action_to_drive(a)
    efforts = np.concatenate([env1.scene.articulations[0].model.tree.effort] * 2)
    np.testing.assert_allclose(np.asarray(e1),
                               np.broadcast_to(0.01 * efforts, (2, 52)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), 0.5 * np.asarray(e1), rtol=1e-5)
    # the applied torque lands in dof_force (clipped at the effort limits)
    state, obs = env1.reset()
    state, *_ = env1.step(state, a)
    np.testing.assert_allclose(
        np.asarray(state.sim.dof_force),
        np.broadcast_to(np.clip(0.01 * efforts, -efforts, efforts), (2, 52)),
        atol=1e-4)


def test_c11_reward_symmetric_across_robots():
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpong5ActorG1",
                            num_envs=2, episodeLength=20)
    state, obs = env.reset()
    sim1 = jax.tree.map(lambda x: x[0], state.sim)
    bs_fn = env.sim.make_body_state_fn(env.rb_body_ids())
    rb1 = bs_fn(state.sim)[0]
    p1, p2 = np.asarray(rb1[0, 0:3]), np.asarray(rb1[1, 0:3])
    offs = np.asarray([0.3, 0.1, 0.2])
    # equidistant from both paddles so its residual 1/(1+d^2) term cancels
    far = (p1 + p2) / 2 + np.asarray([0.0, 0.0, 50.0])

    def rew(b1_pos, b2_pos):
        root = sim1.root.at[env.BALL1, 0:3].set(jnp.asarray(b1_pos))
        root = root.at[env.BALL2, 0:3].set(jnp.asarray(b2_pos))
        s = sim1._replace(root=root)
        r, _, _ = env.reward_single(s.root[env.ball_actor], s, rb1, {},
                                    jnp.asarray(0))
        return float(r)

    # ball2 near paddle1 vs the mirrored ball1 near paddle2: same reward
    r_a = rew(far, p1 + offs)
    r_b = rew(p2 + offs, far)
    np.testing.assert_allclose(r_a, r_b, rtol=1e-5)
    # closer ball -> larger reward for either robot
    assert rew(far, p1 + 0.5 * offs) > r_a
    assert rew(p2 + 0.5 * offs, far) > r_b


def test_stability_clamps_threaded_from_config():
    """The three PhysX stability clamps reach the compiled scene: DOF
    velocity limit from the URDF (maxJointVelocity = 32 rad/s on every G1
    joint), AssetOptions.max_angular_velocity = 100.0 on the humanoid
    (reference …tilt_no_earlystop.py:417), and
    sim.physx.max_depenetration_velocity = 10.0 from the task yaml."""
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=2)
    scene = env.sim.scene
    slot = scene.articulations[0]
    assert slot.max_angular_velocity == 100.0
    assert slot.max_linear_velocity == 1000.0
    np.testing.assert_allclose(slot.model.tree.max_velocity, 32.0)
    assert scene.spec.max_depenetration_velocity == 10.0
    assert env.sim.max_depenetration == 10.0


# ---------------------------------------------------------------------------
# C8 two-player mode — the reference's dead humanoid2 reward
# (/root/reference/tasks/humanoid_pingpong_4_actor_tilt.py:1281-1440) wired
# through the table-center mirror, both obs perspectives concatenated
# ---------------------------------------------------------------------------

def _c8tp_parts():
    env = isaacgym_tpu.make(seed=7, task="Humanoid12PingpongTiltG1",
                            num_envs=2, twoPlayer=True, episodeLength=30)
    state, obs = env.reset()
    sim1 = jax.tree.map(lambda x: x[0], state.sim)
    rb1 = env._rb_fn(state.sim)[0]
    return env, state, obs, sim1, rb1


def _c8tp_reward(env, sim1, rb1, ball_pos, ball_vel, pre_vel, flags=None,
                 progress=1):
    ball = sim1.root[env.ball_actor]
    ball = ball.at[0:3].set(jnp.asarray(ball_pos)).at[7:10].set(jnp.asarray(ball_vel))
    sim1 = sim1._replace(root=sim1.root.at[env.ball_actor].set(ball))
    pre = ball.at[7:10].set(jnp.asarray(pre_vel))
    flags = flags if flags is not None else env.init_flags()
    return env.reward_single(pre, sim1, rb1, flags, jnp.asarray(progress))


def test_c8_two_player_obs_layout():
    env, state, obs, sim1, rb1 = _c8tp_parts()
    assert env.num_obs == 188 and obs.shape == (2, 188)
    o = np.asarray(obs[0])
    # each 94-dim perspective starts with the humanoid's own root body in its
    # own heading-local frame -> local position 0
    np.testing.assert_allclose(o[0:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(o[94:97], 0.0, atol=1e-5)
    # both perspectives carry the same full 14-dof state block
    np.testing.assert_allclose(o[60:88], o[154:182], atol=1e-6)
    # ball local position differs between the two frames (different roots)
    assert np.abs(o[88:91] - o[182:185]).max() > 0.5


def test_c8_two_player_mirrored_hit_table_one_shot():
    env, state, obs, sim1, rb1 = _c8tp_parts()
    f0 = env.init_flags()
    # humanoid2's table window is the mirror of humanoid1's (0.4 < x < 1.06,
    # bounce with vx < 0); first bounce there earns hitTableReward once
    r1, _, f1 = _c8tp_reward(env, sim1, rb1, [0.9, 0.0, 0.8], [-2.0, 0, 1.0],
                             [-2.0, 0, -1.0], flags=f0)
    assert bool(f1["reward_calculated2"]) and not bool(f1["reward_calculated"])
    r2, _, _ = _c8tp_reward(env, sim1, rb1, [0.9, 0.0, 0.8], [-2.0, 0, 1.0],
                            [-2.0, 0, -1.0], flags=f1)
    np.testing.assert_allclose(float(r1) - float(r2), env.hit_table_reward,
                               rtol=1e-5)
    # the mirrored position/velocity triggers humanoid1's window instead,
    # with the same one-shot delta (window parity through the mirror)
    m1, _, g1 = _c8tp_reward(env, sim1, rb1, [2.6, 0.0, 0.8], [2.0, 0, 1.0],
                             [2.0, 0, -1.0], flags=f0)
    assert bool(g1["reward_calculated"]) and not bool(g1["reward_calculated2"])
    m2, _, _ = _c8tp_reward(env, sim1, rb1, [2.6, 0.0, 0.8], [2.0, 0, 1.0],
                            [2.0, 0, -1.0], flags=g1)
    np.testing.assert_allclose(float(m1) - float(m2), env.hit_table_reward,
                               rtol=1e-5)


def test_c8_two_player_velocity_flip_and_miss():
    env, state, obs, sim1, rb1 = _c8tp_parts()
    f0 = env.init_flags()
    pos = [2.5, 0.0, 1.0]
    # humanoid2's flip: ball vx goes + -> - (toward humanoid1)
    r1, _, f1 = _c8tp_reward(env, sim1, rb1, pos, [-3.0, 0, 0], [3.0, 0, 0],
                             flags=f0)
    r_no, _, _ = _c8tp_reward(env, sim1, rb1, pos, [-3.0, 0, 0], [-3.0, 0, 0],
                              flags=f0)
    np.testing.assert_allclose(float(r1) - float(r_no), env.alpha * 3.0,
                               rtol=1e-5)
    assert bool(f1["condition_calculated2"])
    # one-shot: with the flag latched the bonus is gone
    r2, _, _ = _c8tp_reward(env, sim1, rb1, pos, [-3.0, 0, 0], [3.0, 0, 0],
                            flags=f1)
    np.testing.assert_allclose(float(r2), float(r_no), rtol=1e-5)
    # miss for humanoid2: ball past x = 3.5 + 0.05 (reference :1344-1349)
    r_miss, _, _ = _c8tp_reward(env, sim1, rb1, [3.8, 0.0, 1.0],
                                [1.0, 0, 0], [1.0, 0, 0], flags=f0)
    r_front, _, _ = _c8tp_reward(env, sim1, rb1, [3.3, 0.0, 1.0],
                                 [1.0, 0, 0], [1.0, 0, 0], flags=f0)
    assert float(r_front) - float(r_miss) > -env.penalty * 0.5


def test_c8_two_player_step_and_events():
    env, state, obs, sim1, rb1 = _c8tp_parts()
    actions = jnp.zeros((2, 14))
    for _ in range(3):
        state, obs, rew, done, info = env.step(state, actions)
    assert np.isfinite(np.asarray(obs)).all()
    assert {"hit_paddle", "hit_opponent_table", "hit_paddle2",
            "hit_opponent_table2"} <= set(info["episode_events"])


def test_c6_landing_shaping_default_off_and_one_shot():
    """Curriculum landing shaping (landingShapingWeight): default 0 leaves
    the reference reward untouched; when enabled it fires exactly once, on
    the one-shot landing latch, with a gaussian on the ballistic predicted
    landing point."""
    import math
    env = isaacgym_tpu.make(seed=6, task="HumanoidPingpongTiltG1", num_envs=2)
    task = env
    f = jnp.asarray(False)

    def core(weight, ball_pos, ball_vel, rew_calc):
        task.landing_shaping_weight = weight
        c = dict(paddle_pos=jnp.asarray([0.3, 0.0, 1.0]),
                 ball_pos=jnp.asarray(ball_pos),
                 ball_vel=jnp.asarray(ball_vel),
                 ball_vx=jnp.asarray(ball_vel[0]),
                 pre_vx=jnp.asarray(1.0),  # no velocity-flip bonus
                 humanoid_x=jnp.asarray(0.0),
                 power_reward=jnp.asarray(0.0))
        r, cc, rc, nb, ev = task._tilt_reward_core(
            c, f, jnp.asarray(rew_calc), jnp.asarray(True))
        return float(r), bool(rc)

    # overshoot crossing (x>=3.1 moving +x, above table plane)
    pos, vel = [3.2, 0.1, 1.0], [4.0, 0.0, -1.0]
    r_off, rc_off = core(0.0, pos, vel, False)
    r_on, rc_on = core(500.0, pos, vel, False)
    assert rc_off and rc_on
    # predicted ballistic landing at z=0.83
    g = 9.81
    t = (vel[2] + math.sqrt(vel[2] ** 2 + 2 * g * (pos[2] - 0.83))) / g
    xl, yl = pos[0] + vel[0] * t, pos[1] + vel[1] * t
    expected = 500.0 * math.exp(-((xl - 2.77) ** 2 + yl ** 2))
    np.testing.assert_allclose(r_on - r_off, expected, rtol=1e-5)

    # one-shot: latch already set -> no shaping even with weight on
    r_latched, _ = core(500.0, pos, vel, True)
    r_latched_off, _ = core(0.0, pos, vel, True)
    np.testing.assert_allclose(r_latched, r_latched_off, rtol=1e-6)
    task.landing_shaping_weight = 0.0
