"""Simulator integration tests: ballistic flight, restitution, PD drives,
and the full pingpong scene (SURVEY.md §4: contact restitution vs closed
forms; ball-on-table bounce)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.models.assets import generate
from isaacgym_tpu.sim.scene import (
    ActorSpec, PlaneParams, SceneSpec, compile_scene, DRIVE_POS,
)
from isaacgym_tpu.sim.simulator import Simulator

ASSET_DIR = generate.ASSET_DIR


def _ball_tree():
    return K.load_asset(os.path.join(ASSET_DIR, "small_ball.urdf"))


def _table_tree():
    return K.load_asset(os.path.join(ASSET_DIR, "pingpong_table.urdf"))


def _g1_tree():
    return K.load_asset(os.path.join(ASSET_DIR, "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf"))


@pytest.fixture(scope="module", autouse=True)
def _ensure_assets():
    if not os.path.exists(os.path.join(ASSET_DIR, "small_ball.urdf")):
        generate.generate_all()


def _run(sim, state, targets, efforts, steps):
    B = state.root.shape[0]

    def body(s, _):
        return sim.step(s, targets, efforts), None

    state, _ = jax.lax.scan(body, state, None, length=steps)
    return state


def test_ballistic_flight_matches_closed_form():
    spec = SceneSpec(
        actors=[ActorSpec("ball", _ball_tree(), pos=(0, 0, 5.0), fixed_base=False,
                          restitution=1.5, friction=0.2)],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    B = 4
    state = sim.initial_state(B)
    zeros = jnp.zeros((B, 0))
    t = 0.5
    steps = int(t / spec.dt)
    state = _run(sim, state, zeros, zeros, steps)
    z = float(state.root[0, 0, 2])
    # z = z0 - g t^2 / 2 (symplectic Euler bias ~ g*dt*t/2, tolerate)
    expected = 5.0 - 0.5 * 9.81 * t * t
    np.testing.assert_allclose(z, expected, atol=0.03)
    vz = float(state.root[0, 0, 9])
    np.testing.assert_allclose(vz, -9.81 * t, atol=0.01)


def test_ground_bounce_restitution():
    # ball e=1.5, plane e=0 -> combined (average) 0.75
    spec = SceneSpec(
        actors=[ActorSpec("ball", _ball_tree(), pos=(0, 0, 1.0), fixed_base=False,
                          restitution=1.5, friction=0.2)],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(2)
    zeros = jnp.zeros((2, 0))

    def body(s, _):
        s2 = sim.step(s, zeros, zeros)
        return s2, s2.root[:, 0, 9]  # vz trace

    state, vz = jax.lax.scan(body, state, None, length=120)
    vz = np.asarray(vz[:, 0])
    # find the bounce: vz flips negative -> positive
    idx = int(np.argmax((vz[:-1] < 0) & (vz[1:] > 0)))
    v_in, v_out = vz[idx], vz[idx + 1]
    assert v_in < -3.0
    np.testing.assert_allclose(v_out / -v_in, 0.75, atol=0.02)


def test_table_bounce_super_elastic():
    # ball at rest above the table: e_comb = avg(1.5, 1.5) = 1.5 -> ball
    # bounces back HIGHER (super-elastic, the tilt-family config:
    # reference .../humanoid_pingpong_3_actor_tilt_no_earlystop.py:586,634)
    spec = SceneSpec(
        actors=[
            ActorSpec("table", _table_tree(), pos=(0.0, 0, 0), fixed_base=True,
                      restitution=1.5, friction=0.2),
            ActorSpec("ball", _ball_tree(), pos=(0.5, 0, 1.2), fixed_base=False,
                      restitution=1.5, friction=0.2),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(1)
    zeros = jnp.zeros((1, 0))

    def body(s, _):
        s2 = sim.step(s, zeros, zeros)
        return s2, (s2.root[:, 1, 2], s2.root[:, 1, 9])

    state, (z, vz) = jax.lax.scan(body, state, None, length=240)
    z = np.asarray(z[:, 0]); vz = np.asarray(vz[:, 0])
    idx = int(np.argmax((vz[:-1] < 0) & (vz[1:] > 0)))
    v_in, v_out = vz[idx], vz[idx + 1]
    assert v_in < -2.0
    # the step-granularity trace undersamples v_in by up to one substep of
    # gravity (speculative contacts fire a substep before crossing), which
    # inflates the measured ratio by ~1.5*g*dt_s/|v_in| ~= 0.03
    np.testing.assert_allclose(v_out / -v_in, 1.5, atol=0.06)
    # ball must reach above its drop height afterwards
    assert z.max() > 1.25


def test_pd_drive_reaches_target():
    xml = """
    <robot name="arm1">
      <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
      <link name="arm">
        <inertial><origin xyz="0 0 -0.3"/><mass value="1.0"/>
          <inertia ixx="0.01" iyy="0.01" izz="0.001"/></inertial>
      </link>
      <joint name="j" type="revolute">
        <origin xyz="0 0 0"/><parent link="base"/><child link="arm"/>
        <axis xyz="0 1 0"/><limit lower="-3" upper="3" effort="50" velocity="20"/>
        <dynamics armature="0.01"/>
      </joint>
    </robot>
    """
    tree = K.compile_tree(U.parse_urdf(xml, from_string=True))
    spec = SceneSpec(
        actors=[ActorSpec("arm", tree, pos=(0, 0, 1.0), fixed_base=True,
                          drive_mode=DRIVE_POS,
                          stiffness=np.asarray([40.0]), damping=np.asarray([4.0]))],
        plane=None, dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    B = 3
    state = sim.initial_state(B)
    target = jnp.full((B, 1), 0.8)
    eff = jnp.zeros((B, 1))
    state = _run(sim, state, target, eff, 600)  # 5 s to settle under gravity
    q = np.asarray(state.dof_pos[:, 0])
    # gravity droop: kp*(tgt-q) = m g l sin(q) -> small offset from target
    assert np.all(np.abs(q - 0.8) < 0.1), q
    assert np.all(np.abs(np.asarray(state.dof_vel)) < 0.05)


def _pingpong_scene(tilt=True):
    kp = np.asarray([20.0, 20, 20, 20, 20, 5, 5], np.float32)
    return SceneSpec(
        actors=[
            ActorSpec("humanoid1", _g1_tree(), pos=(0, 0, 1.0), fixed_base=True,
                      restitution=0.6, friction=0.5,
                      stiffness=kp, damping=kp / 40.0),
            ActorSpec("pingpong_table", _table_tree(), pos=(1.75, 0, 0), fixed_base=True,
                      restitution=1.5, friction=0.2),
            # angular_damping pinned to 0 so the spin closed forms below are
            # exact (task scenes keep the AssetOptions default 0.5)
            ActorSpec("pingpong_ball_2", _ball_tree(), pos=(2.9, -0.28, 1.02), fixed_base=False,
                      restitution=1.5, friction=0.2, angular_damping=0.0),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )


def test_pingpong_scene_steps_and_ball_arrives():
    scene = compile_scene(_pingpong_scene())
    assert scene.num_actors == 3
    assert scene.num_dofs == 7
    assert scene.num_bodies == 42
    sim = Simulator(scene)
    B = 8
    state = sim.initial_state(B)
    # launch the ball toward the robot like the C7 reset (speed 5.6, slight up-tilt)
    v0 = jnp.asarray([-5.6 * np.cos(np.radians(13.0)), 0.0, 5.6 * np.sin(np.radians(13.0))], dtype=jnp.float32)
    state = state._replace(root=state.root.at[:, 2, 7:10].set(v0))
    targets = jnp.zeros((B, 7))
    efforts = jnp.zeros((B, 7))

    def body(s, _):
        s2 = sim.step(s, targets, efforts)
        return s2, (s2.root[:, 2, 0], s2.root[:, 2, 2], s2.root[:, 2, 7])

    state, (bx, bz, bvx) = jax.lax.scan(body, state, None, length=90)
    bx = np.asarray(bx[:, 0]); bz = np.asarray(bz[:, 0]); bvx = np.asarray(bvx[:, 0])
    assert np.all(np.isfinite(np.asarray(state.root)))
    # ball crossed the net plane (x=1.75) toward the robot
    assert bx.min() < 1.0, bx.min()
    # ball bounced on the table at least once (z dipped near the surface then rose)
    near_table = (bz < 0.85) & (bx > 0.4) & (bx < 3.1)
    assert near_table.any()
    rb = sim.rigid_body_states(state)
    assert rb.shape == (8, 42, 13)
    assert np.all(np.isfinite(np.asarray(rb)))


def test_batch_envs_independent():
    """Different ball velocities per env evolve independently (no cross-talk)."""
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    B = 4
    state = sim.initial_state(B)
    vx = jnp.asarray([-4.0, -5.0, -6.0, -7.0])
    root = state.root.at[:, 2, 7].set(vx)
    root = root.at[:, 2, 9].set(2.0)  # launch upward, clear of table/net
    state = state._replace(root=root)
    targets = jnp.zeros((B, 7)); efforts = jnp.zeros((B, 7))
    state = _run(sim, state, targets, efforts, 20)  # 0.167 s: pre-contact
    x = np.asarray(state.root[:, 2, 0])
    assert np.all(np.diff(x) < 0), x  # faster balls are further along -x


def test_net_contact_force_and_tensor_api():
    """N2 parity: contact forces reported per body; tensor-API views/setters."""
    from isaacgym_tpu.sim import tensor_api as T
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    B = 2
    state = sim.initial_state(B)
    v0 = jnp.asarray([-5.6 * np.cos(np.radians(13.0)), 0.0, 5.6 * np.sin(np.radians(13.0))],
                     dtype=jnp.float32)
    state = T.set_rigid_linear_velocity(state, 2, v0)
    targets = jnp.zeros((B, 7)); efforts = jnp.zeros((B, 7))
    step = jax.jit(sim.step)
    max_ball_f = 0.0
    for _ in range(90):
        state = step(state, targets, efforts)
        ncf = T.acquire_net_contact_force_tensor(state)
        max_ball_f = max(max_ball_f, float(jnp.abs(ncf[:, 41]).max()))
    # the ball hit the table at least once: a contact force was reported
    assert max_ball_f > 0.5, max_ball_f
    # views have the reference layouts
    assert T.acquire_actor_root_state_tensor(state).shape == (B, 3, 13)
    assert T.acquire_dof_state_tensor(state).shape == (B, 7, 2)
    assert T.acquire_rigid_body_state_tensor(sim, state).shape == (B, 42, 13)
    assert T.acquire_dof_force_tensor(state).shape == (B, 7)
    assert T.acquire_force_sensor_tensor(sim, state, [39]).shape == (B, 1, 6)
    # functional indexed setter
    state2 = T.set_dof_state_tensor_indexed(state, jnp.zeros(7), jnp.zeros(7),
                                            env_ids=jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(state2.dof_pos[0]), 0.0)
    np.testing.assert_allclose(np.asarray(state2.dof_pos[1]),
                               np.asarray(state.dof_pos[1]))
    # angular-velocity setter and the non-indexed root write
    w0 = jnp.asarray([0.0, 7.0, 0.0])
    state3 = T.set_rigid_angular_velocity(state, 2, w0)
    np.testing.assert_allclose(np.asarray(state3.root[:, 2, 10:13]),
                               np.broadcast_to(np.asarray(w0), (B, 3)))
    state4 = T.set_actor_root_state_tensor(state, jnp.zeros((3, 13)))
    np.testing.assert_allclose(np.asarray(state4.root), 0.0)


def test_ball_spin_friction_coupling():
    """PhysX-parity spin: friction acts at the contact point, torquing the
    ball. Closed form for a sticking bounce (mu j_n > |slip|/(1+kappa)):
    dv_t = |slip|/(1+kappa), domega = kappa*dv_t/r — for the hollow ball
    (kappa = 3/2) a 150 rad/s topspin drop kicks forward by exactly
    0.02*150/2.5 = 1.2 m/s and leaves 60 rad/s of spin."""
    from isaacgym_tpu.sim.simulator import _ball_kappa
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    ball = scene.free_bodies[0]
    np.testing.assert_allclose(_ball_kappa(ball), 1.5, rtol=1e-5)
    B = 2
    state = sim.initial_state(B)
    r = state.root
    r = r.at[:, 2, 0:3].set(jnp.asarray([-1.0, 0.0, 0.3]))    # over the ground
    r = r.at[:, 2, 7:10].set(jnp.asarray([0.0, 0.0, -3.0]))   # pure drop
    r = r.at[:, 2, 10:13].set(jnp.asarray([0.0, 50.0, 0.0]))  # topspin
    state = state._replace(root=r)
    targets = jnp.zeros((B, 7)); efforts = jnp.zeros((B, 7))
    step = jax.jit(sim._step_vmapped)
    for _ in range(60):
        state = step(state, targets, efforts)
        b = np.asarray(state.root[0, 2])
        if b[9] > 0:
            break
    assert b[9] > 0, "ball never bounced"
    np.testing.assert_allclose(b[7], 0.4, atol=1e-2)    # forward kick
    np.testing.assert_allclose(b[11], 20.0, atol=0.5)   # spin reduced
    # the ball's orientation integrates its spin (quat rotates about y)
    assert abs(b[4]) > 1e-3 and abs(float(state.root[0, 2, 3])) < 1e-6

    # control: spinless vertical drop picks up no lateral velocity or spin
    state2 = sim.initial_state(B)
    r2 = state2.root.at[:, 2, 0:3].set(jnp.asarray([-1.0, 0.0, 0.3]))
    r2 = r2.at[:, 2, 7:10].set(jnp.asarray([0.0, 0.0, -3.0]))
    state2 = state2._replace(root=r2)
    for _ in range(60):
        state2 = step(state2, targets, efforts)
        b2 = np.asarray(state2.root[0, 2])
        if b2[9] > 0:
            break
    np.testing.assert_allclose(b2[7], 0.0, atol=1e-5)
    np.testing.assert_allclose(b2[10:13], 0.0, atol=1e-5)


def test_ball_spin_generated_by_oblique_bounce():
    """A spinless oblique bounce must GAIN spin toward rolling: friction
    opposes the +x slip at the bottom contact, and its torque
    domega = (kappa jt / r)(n x t_hat) with n = +z, t_hat = +x gives
    omega_y > 0 (forward roll for +x motion)."""
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    B = 2
    state = sim.initial_state(B)
    r = state.root.at[:, 2, 0:3].set(jnp.asarray([-1.0, 0.0, 0.15]))
    r = r.at[:, 2, 7:10].set(jnp.asarray([4.0, 0.0, -4.0]))
    state = state._replace(root=r)
    targets = jnp.zeros((B, 7)); efforts = jnp.zeros((B, 7))
    step = jax.jit(sim._step_vmapped)
    for _ in range(40):
        state = step(state, targets, efforts)
        b = np.asarray(state.root[0, 2])
        if b[9] > 0:
            break
    assert b[9] > 0
    assert b[11] > 1.0, b[11]           # gained forward-roll spin
    assert b[11] <= 64.001              # AssetOptions.max_angular_velocity cap
    assert 0 < b[7] < 4.0               # friction slowed the slide


def test_ball_angular_damping_decay():
    """AssetOptions.angular_damping (IsaacGym default 0.5, kept by the
    reference) decays free-body spin as prod(1 - d*dt_s): over 1 s at
    240 substeps/s the factor is (1 - 0.5/240)^240 ~= 0.6063."""
    spec = SceneSpec(
        actors=[ActorSpec("ball", _ball_tree(), pos=(0, 0, 50.0), fixed_base=False,
                          restitution=1.5, friction=0.2)],  # default damping
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(2)
    state = state._replace(root=state.root.at[:, 0, 10:13].set(
        jnp.asarray([0.0, 40.0, 0.0])))
    zeros = jnp.zeros((2, 0))
    state = _run(sim, state, zeros, zeros, 120)  # 1 s of free fall
    w = float(state.root[0, 0, 11])
    np.testing.assert_allclose(w, 40.0 * (1.0 - 0.5 / 240.0) ** 240, rtol=1e-4)
    # linear velocity is NOT damped (linear_damping default 0)
    np.testing.assert_allclose(float(state.root[0, 0, 9]), -9.81, atol=0.01)


def test_speculative_contact_prevents_paddle_tunneling():
    """PhysX uses speculative contacts (its default CCD): a contact fires
    when the ball will cross the surface within the substep. The paddle
    blade is 15 mm thick and the capture window along its normal is
    half_len + ball radius = 27.5 mm, while a 9.5 m/s ball moves 39.6 mm
    per substep — penetration-only activation can tunnel straight through.
    Fire the ball at the paddle face along its normal and require a
    contact impulse on the paddle body."""
    from isaacgym_tpu.utils import rotations as rot
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    state = sim.initial_state(2)
    rb = sim.rigid_body_states(state)
    pp = np.asarray(rb[0, 39, 0:3])
    pq = jnp.asarray(rb[0, 39, 3:7])
    nrm = np.asarray(rot.quat_rotate(pq, jnp.asarray([1.0, 0.0, 0.0])))
    center = pp + np.asarray(rot.quat_rotate(pq, jnp.asarray([0.05, 0.0, 0.0])))
    r = state.root.at[:, 2, 0:3].set(jnp.asarray(center + 0.25 * nrm))
    r = r.at[:, 2, 7:10].set(jnp.asarray(-9.5 * nrm))
    state = state._replace(root=r)
    targets = jnp.zeros((2, 7)); efforts = jnp.zeros((2, 7))
    step = jax.jit(sim._step_vmapped)
    hit = 0.0
    for _ in range(12):
        state = step(state, targets, efforts)
        hit = max(hit, float(jnp.abs(state.net_contact_force[0, 39]).max()))
    assert hit > 0.1, "ball tunneled through the paddle"


def test_ball_ball_collision_closed_form():
    """Two equal free balls head-on: v_rel' = -e v_rel with e = avg(1.5,1.5),
    so each ball rebounds at 1.5x its approach speed (super-elastic pair)."""
    ball = _ball_tree()
    spec = SceneSpec(
        actors=[
            ActorSpec("ball_a", ball, pos=(0.06, 0.0, 5.0), fixed_base=False,
                      restitution=1.5, friction=0.2, angular_damping=0.0),
            ActorSpec("ball_b", ball, pos=(-0.06, 0.0, 5.0), fixed_base=False,
                      restitution=1.5, friction=0.2, angular_damping=0.0),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    state = sim.initial_state(2)
    r = state.root.at[:, 0, 7:10].set(jnp.asarray([-2.0, 0.0, 0.0]))
    r = r.at[:, 1, 7:10].set(jnp.asarray([2.0, 0.0, 0.0]))
    state = state._replace(root=r)
    zeros = jnp.zeros((2, 0))
    step = jax.jit(sim._step_vmapped)
    for _ in range(8):   # gap 0.08 m closes at 4 m/s -> ~5 substeps
        state = step(state, zeros, zeros)
    va = float(state.root[0, 0, 7]); vb = float(state.root[0, 1, 7])
    np.testing.assert_allclose(va, 3.0, atol=1e-3)   # 1.5 x 2.0, rebounding +x
    np.testing.assert_allclose(vb, -3.0, atol=1e-3)


def test_ball_aerodynamics_drag_and_magnus():
    """Opt-in aero extension (beyond the reference): quadratic drag slows
    flight by a = -k_d|v|v with k_d = 0.5 rho Cd pi r^2/m, and Magnus lift
    curves a topspin ball DOWNWARD (omega=+y, v=+x -> omega x v = -z)."""
    ball = _ball_tree()

    def scene(cd, cm):
        return compile_scene(SceneSpec(
            actors=[ActorSpec("ball", ball, pos=(0, 0, 50.0), fixed_base=False,
                              restitution=1.5, friction=0.2,
                              angular_damping=0.0,
                              drag_coefficient=cd, magnus_coefficient=cm)],
            plane=PlaneParams(), dt=1 / 120, substeps=2,
        ))

    # drag: closed-form k_d check over a short horizontal flight
    sim = Simulator(scene(0.4, 0.0))
    kd = sim.scene.free_bodies[0].drag_k
    np.testing.assert_allclose(
        kd, 0.5 * 1.204 * 0.4 * np.pi * 0.02 ** 2 / 0.0027, rtol=1e-5)
    state = sim.initial_state(2)
    state = state._replace(root=state.root.at[:, 0, 7:10].set(
        jnp.asarray([8.0, 0.0, 0.0])))
    zeros = jnp.zeros((2, 0))
    state = _run(sim, state, zeros, zeros, 12)  # 0.1 s
    vx = float(state.root[0, 0, 7])
    # dv/dt = -kd v^2 -> v(t) = v0/(1+kd v0 t)
    np.testing.assert_allclose(vx, 8.0 / (1 + kd * 8.0 * 0.1), rtol=2e-3)

    # magnus: topspin +y on a +x flight pushes the ball down vs no-spin
    sim2 = Simulator(scene(0.0, 1.0))
    st = sim2.initial_state(2)
    r = st.root.at[:, 0, 7:10].set(jnp.asarray([8.0, 0.0, 0.0]))
    r = r.at[:, 0, 10:13].set(jnp.asarray([0.0, 60.0, 0.0]))
    st = st._replace(root=r)
    st = _run(sim2, st, zeros, zeros, 24)  # 0.2 s
    st0 = sim2.initial_state(2)
    st0 = st0._replace(root=st0.root.at[:, 0, 7:10].set(jnp.asarray([8.0, 0.0, 0.0])))
    st0 = _run(sim2, st0, zeros, zeros, 24)
    drop_spin = 50.0 - float(st.root[0, 0, 2])
    drop_nospin = 50.0 - float(st0.root[0, 0, 2])
    assert drop_spin > drop_nospin + 0.01, (drop_spin, drop_nospin)

    # default (no coefficients) keeps parity: ballistic closed form intact
    sim3 = Simulator(scene(0.0, 0.0))
    assert sim3.scene.free_bodies[0].drag_k == 0.0
    assert sim3.scene.free_bodies[0].magnus_k == 0.0


def test_handle_and_property_surface():
    """N2/N4 parity: handle introspection, shape/DOF property get/set, and
    per-actor DOF writes (reference get_actor_index / get_rigid_handle /
    get/set_actor_rigid_shape_properties / get/set_actor_dof_properties /
    set_actor_dof_states, e.g. joint_monkey2_new.py:294-316,471-472 and
    ...only_3_actor.py:519-626)."""
    from isaacgym_tpu.sim import tensor_api as T
    spec = _pingpong_scene()
    scene = compile_scene(spec)
    sim = Simulator(scene)

    # handles
    assert T.get_actor_index(sim, "pingpong_ball_2") == 2
    assert T.get_actor_index(sim, "humanoid1") == 0
    names = T.get_actor_rigid_body_names(sim, "humanoid1")
    assert len(names) == 40 and names[0] == scene.body_names[0].split("/", 1)[1]
    paddle = T.get_rigid_handle(sim, "humanoid1", names[-1])
    assert paddle == 39  # paddle is body 39 of the 40-body G1 (SURVEY §1-L1)
    assert T.find_actor_rigid_body_handle(sim, "pingpong_ball_2",
                                          T.get_actor_rigid_body_names(sim, 2)[0]) == 41

    # shape properties: read matches the spec, setup-time write round-trips
    props = T.get_actor_rigid_shape_properties(sim, "pingpong_table")
    assert len(props) >= 1 and props[0].restitution == 1.5
    ball_props = T.get_actor_rigid_shape_properties(sim, "pingpong_ball_2")
    assert ball_props[0].friction == 0.2
    for p in props:
        p.restitution = 0.9
        p.friction = 0.7
    T.set_actor_rigid_shape_properties(spec, "pingpong_table", props)
    scene2 = compile_scene(spec)
    p2 = T.get_actor_rigid_shape_properties(scene2, "pingpong_table")
    assert p2[0].restitution == 0.9 and p2[0].friction == 0.7

    # dof properties
    dp = T.get_actor_dof_properties(sim, "humanoid1")
    np.testing.assert_allclose(dp["stiffness"], [20, 20, 20, 20, 20, 5, 5])
    np.testing.assert_allclose(dp["damping"], dp["stiffness"] / 40.0)
    assert dp["lower"].shape == (7,) and np.all(dp["upper"] >= dp["lower"])
    dp["stiffness"] = dp["stiffness"] * 2.0
    T.set_actor_dof_properties(spec, "humanoid1", dp)
    scene3 = compile_scene(spec)
    np.testing.assert_allclose(
        T.get_actor_dof_properties(scene3, "humanoid1")["stiffness"],
        [40, 40, 40, 40, 40, 10, 10])

    # per-actor DOF state write leaves other envs/actors untouched
    B = 2
    state = sim.initial_state(B)
    q = jnp.full(7, 0.3)
    state2 = T.set_actor_dof_states(state, sim, "humanoid1", q, jnp.zeros(7),
                                    env_ids=jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(state2.dof_pos[1]), 0.3)
    np.testing.assert_allclose(np.asarray(state2.dof_pos[0]),
                               np.asarray(state.dof_pos[0]))

    # runtime property scales ride the DR channel
    from isaacgym_tpu.env.randomize import identity_params
    import jax as _jax
    dr = _jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                       identity_params(7))
    dr2 = T.runtime_shape_property_scales(sim, dr, "humanoid1",
                                          friction=1.0, restitution=0.3)
    np.testing.assert_allclose(np.asarray(dr2.friction_scale), 1.0 / 0.5)
    np.testing.assert_allclose(np.asarray(dr2.restitution_scale), 0.3 / 0.6)
    dr3 = T.runtime_dof_property_scales(sim, dr, "humanoid1",
                                        stiffness=np.full(7, 10.0))
    np.testing.assert_allclose(np.asarray(dr3.kp_scale[0]),
                               10.0 / np.asarray([20, 20, 20, 20, 20, 5, 5]))
    # the scaled step still runs
    state3 = sim.step_dr(state, jnp.zeros((B, 7)), jnp.zeros((B, 7)), dr3)
    assert np.all(np.isfinite(np.asarray(state3.dof_pos)))
