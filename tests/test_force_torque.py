"""Force-sensor TORQUE lanes (VERDICT r3 missing item 3).

The reference's ``create_asset_force_sensor`` + ``acquire_force_sensor_tensor``
expose a full wrench; ``state.net_contact_torque`` fills the torque lanes with
the contact-moment sum about each body's frame origin (ball bodies: about the
ball center). Tests:

- analytic: a ball sliding into flat ground receives the closed-form friction
  torque tau = r * jt * (n x t_hat) * m / dt;
- fused-vs-XLA single-step parity of the torque field on the flagship scene;
- an off-center paddle strike produces a nonzero paddle-body torque that the
  sensor tensor exposes in lanes 3:6.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from isaacgym_tpu.sim.scene import ActorSpec, PlaneParams, SceneSpec, compile_scene
from isaacgym_tpu.sim.simulator import Simulator, _ball_kappa
from isaacgym_tpu.tasks.pingpong_common import load_tree


def test_ball_ground_friction_torque_analytic():
    ball_tree = load_tree("small_ball.urdf")
    spec = SceneSpec(
        actors=[ActorSpec("ball", ball_tree, pos=(0.0, 0.0, 0.0),
                          fixed_base=False, restitution=1.0, friction=0.5)],
        plane=PlaneParams(static_friction=0.5, dynamic_friction=0.5,
                          restitution=1.0),
        gravity=(0.0, 0.0, 0.0), dt=1 / 120, substeps=2,
    )
    sim = Simulator(compile_scene(spec))
    ball = sim.scene.free_bodies[0]
    r, m = ball.radius, ball.mass
    kappa = _ball_kappa(ball)
    state = sim.initial_state(batch=1)
    vx, vz = 2.0, 3.0
    state = state._replace(root=state.root.at[:, 0, 2].set(r - 1e-4)
                           .at[:, 0, 7].set(vx).at[:, 0, 9].set(-vz))
    targets = jnp.zeros((1, 0))
    out = sim.step(state, targets, targets)

    # closed forms (ops/contacts.resolve_sphere_impulse_spin, zero spin):
    e, mu = 1.0, 0.5                     # average combine of equal materials
    jn = (1.0 + e) * vz                  # normal dv magnitude
    jt = min(mu * jn, vx / (1.0 + kappa))
    tau_y = r * jt * m / sim.dt          # (-r n) x (m dv/dt), slip +x
    tq = np.asarray(out.net_contact_torque[0, 0])
    np.testing.assert_allclose(tq, [0.0, tau_y, 0.0], rtol=1e-5, atol=1e-8)
    # and the force lanes see the normal + friction impulse
    f = np.asarray(out.net_contact_force[0, 0])
    np.testing.assert_allclose(f, [-jt * m / sim.dt, 0.0, jn * m / sim.dt],
                               rtol=1e-5, atol=1e-6)


def test_fused_torque_matches_xla_single_step(monkeypatch):
    from tests.test_simulator import _pingpong_scene

    # sensor-less scenes build the kernel WITHOUT torque channels; force
    # them on the way a sensor registration would
    monkeypatch.setenv("ISAACGYM_TPU_TORQUE", "1")
    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    sim._maybe_build_pallas(force=True)
    assert sim._fused is not None

    B = 128
    state0 = sim.initial_state(B)
    v0 = jnp.asarray([-5.0, 0.3, 1.8])
    state0 = state0._replace(root=state0.root.at[:, 2, 7:10].set(v0))
    tgt = jnp.full((B, 7), 0.2)
    eff = jnp.zeros((B, 7))

    fused_step = jax.jit(sim._step_batched_pallas)
    xla_step = jax.jit(sim._step_vmapped)

    # roll the fused path into a contact-rich region, then compare ONE step
    s = state0
    for _ in range(20):
        s = fused_step(s, tgt, eff)
    sf = fused_step(s, tgt, eff)
    sx = xla_step(s, tgt, eff)
    tq_f = np.asarray(sf.net_contact_torque)
    tq_x = np.asarray(sx.net_contact_torque)
    assert np.isfinite(tq_f).all()
    # exclude envs where a contact flipped at an f32 margin (same rationale
    # as tools/parity_tpu.py): compare where the FORCE fields agree
    ncf_gap = np.abs(np.asarray(sf.net_contact_force)
                     - np.asarray(sx.net_contact_force)).reshape(B, -1).max(1)
    keep = ncf_gap < 1.0
    assert keep.sum() >= B // 2
    np.testing.assert_allclose(tq_f[keep], tq_x[keep], atol=5e-3)


def test_offcenter_strike_reads_in_sensor_lanes():
    """Ball dropped onto the paddle blade away from the paddle body origin:
    the paddle body's sensor wrench shows a torque consistent with
    lever x force (both read from the same step)."""
    from tests.test_simulator import _pingpong_scene
    from isaacgym_tpu.sim import tensor_api as T

    scene = compile_scene(_pingpong_scene())
    sim = Simulator(scene)
    state = sim.initial_state(batch=1)
    # aim the ball at the paddle with a fast lateral approach so the strike
    # happens within a few steps of the default pose
    paddle_body = int(sim._fused_art_bodies[-1]) if getattr(
        sim, "_fused_art_bodies", None) is not None else None
    tgt = jnp.zeros((1, 7))
    # place ball just above the paddle geom: find the paddle world position
    rbs = sim.rigid_body_states(state)
    # paddle is the last body of the humanoid subtree with a geom; use the
    # art geom bodies recorded at scene compile
    geom_bodies = [scene.articulations[g.art_index].body_start + g.body_index
                   for g in scene.art_geoms]
    pb = geom_bodies[-1]
    ppos = np.asarray(rbs[0, pb, 0:3])
    # incoming fast ball aimed slightly off the paddle center (same approach
    # velocity class as the task launch)
    state = state._replace(root=state.root.at[:, 2, 0:3].set(
        jnp.asarray([ppos[0] + 0.35, ppos[1] + 0.02, ppos[2] + 0.05]))
        .at[:, 2, 7:10].set(jnp.asarray([-6.0, 0.0, 0.0])))
    hit_tq = None
    for _ in range(40):
        state = sim.step(state, tgt, jnp.zeros_like(tgt))
        ncf = np.asarray(state.net_contact_force[0, pb])
        if np.linalg.norm(ncf) > 1.0:
            hit_tq = np.asarray(state.net_contact_torque[0, pb])
            break
    assert hit_tq is not None, "ball never struck the paddle"
    assert np.linalg.norm(hit_tq) > 1e-3
    # the sensor tensor exposes the same values in lanes 3:6
    wrench = T.acquire_force_sensor_tensor(sim, state, body_indices=[pb])
    np.testing.assert_allclose(np.asarray(wrench[0, 0, 3:6]), hit_tq)


def _box_urdf(sx, sy, sz, mass=2.0):
    return f"""
<robot name="slab">
  <link name="slab">
    <inertial><origin xyz="0 0 0"/><mass value="{mass}"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0"/>
      <geometry><box size="{sx} {sy} {sz}"/></geometry></collision>
  </link>
</robot>
"""


def test_fused_multi_torque_matches_xla(monkeypatch):
    """C8/C11-class (multi-articulation / multi-ball) fused kernel: the
    force-sensor torque lanes and the art-static ncf contributions match the
    XLA path (VERDICT r4 item 4 — the lanes used to exist only on the
    single-articulation kernel)."""
    from tests.test_pallas_dynamics import TOY_ARM_URDF
    from isaacgym_tpu.models import urdf as U_
    from isaacgym_tpu.models import kinematics as K_

    monkeypatch.setenv("ISAACGYM_TPU_TORQUE", "1")
    arm = K_.compile_tree(U_.parse_urdf(TOY_ARM_URDF, from_string=True))
    ball = K_.compile_tree(U_.parse_urdf("""
<robot name="toy_ball"><link name="ball">
  <inertial><origin xyz="0 0 0"/><mass value="0.0027"/>
    <inertia ixx="7e-7" iyy="7e-7" izz="7e-7" ixy="0" ixz="0" iyz="0"/></inertial>
  <collision><origin xyz="0 0 0"/><geometry><sphere radius="0.02"/></geometry></collision>
</link></robot>""", from_string=True))
    slab = K_.compile_tree(U_.parse_urdf(_box_urdf(1.2, 1.2, 0.08),
                                         from_string=True))
    kp = np.full(3, 25.0, np.float32)
    scene = compile_scene(SceneSpec(
        actors=[
            ActorSpec("arm1", arm, pos=(0, 0, 1.0), fixed_base=True,
                      restitution=0.6, friction=0.5, stiffness=kp, damping=kp / 20),
            ActorSpec("arm2", arm, pos=(2.0, 0, 1.0), quat=(0, 0, 1, 0),
                      fixed_base=True, restitution=0.6, friction=0.5,
                      stiffness=kp, damping=kp / 20),
            # static slab inside arm1's downward swing arc (paddle arc
            # bottoms out near z ~ 0.6): the arm presses into it ->
            # art-static impulses/torques must land in ncf/nct
            ActorSpec("slab", slab, pos=(0.35, 0.0, 0.55), fixed_base=True,
                      restitution=0.4, friction=0.5),
            # balls aimed at the arms' workspaces; they also land on the
            # slab/plane (ball torque rows from sliding friction)
            ActorSpec("ball1", ball, pos=(0.9, 0.02, 0.9), fixed_base=False,
                      restitution=1.3, friction=0.2),
            ActorSpec("ball2", ball, pos=(1.2, -0.02, 0.9), fixed_base=False,
                      restitution=1.3, friction=0.2),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    ))
    sim = Simulator(scene)
    sim._maybe_build_pallas(force=True)
    assert getattr(sim, "_fused_multi", None) is not None

    B = 128
    state0 = sim.initial_state(B)
    state0 = state0._replace(
        root=state0.root.at[:, 3, 7:10].set(jnp.asarray([-4.0, 0.1, 0.3]))
                         .at[:, 4, 7:10].set(jnp.asarray([4.0, -0.1, 0.3])))
    nd = scene.num_dofs
    rng = np.random.RandomState(5)
    # positive targets swing the toy arm DOWN (axis +y: x -> -z), pressing
    # arm1 into the slab
    tgt = jnp.asarray(rng.uniform(0.2, 1.2, (B, nd)).astype(np.float32))
    eff = jnp.zeros((B, nd))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    s = state0
    for _ in range(50):
        s = fused(s, tgt, eff)
    sf = fused(s, tgt, eff)
    sx = xla(s, tgt, eff)
    tq_f = np.asarray(sf.net_contact_torque)
    tq_x = np.asarray(sx.net_contact_torque)
    assert np.isfinite(tq_f).all()
    ncf_gap = np.abs(np.asarray(sf.net_contact_force)
                     - np.asarray(sx.net_contact_force)).reshape(B, -1).max(1)
    # tight mask: a contact-margin flip shows a force gap long before the
    # 5e-3 torque tolerance matters (clean envs sit at ~1e-3)
    keep = ncf_gap < 0.05
    assert keep.sum() >= B // 2
    np.testing.assert_allclose(tq_f[keep], tq_x[keep], atol=5e-3)
    # the lanes are alive: some env shows a nonzero geom-body torque
    assert np.abs(tq_f[keep]).max() > 1e-5


def test_fused_floating_torque_matches_xla(monkeypatch):
    """C10-class (floating-base) fused kernel: wrench torque lanes +
    art-static ncf contributions match XLA (VERDICT r4 item 4)."""
    from tests.test_pallas_floating import TOY_URDF, BALL_URDF
    from isaacgym_tpu.models import urdf as U_
    from isaacgym_tpu.models import kinematics as K_

    monkeypatch.setenv("ISAACGYM_TPU_TORQUE", "1")
    biped = K_.compile_tree(U_.parse_urdf(TOY_URDF, from_string=True),
                            floating_base=True)
    ball = K_.compile_tree(U_.parse_urdf(BALL_URDF, from_string=True))
    slab = K_.compile_tree(U_.parse_urdf(_box_urdf(0.8, 0.8, 0.06),
                                         from_string=True))
    kp = np.full(4, 40.0, np.float32)
    scene = compile_scene(SceneSpec(
        actors=[
            ActorSpec("biped", biped, pos=(0, 0, 0.72), fixed_base=False,
                      restitution=0.5, friction=0.6, stiffness=kp,
                      damping=kp / 20),
            # slab in front at paddle height: the arm strikes it
            ActorSpec("slab", slab, pos=(0.5, 0.0, 0.9), fixed_base=True,
                      restitution=0.4, friction=0.5),
            # off-center incoming ball aimed at the paddle
            ActorSpec("ball", ball, pos=(1.5, 0.05, 1.0), fixed_base=False,
                      restitution=1.3, friction=0.2),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    ))
    sim = Simulator(scene)
    sim._maybe_build_pallas(force=True)
    assert sim._fused_floating is not None

    B = 128
    state0 = sim.initial_state(B)
    state0 = state0._replace(
        root=state0.root.at[:, 2, 7:10].set(jnp.asarray([-4.0, -0.2, 0.3])))
    rng = np.random.RandomState(7)
    tgt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 4)).astype(np.float32))
    eff = jnp.zeros((B, 4))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    s = state0
    for _ in range(20):
        s = fused(s, tgt, eff)
    sf = fused(s, tgt, eff)
    sx = xla(s, tgt, eff)
    tq_f = np.asarray(sf.net_contact_torque)
    tq_x = np.asarray(sx.net_contact_torque)
    assert np.isfinite(tq_f).all()
    ncf_gap = np.abs(np.asarray(sf.net_contact_force)
                     - np.asarray(sx.net_contact_force)).reshape(B, -1).max(1)
    keep = ncf_gap < 1.0
    assert keep.sum() >= B // 2
    np.testing.assert_allclose(tq_f[keep], tq_x[keep], atol=5e-3)
    assert np.abs(tq_f[keep]).max() > 1e-5
