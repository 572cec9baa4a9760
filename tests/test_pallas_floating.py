"""Numerical parity of the floating-base fused substep kernel (C10 class)
vs the vmapped XLA path (interpret mode on CPU; compiles on TPU).

The XLA path (ops.dynamics.forward_dynamics + Simulator._substep) is the
oracle: same formulation (u = [omega, v, qdot], Jacobian-assembled mass
matrix, jvp/RNEA bias), so trajectories must agree to f32 accumulation
noise over tens of substeps.

CPU parity runs on a small 4-DOF floating biped (same kernel code paths:
runtime base pose, in-kernel floating solve, articulated-geom ground
contacts, ball contact) — the full 27-DOF C10 scene unrolls an nv=33
in-kernel Cholesky whose interpret-mode graph takes ~an hour of XLA:CPU
compile, so it is gated behind ISAACGYM_TPU_HEAVY_TESTS=1 (it compiles in
seconds on the real TPU backend, where the C10 bench exercises it).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import isaacgym_tpu
from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.sim.scene import ActorSpec, PlaneParams, SceneSpec, compile_scene
from isaacgym_tpu.sim.simulator import Simulator

HEAVY = os.environ.get("ISAACGYM_TPU_HEAVY_TESTS", "") == "1"

# 4-DOF floating biped: torso + two 1-DOF legs with sphere feet + a 2-DOF
# arm with a sphere "paddle". Feet rest on the ground at base z=0.72.
TOY_URDF = """
<robot name="toy_biped">
  <link name="torso">
    <inertial><origin xyz="0 0 0"/><mass value="8.0"/>
      <inertia ixx="0.3" iyy="0.3" izz="0.15" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0"/>
      <geometry><box size="0.25 0.2 0.45"/></geometry></collision>
  </link>
  <link name="leg_l">
    <inertial><origin xyz="0 0 -0.25"/><mass value="1.5"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.36"/>
      <geometry><sphere radius="0.08"/></geometry></collision>
  </link>
  <link name="leg_r">
    <inertial><origin xyz="0 0 -0.25"/><mass value="1.5"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.36"/>
      <geometry><sphere radius="0.08"/></geometry></collision>
  </link>
  <link name="upper_arm">
    <inertial><origin xyz="0.12 0 0"/><mass value="0.8"/>
      <inertia ixx="0.004" iyy="0.004" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="paddle_hand">
    <inertial><origin xyz="0.1 0 0"/><mass value="0.4"/>
      <inertia ixx="0.002" iyy="0.002" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0.18 0 0"/>
      <geometry><sphere radius="0.09"/></geometry></collision>
  </link>
  <joint name="hip_l" type="revolute">
    <origin xyz="0 0.11 -0.28"/><parent link="torso"/><child link="leg_l"/>
    <axis xyz="0 1 0"/><limit lower="-1.2" upper="1.2" effort="60" velocity="20"/>
  </joint>
  <joint name="hip_r" type="revolute">
    <origin xyz="0 -0.11 -0.28"/><parent link="torso"/><child link="leg_r"/>
    <axis xyz="0 1 0"/><limit lower="-1.2" upper="1.2" effort="60" velocity="20"/>
  </joint>
  <joint name="shoulder" type="revolute">
    <origin xyz="0.14 0 0.15"/><parent link="torso"/><child link="upper_arm"/>
    <axis xyz="0 1 0"/><limit lower="-2.0" upper="2.0" effort="30" velocity="20"/>
  </joint>
  <joint name="elbow" type="revolute">
    <origin xyz="0.22 0 0"/><parent link="upper_arm"/><child link="paddle_hand"/>
    <axis xyz="0 0 1"/><limit lower="-2.0" upper="2.0" effort="30" velocity="20"/>
  </joint>
</robot>
"""

BALL_URDF = """
<robot name="ball">
  <link name="ball">
    <inertial><origin xyz="0 0 0"/><mass value="0.0027"/>
      <inertia ixx="7.2e-7" iyy="7.2e-7" izz="7.2e-7" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0"/>
      <geometry><sphere radius="0.02"/></geometry></collision>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def toy():
    biped = K.compile_tree(U.parse_urdf(TOY_URDF, from_string=True),
                           floating_base=True)
    ball = K.compile_tree(U.parse_urdf(BALL_URDF, from_string=True))
    kp = np.full(4, 40.0, np.float32)
    scene = compile_scene(SceneSpec(
        actors=[
            ActorSpec("biped", biped, pos=(0, 0, 0.72), fixed_base=False,
                      restitution=0.5, friction=0.6, stiffness=kp, damping=kp / 20),
            ActorSpec("ball", ball, pos=(1.5, 0.05, 1.0), fixed_base=False,
                      restitution=1.3, friction=0.2),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    ))
    sim = Simulator(scene)
    sim._maybe_build_pallas(force=True)
    return sim


def test_floating_kernel_built(toy):
    sim = toy
    assert sim._fused_floating is not None
    assert sim.scene.articulations[0].model.floating


def test_floating_fused_matches_xla(toy):
    """Free fall + PD hold + ball approach: fused == XLA over 20 steps."""
    sim = toy
    B = 128
    state0 = sim.initial_state(B)
    ball_actor = sim.scene.free_bodies[0].actor_index
    state0 = state0._replace(
        root=state0.root.at[:, ball_actor, 7:10].set(jnp.asarray([-4.0, 0.0, 1.0])))
    nd = sim.scene.num_dofs
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.uniform(-0.2, 0.2, (B, nd)).astype(np.float32))
    eff = jnp.zeros((B, nd))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    sf = sx = state0
    for _ in range(20):
        sf = fused(sf, tgt, eff)
        sx = xla(sx, tgt, eff)

    hum = sim.scene.articulations[0].actor_index
    # feet stay in persistent ground contact here (unlike the airborne-ball
    # phases of the C10 variant), so f32 accumulation-order divergence
    # compounds a little faster: 1e-2 over 20 substepped contact steps
    np.testing.assert_allclose(np.asarray(sf.dof_pos), np.asarray(sx.dof_pos),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 0:3]),
                               np.asarray(sx.root[:, hum, 0:3]), atol=1e-2)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 3:7]),
                               np.asarray(sx.root[:, hum, 3:7]), atol=1e-2)
    # instantaneous velocities are event-timing sensitive (a contact impulse
    # resolving one substep apart flips the sign of the chatter component);
    # the integrated positions above are the accumulated-state check
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 7:13]),
                               np.asarray(sx.root[:, hum, 7:13]), atol=2e-1)
    np.testing.assert_allclose(np.asarray(sf.root[:, ball_actor, 0:3]),
                               np.asarray(sx.root[:, ball_actor, 0:3]), atol=5e-2)
    assert np.isfinite(np.asarray(sf.net_contact_force)).all()


def test_floating_random_action_stability(toy):
    """Regression: random aggressive PD targets must never blow the state up.

    PhysX stays stable under arbitrary policy actions because it clamps DOF
    velocity at the URDF limit (maxJointVelocity) and body angular velocity
    at AssetOptions.max_angular_velocity (= 100.0 in every reference task,
    e.g. …tilt_no_earlystop.py:417). Without those clamps the fallen-humanoid
    ragdoll phase of C10 diverged to NaN within ~70 steps of random actions.
    Both the fused kernel and the XLA path enforce them now.
    """
    sim = toy
    B = 128
    nd = sim.scene.num_dofs
    maxvel = sim.scene.articulations[0].model.tree.max_velocity  # 20 rad/s
    state = sim.initial_state(B)
    step_fused = jax.jit(sim._step_batched_pallas)
    step_xla = jax.jit(sim._step_vmapped)
    rng = np.random.RandomState(3)
    sf = sx = state
    for t in range(120):
        tgt = jnp.asarray(rng.uniform(-1.2, 1.2, (B, nd)).astype(np.float32))
        eff = jnp.zeros((B, nd))
        sf = step_fused(sf, tgt, eff)
        sx = step_xla(sx, tgt, eff)
    for s in (sf, sx):
        assert np.isfinite(np.asarray(s.dof_vel)).all()
        assert np.isfinite(np.asarray(s.root)).all()
        # integrator clamps at the URDF velocity limit; contact impulses are
        # applied after the clamp, so allow the ball/ground reaction margin
        assert np.abs(np.asarray(s.dof_vel)).max() <= float(maxvel.max()) * 2.0


def test_dof_velocity_clamp_exact(toy):
    """With no contact in play, post-step |dof_vel| never exceeds the URDF
    velocity limit on either path (the clamp sits in the integrator)."""
    sim = toy
    B = 128
    nd = sim.scene.num_dofs
    maxvel = float(sim.scene.articulations[0].model.tree.max_velocity.max())
    state = sim.initial_state(B)
    # park the ball far away so no ball contact fires; slam the arm DOFs
    ball_actor = sim.scene.free_bodies[0].actor_index
    state = state._replace(
        root=state.root.at[:, ball_actor, 0:3].set(jnp.asarray([50.0, 50.0, 50.0])))
    tgt = jnp.full((B, nd), 2.0, jnp.float32)  # far target -> max PD torque
    eff = jnp.zeros((B, nd))
    step = jax.jit(sim._step_batched_pallas)
    for _ in range(10):
        state = step(state, tgt, eff)
        # shoulder/elbow (DOFs 2,3) swing free of the ground: exact clamp
        arm_vel = np.asarray(state.dof_vel)[:, 2:4]
        assert np.abs(arm_vel).max() <= maxvel + 1e-4


def test_floating_fused_ground_support(toy):
    """Standing biped must be supported by ground contacts on the fused
    path: base height stays near its start over half a second of sim."""
    sim = toy
    B = 128
    state = sim.initial_state(B)
    nd = sim.scene.num_dofs
    tgt = jnp.zeros((B, nd))
    eff = jnp.zeros((B, nd))
    hum = sim.scene.articulations[0].actor_index
    z0 = float(state.root[0, hum, 2])
    step = jax.jit(sim._step_batched_pallas)
    for _ in range(30):
        state = step(state, tgt, eff)
    z = np.asarray(state.root[:, hum, 2])
    assert np.isfinite(z).all()
    # ground contact keeps it from free-falling (free fall over 30 steps
    # at dt=1/120 would drop ~0.3 m)
    assert (z > z0 - 0.15).all()


# ---------------------------------------------------------------------------
# Full C10 27-DOF parity — interpret-mode compile is ~1 h on XLA:CPU (nv=33
# unrolled in-kernel Cholesky), seconds on the TPU backend. Opt-in.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def c10():
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=128, episodeLength=30)
    sim = env.sim
    sim._maybe_build_pallas(force=True)
    return env, sim


@pytest.mark.skipif(not HEAVY, reason="ISAACGYM_TPU_HEAVY_TESTS=1 to run "
                    "(27-DOF interpret-mode kernel: ~1 h XLA:CPU compile)")
def test_c10_floating_fused_matches_xla(c10):
    env, sim = c10
    B = 128
    state0 = sim.initial_state(B)
    ball_actor = sim.scene.free_bodies[0].actor_index
    state0 = state0._replace(
        root=state0.root.at[:, ball_actor, 7:10].set(jnp.asarray([-5.5, 0.2, 1.5])))
    nd = sim.scene.num_dofs
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.uniform(-0.2, 0.2, (B, nd)).astype(np.float32))
    eff = jnp.zeros((B, nd))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    sf = sx = state0
    for _ in range(20):
        sf = fused(sf, tgt, eff)
        sx = xla(sx, tgt, eff)

    hum = sim.scene.articulations[0].actor_index
    np.testing.assert_allclose(np.asarray(sf.dof_pos), np.asarray(sx.dof_pos),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 0:3]),
                               np.asarray(sx.root[:, hum, 0:3]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 7:13]),
                               np.asarray(sx.root[:, hum, 7:13]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sf.root[:, ball_actor, 0:3]),
                               np.asarray(sx.root[:, ball_actor, 0:3]), atol=5e-2)
    assert np.isfinite(np.asarray(sf.net_contact_force)).all()


@pytest.mark.skipif(not HEAVY, reason="ISAACGYM_TPU_HEAVY_TESTS=1 to run")
def test_c10_floating_fused_ground_support(c10):
    env, sim = c10
    B = 128
    state = sim.initial_state(B)
    nd = sim.scene.num_dofs
    tgt = jnp.zeros((B, nd))
    eff = jnp.zeros((B, nd))
    hum = sim.scene.articulations[0].actor_index
    z0 = float(state.root[0, hum, 2])
    step = jax.jit(sim._step_batched_pallas)
    for _ in range(30):
        state = step(state, tgt, eff)
    z = np.asarray(state.root[:, hum, 2])
    assert np.isfinite(z).all()
    assert (z > z0 - 0.35).all()


BLOCK_URDF = """
<robot name="block">
  <link name="block">
    <inertial><mass value="10"/><inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0"/><geometry><box size="1.4 1.4 0.5"/></geometry></collision>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def toy_on_block():
    biped = K.compile_tree(U.parse_urdf(TOY_URDF, from_string=True),
                           floating_base=True)
    ball = K.compile_tree(U.parse_urdf(BALL_URDF, from_string=True))
    block = K.compile_tree(U.parse_urdf(BLOCK_URDF, from_string=True))
    kp = np.full(4, 40.0, np.float32)
    scene = compile_scene(SceneSpec(
        actors=[
            ActorSpec("biped", biped, pos=(0, 0, 1.6), fixed_base=False,
                      restitution=0.3, friction=0.6, stiffness=kp, damping=kp / 20),
            ActorSpec("block", block, pos=(0, 0, 0.25), fixed_base=True,
                      restitution=0.1, friction=0.8),
            ActorSpec("ball", ball, pos=(1.5, 0.05, 1.0), fixed_base=False,
                      restitution=1.3, friction=0.2),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    ))
    sim = Simulator(scene)
    sim._maybe_build_pallas(force=True)
    return sim


def test_floating_fused_art_static_parity(toy_on_block):
    """Dropping the floating biped ONTO a static block exercises the
    articulation-link-vs-static narrowphase in both paths: fused == XLA,
    and the biped rests ON the block (top z=0.5) instead of falling
    through to the ground plane."""
    sim = toy_on_block
    assert sim._fused_floating is not None
    B = 128
    state0 = sim.initial_state(B)
    nd = sim.scene.num_dofs
    tgt = jnp.zeros((B, nd))
    eff = jnp.zeros((B, nd))

    fused = jax.jit(sim._step_batched_pallas)
    xla = jax.jit(sim._step_vmapped)
    sf = sx = state0
    for _ in range(60):
        sf = fused(sf, tgt, eff)
        sx = xla(sx, tgt, eff)

    hum = sim.scene.articulations[0].actor_index
    np.testing.assert_allclose(np.asarray(sf.root[:, hum, 0:3]),
                               np.asarray(sx.root[:, hum, 0:3]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sf.dof_pos), np.asarray(sx.dof_pos),
                               atol=2e-2)
    # both paths: the biped is supported by the block (feet sphere r=0.08,
    # legs hang 0.64 below the base) — base z ~ 0.5 + 0.64 + 0.08 band,
    # far above the ground-support height (~0.72) minus the block... the
    # discriminating bound is that it does NOT reach the ground-plane
    # support height (it stands ~0.5 higher)
    assert float(np.asarray(sf.root[:, hum, 2]).min()) > 0.95
    assert float(np.asarray(sx.root[:, hum, 2]).min()) > 0.95
