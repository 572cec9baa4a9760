"""Articulation-vs-static-geom contacts (VERDICT r2 missing item 1).

PhysX gives the reference full-pair narrowphase: the paddle/arm is stopped
by the table and a fallen floating-base humanoid rests ON it
(/root/reference/tasks/humanoid_pingpong_3_actor_all_dof.py:470-640).
These tests drive the equivalent paths: a pendulum tip landing on a box
(fixed-base link vs static geom) and a C10 humanoid dropped over the table.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.sim.scene import (
    ActorSpec, PlaneParams, SceneSpec, compile_scene, DRIVE_POS,
)
from isaacgym_tpu.sim.simulator import Simulator

PENDULUM = """
<robot name="pend">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <link name="tip">
    <inertial><mass value="0.5"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
    <collision><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="swing" type="revolute">
    <origin xyz="0 0 0"/><parent link="base"/><child link="arm"/>
    <axis xyz="0 1 0"/><limit lower="-6.28" upper="6.28" effort="100" velocity="100"/>
  </joint>
  <joint name="tip_weld" type="fixed">
    <origin xyz="0 0 -1.0"/><parent link="arm"/><child link="tip"/>
  </joint>
</robot>
"""

BLOCK = """
<robot name="block">
  <link name="block">
    <inertial><mass value="10"/><inertia ixx="1" iyy="1" izz="1"/></inertial>
    <collision><origin xyz="0 0 0"/><geometry><box size="1.2 1.0 0.3"/></geometry></collision>
  </link>
</robot>
"""


def _run(sim, state, targets, steps):
    def body(s, _):
        return sim.step(s, targets, jnp.zeros_like(targets)), None
    state, _ = jax.lax.scan(body, state, None, length=steps)
    return state


def _pendulum_over_block():
    pend = K.compile_tree(U.parse_urdf(PENDULUM, from_string=True))
    block = K.compile_tree(U.parse_urdf(BLOCK, from_string=True))
    # pivot z=1.2, arm 1.0 -> hanging tip z=0.2; block top z=0.3: the swing
    # arc (tip z = 1.2 - cos q) crosses the top face at |q| ~ 31.8 deg, so a
    # damped swing must come to rest with the tip sphere ON the block
    spec = SceneSpec(
        actors=[
            ActorSpec("pend", pend, pos=(0.0, 0.0, 1.2), fixed_base=True,
                      restitution=0.0, friction=0.5, drive_mode=DRIVE_POS,
                      stiffness=np.zeros(1), damping=np.full(1, 0.8)),
            ActorSpec("block", block, pos=(0.0, 0.0, 0.15), fixed_base=True,
                      restitution=0.0, friction=0.5),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
    )
    return Simulator(compile_scene(spec))


def test_pendulum_tip_rests_on_block():
    sim = _pendulum_over_block()
    state = sim.initial_state(1)
    # start horizontal (q=pi/2): swings down onto the block
    state = state._replace(dof_pos=state.dof_pos.at[:, 0].set(np.pi / 2))
    state = _run(sim, state, jnp.zeros((1, 1)), 600)
    rb = sim.rigid_body_states(state)          # (1, bodies, 13)
    tip_idx = sim.scene.body_names.index("pend/tip")
    tip_z = float(rb[0, tip_idx, 2])
    # rest: tip sphere on the block top (0.3 + 0.05), NOT hanging at 0.2
    assert 0.32 < tip_z < 0.45, tip_z
    assert abs(float(state.dof_vel[0, 0])) < 0.5


def test_pendulum_tip_falls_through_without_narrowphase():
    os.environ["ISAACGYM_TPU_ART_STATIC"] = "0"
    try:
        sim = _pendulum_over_block()
        state = sim.initial_state(1)
        state = state._replace(dof_pos=state.dof_pos.at[:, 0].set(np.pi / 2))
        state = _run(sim, state, jnp.zeros((1, 1)), 600)
        rb = sim.rigid_body_states(state)
        tip_idx = sim.scene.body_names.index("pend/tip")
        # no narrowphase: settles hanging INSIDE the block (tip z = 0.2)
        assert float(rb[0, tip_idx, 2]) < 0.27
    finally:
        os.environ.pop("ISAACGYM_TPU_ART_STATIC", None)


def test_c10_humanoid_dropped_over_table_rests_on_it():
    """VERDICT r2 item 2's acceptance test: a floating-base G1 dropped over
    the table comes to rest ON the slab instead of sinking through it."""
    import isaacgym_tpu

    # drive the raw simulator (the task layer would reset on the fall latch)
    env = isaacgym_tpu.make(seed=2, task="HumanoidPingpongTiltNESSparse27DOFG1",
                            num_envs=2)
    sim = env.sim
    state = sim.initial_state(2)
    root = state.root
    # drop the humanoid from above the table (slab top z=0.76)
    root = root.at[:, 0, 0:3].set(jnp.asarray([1.2, 0.0, 1.6]))
    root = root.at[:, 0, 7:13].set(0.0)
    state = state._replace(root=root)
    targets = state.dof_pos  # hold the initial pose under PD

    def body(s, _):
        return sim.step(s, targets, jnp.zeros_like(targets)), s.root[:, 0, 2]

    state, zs = jax.lax.scan(body, state, None, length=300)
    zs = np.asarray(zs)

    # every env's pelvis stays near/above the slab top (0.76) for the whole
    # last second — clearly separated from a fall to the ground plane
    # (pelvis z ~ 0.1-0.3); the crumpled body may still be settling slowly
    tail = zs[-120:]
    assert float(tail.min()) > 0.70, float(tail.min())
    assert float(np.abs(tail[-1] - tail[0]).max()) < 0.3
