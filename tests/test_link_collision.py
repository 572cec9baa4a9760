"""Opt-in articulation-link vs articulation-link narrowphase
(``SceneSpec.link_collision`` — VERDICT r3 item 5).

PhysX gives the reference full-pair filtering via ``create_actor(...,
group, filter)`` (/root/reference/tasks/humanoid_pingpong_4_actor_tilt.py:554-640);
the reference scenes never exercise link-link contact (the two C8 humanoids'
bases are 3.5 m apart vs ~1 m arm reach, and the filter bits disable
self-collision), so the capability is opt-in here, default off.

Scenarios:
- two fixed-base pendulums whose tips share a swing arc: with the flag the
  moving tip knocks the resting one (momentum transfer across articulations);
  without it they pass through;
- one robot with two sibling arms folding inward: the tips collide through
  the SHARED mass matrix (relative-Jacobian path);
- the C8 two-humanoid scene: every cross-articulation pair is pruned at
  build time (bases out of reach) — documenting the reference geometry.
"""

import numpy as np
import jax
import jax.numpy as jnp

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
    <collision><geometry><sphere radius="0.06"/></geometry></collision>
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

TWO_ARMS = """
<robot name="twoarms">
  <link name="base"><inertial><mass value="5"/><inertia ixx="0.5" iyy="0.5" izz="0.5"/></inertial></link>
  <link name="armL">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <link name="tipL">
    <inertial><mass value="0.5"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
    <collision><geometry><sphere radius="0.06"/></geometry></collision>
  </link>
  <link name="armR">
    <inertial><origin xyz="0 0 -0.5"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <link name="tipR">
    <inertial><mass value="0.5"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
    <collision><geometry><sphere radius="0.06"/></geometry></collision>
  </link>
  <joint name="swingL" type="revolute">
    <origin xyz="-0.4 0 0"/><parent link="base"/><child link="armL"/>
    <axis xyz="0 1 0"/><limit lower="-6.28" upper="6.28" effort="100" velocity="100"/>
  </joint>
  <joint name="weldL" type="fixed">
    <origin xyz="0 0 -1.0"/><parent link="armL"/><child link="tipL"/>
  </joint>
  <joint name="swingR" type="revolute">
    <origin xyz="0.4 0 0"/><parent link="base"/><child link="armR"/>
    <axis xyz="0 1 0"/><limit lower="-6.28" upper="6.28" effort="100" velocity="100"/>
  </joint>
  <joint name="weldR" type="fixed">
    <origin xyz="0 0 -1.0"/><parent link="armR"/><child link="tipR"/>
  </joint>
</robot>
"""


def _run(sim, state, targets, steps):
    def body(s, _):
        return sim.step(s, targets, jnp.zeros_like(targets)), None
    state, _ = jax.lax.scan(body, state, None, length=steps)
    return state


def _two_pendulums(link_collision):
    pend = K.compile_tree(U.parse_urdf(PENDULUM, from_string=True))
    spec = SceneSpec(
        actors=[
            ActorSpec("pendA", pend, pos=(0.0, 0.0, 1.5), fixed_base=True,
                      restitution=0.3, friction=0.3, drive_mode=DRIVE_POS,
                      stiffness=np.zeros(1), damping=np.zeros(1)),
            ActorSpec("pendB", pend, pos=(0.35, 0.0, 1.5), fixed_base=True,
                      restitution=0.3, friction=0.3, drive_mode=DRIVE_POS,
                      stiffness=np.zeros(1), damping=np.zeros(1)),
        ],
        plane=PlaneParams(), dt=1 / 120, substeps=2,
        link_collision=link_collision,
    )
    return Simulator(compile_scene(spec))


def _swing_into_neighbor(link_collision):
    sim = _two_pendulums(link_collision)
    state = sim.initial_state(batch=1)
    # pendulum A swings toward +x; its tip arc passes within 0.06 m of
    # B's resting tip (|pivotA - tipB| = sqrt(.35^2+1) = 1.0595, arm 1.0,
    # sum of tip radii 0.12) -> contact mid-swing
    state = state._replace(dof_vel=state.dof_vel.at[0, 0].set(-4.0))
    targets = jnp.zeros((1, 2))

    def body(s, _):
        s2 = sim.step(s, targets, jnp.zeros_like(targets))
        return s2, s2.net_contact_force[0]
    out, ncf_steps = jax.lax.scan(body, state, None, length=30)
    return sim, np.asarray(ncf_steps), out


def test_cross_articulation_tips_collide():
    sim, ncf_steps, out = _swing_into_neighbor(True)
    assert len(sim._art_art_pairs) == 1
    # momentum transferred: the resting pendulum is swinging afterwards
    assert float(jnp.abs(out.dof_vel[0, 1])) > 0.5
    assert float(jnp.abs(out.dof_pos[0, 1])) > 0.1
    # the strike step records equal/opposite ncf on the two tip bodies
    mags = np.linalg.norm(ncf_steps[:, 2], axis=-1)
    hit = int(np.argmax(mags))
    assert mags[hit] > 10.0
    np.testing.assert_allclose(ncf_steps[hit, 2], -ncf_steps[hit, 5], rtol=1e-5)


def test_without_flag_tips_pass_through():
    sim, ncf_steps, out = _swing_into_neighbor(False)
    assert sim._art_art_pairs == []
    # no contact: the neighbor never moves, no ncf anywhere
    assert float(jnp.abs(out.dof_vel[0, 1])) < 1e-5
    assert float(np.abs(ncf_steps[:, [2, 5]]).max()) == 0.0


def test_sibling_arms_same_articulation_collide():
    robot = K.compile_tree(U.parse_urdf(TWO_ARMS, from_string=True))
    spec = SceneSpec(
        actors=[ActorSpec("bot", robot, pos=(0.0, 0.0, 1.5), fixed_base=True,
                          restitution=0.2, friction=0.3, drive_mode=DRIVE_POS,
                          stiffness=np.zeros(2), damping=np.zeros(2))],
        plane=PlaneParams(), dt=1 / 120, substeps=2, link_collision=True,
    )
    sim = Simulator(compile_scene(spec))
    assert len(sim._art_art_pairs) >= 1
    state = sim.initial_state(batch=1)
    # fold both arms inward: tips approach each other at the centerline
    state = state._replace(
        dof_vel=state.dof_vel.at[0, 0].set(-3.0).at[0, 1].set(3.0))
    targets = jnp.zeros((1, 2))
    out = _run(sim, state, targets, 60)
    q = np.asarray(out.dof_pos[0])
    # without collision the arms would fold past each other (|q| keeps
    # growing past the crossing angle ~0.34 rad + reach); with it the tips
    # block each other near the centerline
    # tip x-positions: R_y(q) maps the arm (0,0,-1) to (-sin q, 0, -cos q)
    xL = -0.4 - np.sin(q[0])
    xR = 0.4 - np.sin(q[1])
    assert xL <= xR + 0.13, f"tips interpenetrated: xL={xL:.3f} xR={xR:.3f}"


def test_c8_cross_pairs_pruned_out_of_reach():
    from isaacgym_tpu.utils.config import load_task_config
    from isaacgym_tpu.tasks.pingpong_common import build_pingpong_scene
    cfg = load_task_config("Humanoid12PingpongTiltG1")
    cfg["env"]["scene"]["linkCollision"] = True
    spec = build_pingpong_scene(cfg["env"], cfg["sim"], humanoids=2)
    assert spec.link_collision
    sim = Simulator(compile_scene(spec))
    cross = [(a, b) for a, b in sim._art_art_pairs if a["art"] != b["art"]]
    # the reference C8 geometry: bases 3.5 m apart vs ~1 m reach — every
    # cross-humanoid pair is provably unreachable and pruned at build time
    assert cross == []
