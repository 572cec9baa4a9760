"""Opt-in support-function link narrowphase (``SceneSpec.exact_link_support``).

The default art-vs-static narrowphase bounds each link geom by a sphere, so
a squat paddle cylinder (R = 80 mm, half-thickness 7.5 mm) "contacts" the
table whenever its center is within 80 mm of the slab — it can never skim
the surface. With the flag, the distance along the contact normal uses the
geom's SUPPORT extent (|n.a| hl + |n x a| R for a cylinder; sum |n.e_i| h_i
for a box) — exact for the face-dominated contacts the scenes exercise.
Default OFF this round: the in-flight flagship learning evidence must stay
on unchanged physics (docs/PARITY.md).
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

# a 1-dof arm whose distal weld carries a SQUAT CYLINDER (flat paddle),
# axis z in the geom frame = world z when the arm hangs at q=0
ARM = """
<robot name="arm">
  <link name="base"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link>
  <link name="rod">
    <inertial><origin xyz="0 0 -0.25"/><mass value="1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.001"/></inertial>
  </link>
  <link name="pad">
    <inertial><mass value="0.2"/><inertia ixx="0.001" iyy="0.001" izz="0.001"/></inertial>
    <collision><geometry><cylinder radius="0.08" length="0.015"/></geometry></collision>
  </link>
  <joint name="slide" type="prismatic">
    <origin xyz="0 0 0"/><parent link="base"/><child link="rod"/>
    <axis xyz="0 0 1"/><limit lower="-1.0" upper="1.0" effort="100" velocity="10"/>
  </joint>
  <joint name="pad_weld" type="fixed">
    <origin xyz="0 0 -0.5"/><parent link="rod"/><child link="pad"/>
  </joint>
</robot>
"""

BLOCK = """
<robot name="block">
  <link name="block">
    <inertial><mass value="10"/><inertia ixx="1" iyy="1" izz="1"/></inertial>
    <collision><geometry><box size="1.0 1.0 0.2"/></geometry></collision>
  </link>
</robot>
"""


def _sim(exact):
    from isaacgym_tpu.tasks.pingpong_common import load_tree
    arm = K.compile_tree(U.parse_urdf(ARM, from_string=True))
    block = K.compile_tree(U.parse_urdf(BLOCK, from_string=True))
    ball = load_tree("small_ball.urdf")
    spec = SceneSpec(
        actors=[
            # pad rest height = 1.0 - 0.5 = 0.5; block top = 0.2
            ActorSpec("arm", arm, pos=(0.0, 0.0, 1.0), fixed_base=True,
                      restitution=0.0, friction=0.4, drive_mode=DRIVE_POS,
                      stiffness=np.zeros(1), damping=np.full(1, 2.0)),
            ActorSpec("block", block, pos=(0.0, 0.0, 0.1), fixed_base=True,
                      restitution=0.0, friction=0.4),
            # a parked ball makes the scene qualify for the fused kernel
            ActorSpec("ball", ball, pos=(5.0, 5.0, 0.02), fixed_base=False,
                      restitution=0.5, friction=0.3),
        ],
        plane=PlaneParams(), gravity=(0.0, 0.0, -9.81),
        dt=1 / 120, substeps=2, exact_link_support=exact,
    )
    return Simulator(compile_scene(spec))


def _settle(sim, steps=300):
    state = sim.initial_state(batch=1)
    targets = jnp.full((1, 1), -1.0)     # drive the pad down onto the block

    def body(s, _):
        return sim.step(s, targets, jnp.zeros((1, 1))), None
    state, _ = jax.lax.scan(body, state, None, length=steps)
    # pad center height = 1.0 + q - 0.5
    return 0.5 + float(state.dof_pos[0, 0])


def test_flat_paddle_rests_at_support_height():
    # support narrowphase: flat cylinder (axis ~z) rests half_len above the
    # block top (0.2 + 0.0075), not bounding-radius above (0.2 + 0.08)
    h = _settle(_sim(True))
    assert abs(h - (0.2 + 0.0075)) < 0.01, f"rest height {h:.4f}"


def test_bounding_sphere_default_rests_high():
    h = _settle(_sim(False))
    assert abs(h - (0.2 + 0.08)) < 0.015, f"rest height {h:.4f}"


def test_fused_kernel_honors_flag():
    sim = _sim(True)
    sim._maybe_build_pallas(force=True)
    # prismatic single-art scene qualifies for the fused substep; both paths
    # must agree on the support-corrected rest height
    if sim._fused is None:
        import pytest
        pytest.skip("scene does not qualify for the fused kernel")
    state = sim.initial_state(batch=128)
    targets = jnp.full((128, 1), -1.0)

    def body(s, _):
        return sim._step_batched_pallas(s, targets, jnp.zeros((128, 1))), None
    state, _ = jax.lax.scan(body, state, None, length=300)
    h = 0.5 + float(state.dof_pos[0, 0])
    assert abs(h - (0.2 + 0.0075)) < 0.01, f"fused rest height {h:.4f}"
