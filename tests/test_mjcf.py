"""MJCF parser tests (N3: load_asset handles URDF and MJCF)."""

import numpy as np
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models.mjcf import parse_mjcf
from isaacgym_tpu.models import kinematics as K

ARM = """
<mujoco model="arm2">
  <default>
    <joint damping="0.1" armature="0.01"/>
    <default class="small"><geom type="sphere" size="0.03"/></default>
  </default>
  <worldbody>
    <body name="base" pos="0 0 1">
      <inertial mass="2.0" pos="0 0 0" diaginertia="0.01 0.01 0.01"/>
      <geom type="box" size="0.05 0.05 0.05"/>
      <body name="upper" pos="0 0 0">
        <joint name="shoulder" type="hinge" axis="0 1 0" range="-1.5 1.5"/>
        <inertial mass="1.0" pos="0 0 -0.15" diaginertia="0.005 0.005 0.001"/>
        <body name="lower" pos="0 0 -0.3">
          <joint name="elbow" type="hinge" axis="0 1 0" range="-2 2"/>
          <inertial mass="0.5" pos="0 0 -0.1" diaginertia="0.002 0.002 0.001"/>
          <geom class="small" pos="0 0 -0.2"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_parse_mjcf_structure():
    m = parse_mjcf(ARM, from_string=True)
    assert m.root == "base"
    assert m.link_names == ["base", "upper", "lower"]
    kinds = {j.name: j.kind for j in m.joints}
    assert kinds["shoulder"] == U.JOINT_REVOLUTE
    assert kinds["elbow"] == U.JOINT_REVOLUTE
    sh = next(j for j in m.joints if j.name == "shoulder")
    assert sh.damping == 0.1 and sh.armature == 0.01  # default class applied
    np.testing.assert_allclose(sh.axis, [0, 1, 0])
    assert sh.lower == -1.5 and sh.upper == 1.5
    # geom default class resolved (sphere r=0.03 on lower)
    g = m.links["lower"].geoms[0]
    assert g.kind == U.GEOM_SPHERE and g.size[0] == 0.03


def test_mjcf_compiles_and_fk():
    tree = K.compile_tree(parse_mjcf(ARM, from_string=True))
    assert tree.n_dof == 2
    states = K.fk_body_states(tree, jnp.zeros(3), jnp.asarray([0.0, 0, 0, 1.0]),
                              jnp.asarray([0.0, np.pi / 2]), jnp.zeros(2))
    # elbow at 90deg: lower link origin at (0,0,-0.3) then rotated geometry holds
    np.testing.assert_allclose(np.asarray(states[2, 0:3]), [0, 0, -0.3], atol=1e-6)


def test_mjcf_joint_anchor_shift():
    xml = """
    <mujoco model="anchor">
      <worldbody>
        <body name="base">
          <inertial mass="1" diaginertia="0.01 0.01 0.01"/>
          <body name="arm" pos="0 0 0">
            <joint name="j" type="hinge" axis="0 0 1" pos="0.1 0 0" range="-1 1"/>
            <inertial mass="1" pos="0.2 0 0" diaginertia="0.01 0.01 0.01"/>
          </body>
        </body>
      </worldbody>
    </mujoco>
    """
    m = parse_mjcf(xml, from_string=True)
    j = next(jj for jj in m.joints if jj.name == "j")
    np.testing.assert_allclose(j.xyz, [0.1, 0, 0])          # frame moved to anchor
    np.testing.assert_allclose(m.links["arm"].com, [0.1, 0, 0])  # com compensated
