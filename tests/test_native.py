"""Native C++ URDF parser equivalence vs the Python parser (N3)."""

import os

import numpy as np
import pytest

from isaacgym_tpu import native
from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.tasks.pingpong_common import ASSET_DIR

URDFS = [
    "g1_29dof_rev_1_0_pingpong_fixed_except_right_arm.urdf",
    "g1_27dof_pingpong.urdf",
    "pingpong_table.urdf",
    "small_ball.urdf",
]


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
@pytest.mark.parametrize("fname", URDFS)
def test_native_matches_python(fname):
    path = os.path.join(ASSET_DIR, fname)
    a = U.parse_urdf(path)
    b = native.parse_urdf_native(path)
    assert a.root == b.root
    assert a.link_names == b.link_names
    assert [j.name for j in a.joints] == [j.name for j in b.joints]
    for ja, jb in zip(a.joints, b.joints):
        assert ja.kind == jb.kind and ja.parent == jb.parent and ja.child == jb.child
        np.testing.assert_allclose(ja.xyz, jb.xyz, atol=1e-12)
        np.testing.assert_allclose(ja.rpy, jb.rpy, atol=1e-12)
        np.testing.assert_allclose(ja.axis, jb.axis, atol=1e-12)
        np.testing.assert_allclose([ja.lower, ja.upper, ja.effort, ja.velocity],
                                   [jb.lower, jb.upper, jb.effort, jb.velocity], atol=1e-9)
        np.testing.assert_allclose([ja.damping, ja.friction, ja.armature],
                                   [jb.damping, jb.friction, jb.armature], atol=1e-12)
    for name in a.link_names:
        la, lb = a.links[name], b.links[name]
        np.testing.assert_allclose(la.mass, lb.mass, atol=1e-12)
        np.testing.assert_allclose(la.com, lb.com, atol=1e-12)
        np.testing.assert_allclose(la.inertia, lb.inertia, atol=1e-12)
        assert len(la.geoms) == len(lb.geoms)
        for ga, gb in zip(la.geoms, lb.geoms):
            assert ga.kind == gb.kind
            np.testing.assert_allclose(ga.size, gb.size, atol=1e-12)
            np.testing.assert_allclose(ga.xyz, gb.xyz, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_error_reporting(tmp_path):
    bad = tmp_path / "bad.urdf"
    bad.write_text("<robot name='x'><link name='a'><inertial></robot>")
    with pytest.raises(ValueError):
        native.parse_urdf_native(str(bad))


# ---------------------------------------------------------------------------
# MJCF core (ig_parse_mjcf) equivalence vs models/mjcf.py
# ---------------------------------------------------------------------------

MJCF_RICH = """
<mujoco model="rich">
  <default>
    <joint damping="0.15" armature="0.02"/>
    <geom type="sphere" size="0.05"/>
    <default class="arm">
      <joint damping="0.3" actuatorfrcrange="-25 25"/>
      <default class="hand"><geom type="box" size="0.02 0.03 0.04"/></default>
    </default>
  </default>
  <worldbody>
    <body name="base" pos="0 0 0.9" quat="0.9659258 0 0 0.258819">
      <inertial mass="4.0" pos="0 0 -0.05"
                fullinertia="0.02 0.03 0.025 0.001 -0.002 0.0005"/>
      <geom type="box" size="0.1 0.12 0.2" pos="0 0 -0.02"/>
      <body name="upper" pos="0.05 0 0.1" euler="0 0.2 0">
        <joint name="shoulder" class="arm" type="hinge" axis="0 1 0"
               range="-1.2 1.7" pos="0.02 0 0"/>
        <inertial mass="1.1" pos="0.1 0 0" diaginertia="0.004 0.004 0.002"/>
        <geom type="capsule" fromto="0 0 0 0.22 0.02 -0.04" size="0.03 0"/>
        <body name="hand" pos="0.25 0 0">
          <joint name="wrist" class="arm" type="slide" axis="1 0 0"
                 limited="true" range="-0.05 0.05"/>
          <inertial mass="0.3" diaginertia="0.0005 0.0005 0.0005"/>
          <geom class="hand" pos="0.03 0 0"/>
        </body>
      </body>
    </body>
    <body name="ball">
      <freejoint/>
      <inertial mass="0.0027" diaginertia="7.2e-7 7.2e-7 7.2e-7"/>
      <geom type="sphere" size="0.02"/>
    </body>
  </worldbody>
</mujoco>
"""


def _assert_models_equal(a, b):
    assert a.name == b.name
    assert a.root == b.root
    assert a.link_names == b.link_names
    assert [j.name for j in a.joints] == [j.name for j in b.joints]
    for ja, jb in zip(a.joints, b.joints):
        assert ja.kind == jb.kind and ja.parent == jb.parent and ja.child == jb.child
        np.testing.assert_allclose(ja.xyz, jb.xyz, atol=1e-12)
        np.testing.assert_allclose(ja.rpy, jb.rpy, atol=1e-12)
        np.testing.assert_allclose(ja.axis, jb.axis, atol=1e-12)
        np.testing.assert_allclose([ja.lower, ja.upper, ja.effort, ja.velocity],
                                   [jb.lower, jb.upper, jb.effort, jb.velocity],
                                   atol=1e-9)
        np.testing.assert_allclose([ja.damping, ja.friction, ja.armature],
                                   [jb.damping, jb.friction, jb.armature],
                                   atol=1e-12)
    for name in a.link_names:
        la, lb = a.links[name], b.links[name]
        np.testing.assert_allclose(la.mass, lb.mass, atol=1e-12)
        np.testing.assert_allclose(la.com, lb.com, atol=1e-12)
        np.testing.assert_allclose(la.inertia, lb.inertia, atol=1e-12)
        assert len(la.geoms) == len(lb.geoms)
        for ga, gb in zip(la.geoms, lb.geoms):
            assert ga.kind == gb.kind
            np.testing.assert_allclose(ga.size, gb.size, atol=1e-12)
            np.testing.assert_allclose(ga.xyz, gb.xyz, atol=1e-12)
            np.testing.assert_allclose(ga.rpy, gb.rpy, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_mjcf_matches_python(tmp_path):
    """Rich doc: nested default classes, quat/euler frames, joint anchor,
    capsule fromto, slide joint, freejoint body, multiple top-level bodies,
    fullinertia — field-for-field equality with models/mjcf.py."""
    from isaacgym_tpu.models.mjcf import parse_mjcf
    p = tmp_path / "rich.xml"
    p.write_text(MJCF_RICH)
    _assert_models_equal(parse_mjcf(str(p)), native.parse_mjcf_native(str(p)))


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_mjcf_arm_doc(tmp_path):
    """The test_mjcf.ARM doc (defaults + chained hinges) round-trips too."""
    from isaacgym_tpu.models.mjcf import parse_mjcf
    from tests.test_mjcf import ARM
    p = tmp_path / "arm.xml"
    p.write_text(ARM)
    _assert_models_equal(parse_mjcf(str(p)), native.parse_mjcf_native(str(p)))


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_mjcf_error_reporting(tmp_path):
    bad = tmp_path / "bad.xml"
    bad.write_text("<mujoco model='x'><worldbody></mujoco>")
    with pytest.raises(ValueError):
        native.parse_mjcf_native(str(bad))


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_mjcf_fuzz_equivalence(tmp_path):
    """Randomized MJCF trees (depth, joint types, anchors, frames, geom mix)
    must parse identically through both cores."""
    from isaacgym_tpu.models.mjcf import parse_mjcf
    rng = np.random.RandomState(7)
    uid = [0]  # body names must be unique (duplicate names are invalid MJCF)

    def rand_body(depth, idx):
        name = f"b{depth}_{idx}_{uid[0]}"
        uid[0] += 1
        pos = " ".join(f"{v:.3f}" for v in rng.uniform(-0.3, 0.3, 3))
        frame = ""
        r = rng.rand()
        if r < 0.3:
            q = rng.uniform(-1, 1, 4)
            q /= np.linalg.norm(q)
            frame = f' quat="{q[0]:.4f} {q[1]:.4f} {q[2]:.4f} {q[3]:.4f}"'
        elif r < 0.5:
            e = rng.uniform(-0.5, 0.5, 3)
            frame = f' euler="{e[0]:.3f} {e[1]:.3f} {e[2]:.3f}"'
        joint = ""
        if depth > 0:
            jt = rng.choice(["hinge", "slide", "none"])
            if jt != "none":
                anchor = (f' pos="{rng.uniform(-0.1, 0.1):.3f} 0 0"'
                          if rng.rand() < 0.4 else "")
                rngstr = (f' range="{-rng.rand():.2f} {rng.rand():.2f}"'
                          if rng.rand() < 0.7 else "")
                joint = (f'<joint name="{name}_j" type="{jt}" axis="0 1 0"'
                         f'{anchor}{rngstr} damping="{rng.rand():.3f}"/>')
        g = rng.choice(["sphere", "box", "capsule", "none"])
        geom = ""
        if g == "sphere":
            geom = f'<geom type="sphere" size="{0.01 + rng.rand() * 0.05:.3f}"/>'
        elif g == "box":
            s = rng.uniform(0.01, 0.1, 3)
            geom = f'<geom type="box" size="{s[0]:.3f} {s[1]:.3f} {s[2]:.3f}"/>'
        elif g == "capsule":
            ft = rng.uniform(-0.2, 0.2, 6)
            geom = (f'<geom type="capsule" size="0.02 0" '
                    f'fromto="{" ".join(f"{v:.3f}" for v in ft)}"/>')
        kids = ""
        if depth < 3 and rng.rand() < 0.6:
            kids = "".join(rand_body(depth + 1, k)
                           for k in range(rng.randint(1, 3)))
        inertial = (f'<inertial mass="{0.1 + rng.rand():.3f}" '
                    f'pos="{rng.uniform(-0.05, 0.05):.3f} 0 0" '
                    f'diaginertia="0.01 0.01 0.005"/>')
        return (f'<body name="{name}" pos="{pos}"{frame}>'
                f'{inertial}{joint}{geom}{kids}</body>')

    for trial in range(25):
        xml = (f'<mujoco model="fuzz{trial}"><worldbody>'
               + rand_body(0, trial) + "</worldbody></mujoco>")
        p = tmp_path / f"fuzz{trial}.xml"
        p.write_text(xml)
        _assert_models_equal(parse_mjcf(str(p)), native.parse_mjcf_native(str(p)))
