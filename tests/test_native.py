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
