"""Unit tests for the rotation library against closed-form cases.

Mirrors the test strategy designed in SURVEY.md §4 (the reference ships no
tests; quaternion ops are validated against analytic ground truth here).
"""

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.utils import rotations as rot


def rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_identity_rotate():
    q = rot.quat_identity((5,))
    v = jnp.asarray(np.random.RandomState(1).randn(5, 3).astype(np.float32))
    np.testing.assert_allclose(rot.quat_rotate(q, v), v, atol=1e-6)


def test_quat_mul_matches_rotmat():
    a, b = rand_quats(16, 2), rand_quats(16, 3)
    ab = rot.quat_mul(a, b)
    Ra, Rb, Rab = rot.quat_to_rotmat(a), rot.quat_to_rotmat(b), rot.quat_to_rotmat(ab)
    np.testing.assert_allclose(np.asarray(Ra @ Rb), np.asarray(Rab), atol=1e-5)


def test_rotate_matches_rotmat():
    q = rand_quats(32, 4)
    v = jnp.asarray(np.random.RandomState(5).randn(32, 3).astype(np.float32))
    out = rot.quat_rotate(q, v)
    R = rot.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(out), np.einsum("bij,bj->bi", np.asarray(R), np.asarray(v)), atol=1e-5)


def test_conjugate_inverts():
    q = rand_quats(8, 6)
    v = jnp.asarray(np.random.RandomState(7).randn(8, 3).astype(np.float32))
    back = rot.quat_rotate(rot.quat_conjugate(q), rot.quat_rotate(q, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)
    inv = rot.quat_rotate_inverse(q, rot.quat_rotate(q, v))
    np.testing.assert_allclose(np.asarray(inv), np.asarray(v), atol=1e-5)


def test_angle_axis_roundtrip():
    angle = jnp.asarray([0.3, 1.2, -2.0, 0.0], dtype=jnp.float32)
    axis = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]], dtype=jnp.float32)
    q = rot.quat_from_angle_axis(angle, axis)
    a2, ax2 = rot.quat_to_angle_axis(q)
    # angle-axis is sign-ambiguous: compare exp maps
    np.testing.assert_allclose(
        np.asarray(a2[..., None] * ax2), np.asarray(angle[..., None] * axis), atol=1e-5
    )


def test_exp_map_roundtrip():
    # roundtrip is only identity for the canonical representative (angle < pi)
    raw = np.random.RandomState(9).randn(20, 3).astype(np.float32)
    raw = raw / np.maximum(np.linalg.norm(raw, axis=-1, keepdims=True), 1e-9)
    em = jnp.asarray(raw * np.random.RandomState(10).uniform(0, 3.0, (20, 1)).astype(np.float32))
    q = rot.exp_map_to_quat(em)
    back = rot.quat_to_exp_map(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(em), atol=1e-4)


def test_heading_quat_90deg_yaw():
    # yaw of pi/2 about z: x axis -> y axis
    q = rot.quat_from_angle_axis(jnp.asarray(np.pi / 2, dtype=jnp.float32), jnp.asarray([0.0, 0.0, 1.0]))
    h = rot.calc_heading(q)
    np.testing.assert_allclose(float(h), np.pi / 2, atol=1e-5)
    # heading-inverse maps the rotated x axis back to world x
    hq_inv = rot.calc_heading_quat_inv(q)
    x_rot = rot.quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    back = rot.quat_rotate(hq_inv, x_rot)
    np.testing.assert_allclose(np.asarray(back), [1.0, 0.0, 0.0], atol=1e-5)


def test_heading_ignores_tilt():
    # compose yaw(0.7) then roll(0.4): heading should still be 0.7
    yaw = rot.quat_from_angle_axis(jnp.asarray(0.7, dtype=jnp.float32), jnp.asarray([0.0, 0.0, 1.0]))
    roll = rot.quat_from_angle_axis(jnp.asarray(0.4, dtype=jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    q = rot.quat_mul(yaw, roll)
    np.testing.assert_allclose(float(rot.calc_heading(q)), 0.7, atol=1e-5)


def test_euler_xyz():
    q = rot.quat_from_euler_xyz(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(np.pi / 2))
    # pure yaw: (0,0,sin(pi/4),cos(pi/4))
    np.testing.assert_allclose(np.asarray(q), [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-6)


def test_rotmat_quat_roundtrip():
    q = rand_quats(64, 11)
    q2 = rot.rotmat_to_quat(rot.quat_to_rotmat(q))
    # sign ambiguity: q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_tan_norm():
    q = rot.quat_from_angle_axis(jnp.asarray(np.pi / 2, dtype=jnp.float32), jnp.asarray([0.0, 0.0, 1.0]))
    tn = rot.quat_to_tan_norm(q)
    np.testing.assert_allclose(np.asarray(tn), [0, 1, 0, 0, 0, 1], atol=1e-6)


def test_scale_unscale():
    lo, hi = jnp.asarray(-2.0), jnp.asarray(6.0)
    x = jnp.linspace(-1, 1, 11)
    s = rot.scale(x, lo, hi)
    assert float(s[0]) == -2.0 and float(s[-1]) == 6.0
    np.testing.assert_allclose(np.asarray(rot.unscale(s, lo, hi)), np.asarray(x), atol=1e-6)


def test_normalize_angle():
    x = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.2])
    out = np.asarray(rot.normalize_angle(x))
    np.testing.assert_allclose(out, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.2], atol=1e-5)


def test_jit_and_vmap_compatible():
    q = rand_quats(8, 13)
    v = jnp.ones((8, 3))
    out = jax.jit(rot.quat_rotate)(q, v)
    out2 = jax.vmap(rot.quat_rotate)(q, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_slerp_endpoints():
    a, b = rand_quats(4, 20), rand_quats(4, 21)
    np.testing.assert_allclose(np.asarray(rot.slerp(a, b, 0.0)), np.asarray(a), atol=1e-5)
    s1 = np.asarray(rot.slerp(a, b, 1.0))
    dot = np.abs(np.sum(s1 * np.asarray(b), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rand_float_bounds_and_determinism():
    k = jax.random.PRNGKey(7)
    x = rot.torch_rand_float(k, -0.2, 0.2, (64, 7))
    assert x.shape == (64, 7) and x.dtype == jnp.float32
    assert float(x.min()) >= -0.2 and float(x.max()) < 0.2
    np.testing.assert_array_equal(np.asarray(x),
                                  np.asarray(rot.rand_float(k, -0.2, 0.2, (64, 7))))


def test_get_euler_xyz_roundtrip():
    rpy = (jnp.asarray(0.3), jnp.asarray(-0.7), jnp.asarray(1.9))
    q = rot.quat_from_euler_xyz(*rpy)
    r, p, y = rot.get_euler_xyz(q)
    np.testing.assert_allclose([float(r), float(p), float(y)],
                               [0.3, -0.7, 1.9], atol=1e-5)


def test_compute_heading_and_up_rot():
    """Yawed torso: heading vector rotates with yaw; up stays +z; compute_rot
    maps world velocity into the torso frame and reports the yaw."""
    yaw = jnp.asarray([0.9])
    q = rot.quat_from_angle_axis(yaw, jnp.asarray([0.0, 0.0, 1.0]))
    inv_start = rot.quat_identity((1,))
    to_target = jnp.asarray([[1.0, 0.0, 0.0]])
    vec0 = jnp.asarray([[1.0, 0.0, 0.0]])
    vec1 = jnp.asarray([[0.0, 0.0, 1.0]])
    tq, up_proj, heading_proj, up_vec, heading_vec = rot.compute_heading_and_up(
        q, inv_start, to_target, vec0, vec1, 2)
    np.testing.assert_allclose(float(up_proj[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(heading_proj[0]), float(jnp.cos(yaw[0])), atol=1e-5)
    vel = jnp.asarray([[2.0, 0.0, 0.0]])
    vel_loc, angvel_loc, r, p, y, ang2t = rot.compute_rot(
        tq, vel, vel, to_target * 5.0, jnp.zeros((1, 3)))
    np.testing.assert_allclose(float(y[0]), 0.9, atol=1e-5)
    # local x-velocity = |v| cos(yaw), local y = -|v| sin(yaw)
    np.testing.assert_allclose(np.asarray(vel_loc[0]),
                               [2 * np.cos(0.9), -2 * np.sin(0.9), 0.0], atol=1e-5)
    np.testing.assert_allclose(float(ang2t[0]), -0.9, atol=1e-5)
