"""Batched quaternion / rotation math for the TPU-native framework.

TPU-first re-implementation of the capability surface of
``isaacgymenvs.utils.torch_jit_utils`` as consumed by the reference tasks
(wildcard import at /root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:38;
heavy hitters per SURVEY.md §2 N8: my_quat_rotate, calc_heading_quat(_inv),
quat_mul, quat_conjugate, exp_map_to_quat, quat_to_tan_norm, quat_to_angle_axis).

Everything is pure ``jnp`` over arbitrary leading batch dimensions; the
quaternion layout is **xyzw** to match the reference's root-state layout
contract (pos(3) + quat(4, xyzw) + linvel(3) + angvel(3); see
/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:177-187).

All functions are shape-polymorphic in the batch dims: ``q`` is ``(..., 4)``,
``v`` is ``(..., 3)``.  No host round trips, no data-dependent control flow —
safe to call inside ``jit`` / ``vmap`` / ``scan``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Construction / normalization
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    """Identity quaternion(s) with the given leading batch shape."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_unit(q):
    """Normalize a quaternion to unit length."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_from_angle_axis(angle, axis):
    """Quaternion from rotation ``angle`` (rad) about unit-ish ``axis``."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = 0.5 * angle
    xyz = axis * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw):
    """Quaternion from intrinsic x-y-z (roll, pitch, yaw) Euler angles."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    w = cr * cp * cy + sr * sp * sy
    return jnp.stack([x, y, z, w], axis=-1)


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    """Hamilton product a*b, xyzw layout (reference N8 ``quat_mul``)."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) ``v`` by quaternion(s) ``q`` (reference ``my_quat_rotate``).

    Uses the 2-cross-product expansion: v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inverse(q, v):
    """Rotate ``v`` by the inverse of ``q``."""
    u = -q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


# alias matching the reference symbol name
my_quat_rotate = quat_rotate


def quat_apply(q, v):
    return quat_rotate(q, v)


def quat_to_rotmat(q):
    """(..., 4) xyzw -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(m):
    """(..., 3, 3) -> (..., 4) xyzw. Branch-free Shepperd-style selection."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quaternions (unnormalized)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # pick the candidate with the largest pivot for numerical stability
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, wxyz)
    q_wxyz = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
    return quat_unit(q_xyzw)


# ---------------------------------------------------------------------------
# Heading (yaw-only) decomposition — used by all observation builders
# ---------------------------------------------------------------------------

def calc_heading(q):
    """Yaw heading angle of ``q``: the direction the rotated x-axis points in
    the world x-y plane (matches reference ``calc_heading``)."""
    ref_dir = jnp.zeros(q.shape[:-1] + (3,)).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q):
    """Pure-yaw quaternion with the same heading as ``q``."""
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q):
    """Inverse of the heading quaternion (rotates world into heading-local)."""
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


# ---------------------------------------------------------------------------
# Exp-map / tan-norm / angle-axis — imitation-obs helpers
# ---------------------------------------------------------------------------

def exp_map_to_quat(exp_map):
    """Exponential map (axis*angle, (...,3)) -> quaternion (...,4 xyzw)."""
    angle = jnp.linalg.norm(exp_map, axis=-1)
    safe = jnp.maximum(angle, _EPS)
    axis = exp_map / safe[..., None]
    # default axis for ~zero rotations
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    axis = jnp.where(angle[..., None] > _EPS, axis, default_axis)
    return quat_from_angle_axis(angle, axis)


def quat_to_angle_axis(q):
    """Quaternion -> (angle (...,), axis (...,3)). Angle in [0, 2*pi)."""
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    angle = normalize_angle(angle)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    axis = q[..., 0:3] / jnp.maximum(sin_half, _EPS)[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    axis = jnp.where(sin_half[..., None] > 1e-5, axis, default_axis)
    return angle, axis


def quat_to_exp_map(q):
    angle, axis = quat_to_angle_axis(q)
    return angle[..., None] * axis


def quat_to_tan_norm(q):
    """Quaternion -> 6D tangent-normal representation (rotated x and z axes)."""
    ref_tan = jnp.zeros(q.shape[:-1] + (3,)).at[..., 0].set(1.0)
    ref_norm = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


# ---------------------------------------------------------------------------
# Scalar helpers
# ---------------------------------------------------------------------------

def normalize_angle(x):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def scale(x, lower, upper):
    """[-1, 1] action -> [lower, upper] (reference ``scale``)."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale(x, lower, upper):
    """[lower, upper] -> [-1, 1] (reference ``unscale``)."""
    return (2.0 * x - upper - lower) / (upper - lower)


def tensor_clamp(x, lower, upper):
    return jnp.clip(x, lower, upper)


def get_axis_params(value, axis_idx, x_value=0.0, n_dims=3):
    """Vector with ``value`` on ``axis_idx`` and ``x_value`` elsewhere-on-x."""
    v = [x_value if i == 0 else 0.0 for i in range(n_dims)]
    v[axis_idx] = value
    return jnp.asarray(v, dtype=jnp.float32)


def rand_float(key, lower, upper, shape):
    """Uniform floats in [lower, upper) (reference ``torch_rand_float``,
    used e.g. at /root/reference/tasks/humanoid_pingpong.py:535). JAX-native:
    takes an explicit PRNG ``key`` instead of a device string."""
    import jax
    return jax.random.uniform(key, shape, minval=lower, maxval=upper,
                              dtype=jnp.float32)


torch_rand_float = rand_float


def to_jnp(x, dtype=jnp.float32):
    """Array constructor (reference ``to_torch``; 105 uses per SURVEY §2 N8)."""
    return jnp.asarray(x, dtype=dtype)


def get_euler_xyz(q):
    """Quaternion (xyzw) -> intrinsic XYZ euler angles (roll, pitch, yaw).

    Intentional range deviation: the upstream ``torch_jit_utils`` helper
    returns angles mod 2*pi in [0, 2*pi); here each angle is wrapped to
    (-pi, pi]. Every reference consumption site re-applies
    ``normalize_angle`` (idempotent), so the observable obs/reward values
    are identical — only the raw range differs."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = 1.0 - 2.0 * (qx * qx + qy * qy)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = 1.0 - 2.0 * (qy * qy + qz * qz)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return normalize_angle(roll), normalize_angle(pitch), normalize_angle(yaw)


def compute_heading_and_up(torso_rotation, inv_start_rot, to_target,
                           vec0, vec1, up_idx):
    """NV-humanoid heading/up decomposition (imported by the reference tasks
    via the torch_jit_utils wildcard, /root/reference/tasks/humanoid_pingpong.py:42;
    consumed by the kept NV obs at :816-851).

    Returns (torso_quat, up_proj, heading_proj, up_vec, heading_vec)."""
    target_dirs = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), _EPS)
    torso_quat = quat_mul(torso_rotation, inv_start_rot)
    up_vec = quat_rotate(torso_quat, vec1)
    heading_vec = quat_rotate(torso_quat, vec0)
    up_proj = up_vec[..., up_idx]
    heading_proj = jnp.sum(heading_vec * target_dirs, axis=-1)
    return torso_quat, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(torso_quat, velocity, ang_velocity, targets, torso_positions):
    """Local-frame velocities + euler + angle-to-target (NV humanoid obs
    companion of :func:`compute_heading_and_up`)."""
    vel_loc = quat_rotate_inverse(torso_quat, velocity)
    angvel_loc = quat_rotate_inverse(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    walk_target_angle = jnp.arctan2(
        targets[..., 2] - torso_positions[..., 2],
        targets[..., 0] - torso_positions[..., 0])
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


def slerp(q0, q1, t):
    """Spherical linear interpolation between unit quaternions (xyzw)."""
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0.0, -q1, q1)
    cos_half = jnp.abs(cos_half)
    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    ratio_a = jnp.where(sin_half > 1e-5, jnp.sin((1.0 - t) * half) / jnp.maximum(sin_half, _EPS), 1.0 - t)
    ratio_b = jnp.where(sin_half > 1e-5, jnp.sin(t * half) / jnp.maximum(sin_half, _EPS), t)
    return quat_unit(ratio_a * q0 + ratio_b * q1)
