"""Contact geometry + impulse resolution for the pingpong scene family.

TPU-native replacement for PhysX's contact pipeline (SURVEY.md §2 N1) scoped
to the contact pairs the reference tasks actually exercise (SURVEY.md §7):
sphere(ball) vs plane(ground), vs box(table top / net), vs cylinder-disc
(paddle face), vs sphere (hands), plus articulation geoms vs ground for
floating-base humanoids. There is no broadphase: the pair list is static at
compile time and every pair is evaluated every substep — branch-free,
vectorized, fused by XLA.

Impulse model (velocity level, PhysX-like):
  * restitution with a bounce-velocity threshold
    (``bounce_threshold_velocity`` in the reference sim params,
    /root/reference/cfg/task/HumanoidPingpongTiltNoEarlyStopG1.yaml:96),
  * Coulomb friction clamped by mu * normal impulse,
  * positional projection to remove penetration.

All functions are single-env and vmapped by the simulator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from isaacgym_tpu.utils import rotations as rot

_EPS = 1e-9


class ContactFrame(NamedTuple):
    """Signed distance + frame of a sphere-vs-geom candidate."""
    dist: jnp.ndarray     # signed separation (negative = penetrating)
    normal: jnp.ndarray   # (3,) unit, pushes the sphere out of the geom
    point: jnp.ndarray    # (3,) contact point on the sphere surface


def sphere_plane(center, radius, plane_z=0.0):
    """Sphere vs horizontal ground plane z = plane_z, normal +z."""
    dist = center[..., 2] - plane_z - radius
    n = jnp.zeros_like(center).at[..., 2].set(1.0)
    point = center - n * radius
    return ContactFrame(dist, n, point)


def sphere_box(center, radius, box_pos, box_quat, half_extents):
    """Sphere vs oriented box (table top/net). Closest-point formulation."""
    c_local = rot.quat_rotate_inverse(box_quat, center - box_pos)
    closest = jnp.clip(c_local, -half_extents, half_extents)
    d = c_local - closest
    out_dist = jnp.linalg.norm(d, axis=-1)
    # center inside the box: push toward the nearest face
    gap = half_extents - jnp.abs(c_local)
    axis = jnp.argmin(gap, axis=-1)
    sign = jnp.sign(c_local)
    inside_n = jnp.zeros_like(c_local).at[axis].set(jnp.where(sign[axis] == 0, 1.0, sign[axis]))
    inside_dist = -gap[axis]
    outside = out_dist > _EPS
    n_local = jnp.where(outside, d / jnp.maximum(out_dist, _EPS), inside_n)
    dist = jnp.where(outside, out_dist, inside_dist) - radius
    n = rot.quat_rotate(box_quat, n_local)
    point = center - n * radius
    return ContactFrame(dist, n, point)


def sphere_cylinder(center, radius, cyl_pos, cyl_quat, cyl_radius, half_len):
    """Sphere vs cylinder (paddle blade: squat cylinder, axis = local z)."""
    c = rot.quat_rotate_inverse(cyl_quat, center - cyl_pos)
    r_xy = jnp.linalg.norm(c[..., :2], axis=-1)
    # closest point on the solid cylinder
    scale = jnp.minimum(1.0, cyl_radius / jnp.maximum(r_xy, _EPS))
    closest = jnp.concatenate([c[..., :2] * scale,
                               jnp.clip(c[..., 2:3], -half_len, half_len)], axis=-1)
    d = c - closest
    out_dist = jnp.linalg.norm(d, axis=-1)
    outside = out_dist > _EPS
    # inside: exit through nearest of (flat face, lateral wall)
    face_gap = half_len - jnp.abs(c[..., 2])
    wall_gap = cyl_radius - r_xy
    z_sign = jnp.where(c[..., 2] >= 0, 1.0, -1.0)
    n_face = jnp.concatenate([jnp.zeros_like(c[..., :2]), z_sign[..., None]], axis=-1)
    radial = c[..., :2] / jnp.maximum(r_xy, _EPS)
    n_wall = jnp.concatenate([radial, jnp.zeros_like(c[..., 2:3])], axis=-1)
    use_face = face_gap < wall_gap
    inside_n = jnp.where(use_face, n_face, n_wall)
    inside_dist = -jnp.minimum(face_gap, wall_gap)
    n_local = jnp.where(outside, d / jnp.maximum(out_dist, _EPS), inside_n)
    dist = jnp.where(outside, out_dist, inside_dist) - radius
    n = rot.quat_rotate(cyl_quat, n_local)
    point = center - n * radius
    return ContactFrame(dist, n, point)


def sphere_sphere(center, radius, other_pos, other_radius):
    d = center - other_pos
    dn = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dn, _EPS)
    dist = dn - other_radius - radius
    point = center - n * radius
    return ContactFrame(dist, n, point)


def resolve_sphere_impulse(v_ball, frame: ContactFrame, v_surf,
                           restitution, friction, bounce_threshold=0.2,
                           dt=0.0):
    """Velocity change of a unit-mass-scaled free sphere against a
    kinematic/static surface.

    ``dt`` > 0 enables SPECULATIVE activation (PhysX's default CCD mode):
    the contact fires when the sphere will cross the surface within the
    substep (dist + vn dt < 0), which prevents fast balls from tunneling
    through thin geoms (paddle blade 15 mm vs 36 mm/substep at the C6
    launch speed). dt = 0 reproduces penetration-only activation.

    Returns (dv, impulse_per_mass, active):
      dv: (3,) velocity change to add to the ball,
      impulse_per_mass: (3,) the applied impulse / m_ball (for reaction),
      active: scalar bool.
    """
    v_rel = v_ball - v_surf
    vn = jnp.sum(v_rel * frame.normal, axis=-1)
    active = (frame.dist + vn * dt < 0.0) & (vn < 0.0)
    e = jnp.where(jnp.abs(vn) > bounce_threshold, restitution, 0.0)
    jn = -(1.0 + e) * vn                                  # normal Δv magnitude
    vt = v_rel - vn[..., None] * frame.normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    jt = jnp.minimum(friction * jn, vt_norm)              # friction Δv magnitude
    t_hat = vt / jnp.maximum(vt_norm, _EPS)[..., None]
    dv = jn[..., None] * frame.normal - jt[..., None] * t_hat
    dv = jnp.where(active[..., None], dv, 0.0)
    return dv, dv, active


def resolve_sphere_impulse_spin(v_ball, omega, radius, kappa,
                                frame: ContactFrame, v_surf,
                                restitution, friction, bounce_threshold=0.2,
                                dt=0.0):
    """Spin-aware variant of :func:`resolve_sphere_impulse` (PhysX parity:
    rigid-body friction acts at the contact *point*, so ball angular velocity
    both feeds the tangential slip and receives the friction torque).

    Sphere contact point p = c - r n. Slip velocity
    u = v - r (omega x n) - v_surf; a tangential impulse j_t (per unit ball
    mass) changes the slip by -(1 + kappa) j_t where kappa = m r^2 / I
    (3/2 hollow sphere, 5/2 solid), so sticking needs
    j_t = |u_t| / (1 + kappa) and Coulomb gives j_t = min(mu j_n, that).
    Angular update: domega = (kappa j_t / r) (n x t_hat). The normal impulse
    passes through the center — no torque. ``dt`` > 0 enables the legacy
    speculative horizon; current callers pass a :func:`swept_frame` result
    and keep dt = 0 (penetration-only on the swept activation depth).

    Returns (dv, domega, impulse_per_mass, active).
    """
    n = frame.normal
    v_rel = v_ball - v_surf
    vn = jnp.sum(v_rel * n, axis=-1)
    active = (frame.dist + vn * dt < 0.0) & (vn < 0.0)
    e = jnp.where(jnp.abs(vn) > bounce_threshold, restitution, 0.0)
    jn = -(1.0 + e) * vn
    # slip at the contact point (omega x n is tangential, so vn is unchanged).
    # kappa == 0 means "no inertia recorded": fully decouple spin (both the
    # slip contribution and the torque), reproducing spin-less behavior.
    spin_term = radius * jnp.cross(omega, n) if kappa > 0.0 else 0.0
    slip = v_rel - spin_term
    vt = slip - jnp.sum(slip * n, axis=-1)[..., None] * n
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    jt = jnp.minimum(friction * jn, vt_norm / (1.0 + kappa))
    t_hat = vt / jnp.maximum(vt_norm, _EPS)[..., None]
    dv = jn[..., None] * n - jt[..., None] * t_hat
    dv = jnp.where(active[..., None], dv, 0.0)
    domega = (kappa / radius) * jt[..., None] * jnp.cross(n, t_hat)
    domega = jnp.where(active[..., None], domega, 0.0)
    return dv, domega, dv, active


def swept_frame(geom_fn, pos, v_rel, dt, samples: int = 4) -> ContactFrame:
    """Swept-sample CCD frame: evaluate the closest-point distance at
    ``samples+1`` points along the relative motion ``pos + v_rel * t`` over
    one substep and return the deepest sample's frame with the CURRENT
    sample's contact point.

    This replaces the earlier speculative horizon (``dist + vn*dt < 0``),
    which fired PHANTOM contacts when a ball passed just beside a geom edge
    moving toward its closest point — the deflection (lateral normal, no
    vx flip) punished near-misses and inverted the alignment-reward gradient
    (the round-2 flagship learning regression). Sampling the actual distance
    along the sweep only activates on true (predicted) penetration, stays
    edge-correct, and still prevents tunneling through thin geoms (paddle
    blade) up to ``samples * window / dt`` relative speed. PhysX equivalent:
    sweep-based CCD with contact_offset 2e-4
    (/root/reference/cfg/task/HumanoidPingpongTiltNoEarlyStopG1.yaml sim
    params), NOT large speculative margins.

    ``geom_fn(p) -> ContactFrame`` must be the closest-point test for the
    geom at a candidate sphere-center position ``p``.

    Returns ``(frame, now_dist)``: ``frame`` carries the deepest sample's
    (dist, normal) for activation/impulse and the CURRENT sample's contact
    point; ``now_dist`` is the current-position distance — positional
    depenetration must use it, not the (possibly future) swept depth.
    """
    f0 = geom_fn(pos)
    if dt == 0.0:
        return f0, f0.dist
    frames = [f0] + [geom_fn(pos + v_rel * (dt * k / samples))
                     for k in range(1, samples + 1)]
    dists = jnp.stack([f.dist for f in frames])           # (K+1, ...)
    normals = jnp.stack([f.normal for f in frames])       # (K+1, ..., 3)
    # FIRST penetrating sample = entry side (argmin would pick the deepest,
    # which on a full crossing lies past the geom with the exit normal and
    # the activation's vn test would wrongly reject it)
    j = jnp.argmax(dists < 0.0, axis=0)
    dist = jnp.take_along_axis(dists, j[None], axis=0)[0]
    normal = jnp.take_along_axis(normals, j[None, ..., None], axis=0)[0]
    return ContactFrame(dist=dist, normal=normal, point=f0.point), f0.dist


def depenetrate(pos, frame: ContactFrame, active):
    """Positional projection: push the sphere center out of penetration."""
    push = jnp.maximum(-frame.dist, 0.0)
    return pos + jnp.where(active[..., None], frame.normal * push[..., None], 0.0)


def combine_material(e_a, e_b, mu_a, mu_b):
    """PhysX default combine mode: average."""
    return 0.5 * (e_a + e_b), 0.5 * (mu_a + mu_b)
