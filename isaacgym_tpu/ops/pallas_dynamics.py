"""Fused articulated-physics Pallas TPU kernels (the hot ops).

Four kernel builders replace the ~400 small XLA kernels per substep for
revolute/prismatic articulations (per-dof joint types are compile-time
constants, so the branches fold at trace time):

  * ``build_arm_step`` — fixed-base dynamics only (contacts stay in the
    vmapped XLA phase consuming the exported frames and packed Cholesky
    factor);
  * ``build_fused_substep`` — the ENTIRE substep: dynamics + every ball
    contact (ground/table/net/humanoid geoms) with joint-space reactions
    through the in-kernel factor, plus optional per-env domain-randomization
    channels. Single-humanoid single-ball scenes run on this (~11M
    env-steps/s at 4096 envs on one v5e chip);
  * ``build_fused_substep_multi`` — K articulations + M balls per env with
    exact per-ball net-contact-force rows and PD/effort drive (C8/C11);
  * ``build_fused_substep_floating`` — floating base (nv = 6 + nd ≤ 33,
    the 27-DOF C10 scene): runtime base pose, in-kernel floating solve,
    articulated-geom ground contacts.

Design (see /opt/skills/guides/pallas_guide.md):
  * data layout (nd, B//128, 128): each per-DOF channel is a full
    (sublane, lane) tile; the env batch rides the vector lanes, joint math
    is unrolled scalar-form over channels — the classic structure-of-arrays
    batched-physics layout mapped to the VPU.
  * the kernel computes, per env: PD torques -> FK -> world inertias ->
    joint-space mass matrix (Jacobian form with static ancestor masks) ->
    RNEA bias with q̈=0 (closed-form, replacing the jvp) -> unrolled
    Cholesky solve -> semi-implicit Euler with joint limits -> second FK at
    the new q for the contact phase.
  * outputs include the post-step DOF frames and the packed Cholesky factor
    so the contact phase can reuse them without recomputation.

Numerical parity with ops.dynamics.forward_dynamics is asserted in
tests/test_pallas_dynamics.py.
"""

from __future__ import annotations


from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.ops.dynamics import ArticulationModel

LANE = 128


def _joint_types_ok(model: ArticulationModel) -> bool:
    return bool(np.all((model.tree.dof_type == U.JOINT_REVOLUTE)
                       | (model.tree.dof_type == U.JOINT_PRISMATIC)))


def supports(model: ArticulationModel) -> bool:
    """Kernel coverage: fixed base, revolute + prismatic joints."""
    return (not model.floating) and _joint_types_ok(model)


def supports_floating(model: ArticulationModel) -> bool:
    """Floating-base kernel coverage: revolute + prismatic joint dofs (the
    27-DOF whole-body G1, reference
    tasks/humanoid_pingpong_3_actor_all_dof.py:462, is all-revolute)."""
    return model.floating and _joint_types_ok(model)


# --- symbolic scalar helpers: Python-float constants fold/prune at trace time
# (zero mask entries, identity base columns) so the unrolled kernel only
# emits the ops that matter ------------------------------------------------

def _isz(x):
    return isinstance(x, (int, float)) and x == 0.0


def _sml(a, b):
    if _isz(a) or _isz(b):
        return 0.0
    return a * b


def _sad2(a, b):
    if _isz(a):
        return b
    if _isz(b):
        return a
    return a + b


def _ssub(a, b):
    if _isz(b):
        return a
    if _isz(a):
        return -b
    return a - b


def _sdot(a, b):
    return _sad2(_sad2(_sml(a[0], b[0]), _sml(a[1], b[1])), _sml(a[2], b[2]))


def _scross(a, b):
    return (_ssub(_sml(a[1], b[2]), _sml(a[2], b[1])),
            _ssub(_sml(a[2], b[0]), _sml(a[0], b[2])),
            _ssub(_sml(a[0], b[1]), _sml(a[1], b[0])))


def _sscale(v, s):
    return (_sml(v[0], s), _sml(v[1], s), _sml(v[2], s))


def _svadd(a, b):
    return (_sad2(a[0], b[0]), _sad2(a[1], b[1]), _sad2(a[2], b[2]))


def _svsub(a, b):
    return (_ssub(a[0], b[0]), _ssub(a[1], b[1]), _ssub(a[2], b[2]))


def _isc(x):
    return isinstance(x, (int, float))


def _sml1(a, b):
    """``_sml`` plus compile-time ±1 folding: kernels are op-count-bound on
    the VPU and Mosaic cannot fold ``x * 0.0`` under IEEE semantics (0*inf),
    so constant pruning must happen at build time."""
    if _isz(a) or _isz(b):
        return 0.0
    if _isc(a):
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
    if _isc(b):
        if b == 1.0:
            return a
        if b == -1.0:
            return -a
    return a * b


def _qmul_s(a, b):
    """Quaternion product with symbolic zero/±1 pruning — exact-math
    identical to :func:`_qmul` (only x*0 / x*1 / x+0 identities are folded).
    Either operand may carry compile-time float components; an identity
    constant side folds to a passthrough of the other."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        _sad2(_sad2(_sml1(aw, bx), _sml1(ax, bw)),
              _ssub(_sml1(ay, bz), _sml1(az, by))),
        _sad2(_sad2(_sml1(aw, by), _sml1(ay, bw)),
              _ssub(_sml1(az, bx), _sml1(ax, bz))),
        _sad2(_sad2(_sml1(aw, bz), _sml1(az, bw)),
              _ssub(_sml1(ax, by), _sml1(ay, bx))),
        _ssub(_sml1(aw, bw),
              _sad2(_sad2(_sml1(ax, bx), _sml1(ay, by)), _sml1(az, bz))),
    )


def _scross1(a, b):
    return (_ssub(_sml1(a[1], b[2]), _sml1(a[2], b[1])),
            _ssub(_sml1(a[2], b[0]), _sml1(a[0], b[2])),
            _ssub(_sml1(a[0], b[1]), _sml1(a[1], b[0])))


def _qrot_s(q, v):
    """``_qrot`` with build-time constant pruning. All-constant quaternions
    lower to a rotation-matrix contraction computed in pure Python (zero
    terms pruned, ±1 folded — identity/axis-aligned rotations cost 0–4 ops);
    otherwise the quaternion formula with zero/±1 pruning of constant
    components (same term association as :func:`_qrot`)."""
    if all(_isc(c) for c in q):
        R = _rotmat_from_quat(q)
        return tuple(
            _sad2(_sad2(_sml1(_round_unit(R[i][0]), v[0]),
                        _sml1(_round_unit(R[i][1]), v[1])),
                  _sml1(_round_unit(R[i][2]), v[2]))
            for i in range(3))
    qx, qy, qz, qw = q
    u = (qx, qy, qz)
    t = tuple(_sml1(2.0, c) for c in _scross1(u, v))
    return _svadd(_svadd(v, (_sml1(qw, t[0]), _sml1(qw, t[1]), _sml1(qw, t[2]))),
                  _scross1(u, t))


RESTING_SMOOTH_BAND = 0.002  # m; must equal simulator._resting_smooth's band


def _rest_smooth(dist, vn, bounce_threshold):
    """Resting-contact activation smoothing — the in-kernel mirror of
    ``simulator._resting_smooth`` (same band, same |vn| cut; see its
    docstring for the rationale). Scales Pn AND Pt so the friction cone is
    preserved."""
    s = jnp.clip(-dist / RESTING_SMOOTH_BAND, 0.0, 1.0)
    return jnp.where(jnp.abs(vn) > bounce_threshold, 1.0, s)


def _support_correct(g, gq_geom, n, dist, center, rbound):
    """SceneSpec.exact_link_support: replace the bounding-sphere radius of a
    CYLINDER/BOX link geom with its support extent along the contact normal
    (face-contact exact). Returns the corrected (dist, point)."""
    n_g = _qrot_s((-gq_geom[0], -gq_geom[1], -gq_geom[2], gq_geom[3]), n)
    if int(g["kind"]) == U.GEOM_CYLINDER:
        na = jnp.abs(n_g[2])
        sup = (na * float(g["size"][1])
               + jnp.sqrt(jnp.maximum(1.0 - na * na, 0.0)) * float(g["size"][0]))
    else:
        sup = (jnp.abs(n_g[0]) * float(g["size"][0])
               + jnp.abs(n_g[1]) * float(g["size"][1])
               + jnp.abs(n_g[2]) * float(g["size"][2]))
    return dist + rbound - sup, _sub(center, _scale(n, sup))


def _round_unit(c, tol=1e-7):
    """Snap build-time rotation coefficients to exact 0/±1 so axis-aligned
    constant rotations prune completely (float32 quats give 1-ulp dirt)."""
    if abs(c) < tol:
        return 0.0
    if abs(c - 1.0) < tol:
        return 1.0
    if abs(c + 1.0) < tol:
        return -1.0
    return c


def _sphere_box_generic(c_local, half, rad):
    """Closest-point sphere-vs-box in the box frame -> (dist, n_local)."""
    cl = [jnp.clip(c_local[i], -float(half[i]), float(half[i])) for i in range(3)]
    d = _sub(c_local, tuple(cl))
    out2 = _dot(d, d)
    out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
    outside = out2 > 1e-12
    gaps = [float(half[i]) - jnp.abs(c_local[i]) for i in range(3)]
    sx = jnp.where(c_local[0] >= 0, 1.0, -1.0)
    sy = jnp.where(c_local[1] >= 0, 1.0, -1.0)
    sz = jnp.where(c_local[2] >= 0, 1.0, -1.0)
    use_x = (gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2])
    use_y = (~use_x) & (gaps[1] <= gaps[2])
    use_z = (~use_x) & (~use_y)
    n_in = (jnp.where(use_x, sx, 0.0), jnp.where(use_y, sy, 0.0),
            jnp.where(use_z, sz, 0.0))
    d_in = -jnp.minimum(gaps[0], jnp.minimum(gaps[1], gaps[2]))
    n_out = _scale(d, 1.0 / out_dist)
    n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
    return jnp.where(outside, out_dist, d_in) - rad, n


def _sphere_cyl_generic(c_local, radius, half_len, rad):
    """Closest-point sphere-vs-z-cylinder in the cylinder frame."""
    r2 = c_local[0] * c_local[0] + c_local[1] * c_local[1]
    r_xy = jnp.sqrt(jnp.maximum(r2, 1e-18))
    scale = jnp.minimum(1.0, float(radius) / r_xy)
    cl = (c_local[0] * scale, c_local[1] * scale,
          jnp.clip(c_local[2], -float(half_len), float(half_len)))
    d = _sub(c_local, cl)
    out2 = _dot(d, d)
    out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
    outside = out2 > 1e-12
    face_gap = float(half_len) - jnp.abs(c_local[2])
    wall_gap = float(radius) - r_xy
    zsgn = jnp.where(c_local[2] >= 0, 1.0, -1.0)
    use_face = face_gap < wall_gap
    inv_rxy = 1.0 / r_xy
    n_in = (jnp.where(use_face, 0.0, c_local[0] * inv_rxy),
            jnp.where(use_face, 0.0, c_local[1] * inv_rxy),
            jnp.where(use_face, zsgn, 0.0))
    d_in = -jnp.minimum(face_gap, wall_gap)
    n_out = _scale(d, 1.0 / out_dist)
    n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
    return jnp.where(outside, out_dist, d_in) - rad, n


# ---------------------------------------------------------------------------
# build-time broadphase: fixed-base reach pruning of art-vs-static pairs
# ---------------------------------------------------------------------------

def _np_qrot(q, v):
    x, y, z, w = [float(c) for c in q]
    u = np.asarray([x, y, z], np.float64)
    v = np.asarray(v, np.float64)
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def _point_geom_dist_np(p_world, sg) -> float:
    """Exact distance from a world point to a static geom's surface (numpy,
    build time). Negative when the point is inside. Unknown kinds -> -inf
    (never prune)."""
    sgq = np.asarray(sg["quat"], np.float64)
    c = _np_qrot((-sgq[0], -sgq[1], -sgq[2], sgq[3]),
                 np.asarray(p_world, np.float64) - np.asarray(sg["pos"], np.float64))
    kind, size = int(sg["kind"]), np.asarray(sg["size"], np.float64)
    if kind == U.GEOM_SPHERE:
        return float(np.linalg.norm(c) - size[0])
    if kind == U.GEOM_BOX:
        q = np.abs(c) - size
        return float(np.linalg.norm(np.maximum(q, 0.0)) + min(float(np.max(q)), 0.0))
    if kind == U.GEOM_CYLINDER:
        dr = float(np.hypot(c[0], c[1]) - size[0])
        dz = float(abs(c[2]) - size[1])
        if dr <= 0.0 and dz <= 0.0:
            return max(dr, dz)
        return float(np.hypot(max(dr, 0.0), max(dz, 0.0)))
    return -np.inf


def _art_geom_reach_np(model: ArticulationModel, g) -> float:
    """Upper bound on |geom_center - base_origin| over ALL joint
    configurations: rotations preserve norms, so the chain's pre_pos norms +
    prismatic travel + geom offset + bounding radius bound the reach."""
    tree = model.tree
    reach = float(np.linalg.norm(np.asarray(g["off_pos"], np.float64)))
    reach += float(g["radius_bound"])
    d = int(g["link"])
    while d >= 0:
        reach += float(np.linalg.norm(tree.dof_pre_pos[d].astype(np.float64)))
        if int(tree.dof_type[d]) == U.JOINT_PRISMATIC:
            lo, hi = float(tree.lower[d]), float(tree.upper[d])
            if not (np.isfinite(lo) and np.isfinite(hi)):
                return float(np.inf)
            reach += max(abs(lo), abs(hi))
        d = int(tree.dof_parent[d])
    return reach


def _static_pair_unreachable(model: ArticulationModel, base_pos, g, sg,
                             margin: float = 0.02) -> bool:
    """Build-time broadphase for FIXED-base articulations: True when art
    geom ``g`` can never touch static geom ``sg`` for any joint
    configuration (narrowphase activates on dist < 0 only, so a geometric
    bound plus the 5 mm contact offset + margin is sufficient). Static poses
    are already compile-time constants on the fused path (teleported statics
    reroute to XLA via simulator._baked_roots_moved). Diagnostic override:
    ``ISAACGYM_TPU_REACH_PRUNE=0`` keeps every pair."""
    import os
    if os.environ.get("ISAACGYM_TPU_REACH_PRUNE", "1") == "0":
        return False
    return (_point_geom_dist_np(base_pos, sg)
            > _art_geom_reach_np(model, g) + 0.005 + margin)


# ---------------------------------------------------------------------------
# scalar-form helpers over (sublane, lane) tiles
# ---------------------------------------------------------------------------

def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def _qrot(q, v):
    qx, qy, qz, qw = q
    vx, vy, vz = v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _scale(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _rotmat_from_quat(q):
    """3x3 entries (tuple of tuples) from quat components."""
    x, y, z, w = q
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def _mat_vec(R, v):
    return tuple(R[i][0] * v[0] + R[i][1] * v[1] + R[i][2] * v[2] for i in range(3))


def _world_inertia(R, I_local):
    """R I R^T with constant symmetric I_local (3x3 numpy)."""
    RI = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            RI[i][j] = (R[i][0] * float(I_local[0, j]) + R[i][1] * float(I_local[1, j])
                        + R[i][2] * float(I_local[2, j]))
    Iw = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            Iw[i][j] = RI[i][0] * R[j][0] + RI[i][1] * R[j][1] + RI[i][2] * R[j][2]
    for i in range(3):
        for j in range(i):
            Iw[i][j] = Iw[j][i]
    return Iw


def _sym_mat_vec(Iw, v):
    return tuple(Iw[i][0] * v[0] + Iw[i][1] * v[1] + Iw[i][2] * v[2] for i in range(3))


def _scale3x(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------

class ArmStepOutputs(NamedTuple):
    q_new: jnp.ndarray    # (B, nd)
    qd_new: jnp.ndarray   # (B, nd)
    tau: jnp.ndarray      # (B, nd)
    frame_pos: jnp.ndarray   # (B, nd, 3) post-step
    frame_quat: jnp.ndarray  # (B, nd, 4)
    chol: jnp.ndarray     # (B, nd*(nd+1)//2) packed lower-triangular factor


def build_arm_step(model: ArticulationModel, base_pos: np.ndarray,
                   base_quat: np.ndarray, kp: np.ndarray, kd: np.ndarray,
                   gravity: np.ndarray, dt_s: float, rows_per_block: int = 8):
    """Compile-time specialization for one articulation slot.

    The base pose is a per-scene constant for fixed-base pingpong humanoids
    (same pose every env), so it is folded into the kernel.
    Returns ``fn(q, qd, targets, efforts) -> ArmStepOutputs`` for (B, nd)
    inputs with B % 128 == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tree = model.tree
    nd = tree.n_dof
    assert supports(model)

    parent = [int(p) for p in tree.dof_parent]
    pre_pos = tree.dof_pre_pos.astype(np.float64)
    pre_quat = tree.dof_pre_quat.astype(np.float64)
    axis = tree.dof_axis.astype(np.float64)
    mask = model.ancestor_mask[:nd, :nd]  # (links, dofs)
    m_l = tree.comp_mass.astype(np.float64)
    com_l = tree.comp_com.astype(np.float64)
    I_l = model.link_inertia_com[:nd].astype(np.float64)
    armature = model.armature.astype(np.float64)
    lo = tree.lower.astype(np.float64)
    hi = tree.upper.astype(np.float64)
    effort = tree.effort.astype(np.float64)
    maxvel = tree.max_velocity.astype(np.float64)
    gx, gy, gz = [float(v) for v in gravity]
    kp = np.asarray(kp, np.float64)
    kd = np.asarray(kd, np.float64)
    rev = [bool(t == U.JOINT_REVOLUTE) for t in tree.dof_type]

    # base pose as constants
    bq = tuple(float(v) for v in base_quat)
    bp = tuple(float(v) for v in base_pos)

    ntri = nd * (nd + 1) // 2
    tri_index = {}
    t = 0
    for i in range(nd):
        for j in range(i + 1):
            tri_index[(i, j)] = t
            t += 1

    def fk(q_rows):
        """q_rows: list of nd (S,L) tiles -> (fp, fq, axes_w) tuples."""
        fp, fq, axes_w = [], [], []
        for d in range(nd):
            if parent[d] < 0:
                pp = tuple(jnp.full_like(q_rows[0], c) for c in bp)
                pq = tuple(jnp.full_like(q_rows[0], c) for c in bq)
            else:
                pp, pq = fp[parent[d]], fq[parent[d]]
            jp = _svadd(pp, _qrot_s(pq, tuple(float(c) for c in pre_pos[d])))
            # constant-quat multiply folded scalar-wise (identity pre_quat,
            # zero offsets, sparse axes prune at build time — _qmul_s/_qrot_s)
            cq = tuple(float(c) for c in pre_quat[d])
            jq = _qmul_s(pq, cq)
            ax, ay, az = [float(v) for v in axis[d]]
            if rev[d]:
                half = 0.5 * q_rows[d]
                s, c = jnp.sin(half), jnp.cos(half)
                bq_d = _qmul_s(jq, (_sml1(ax, s), _sml1(ay, s), _sml1(az, s), c))
            else:
                bq_d = jq
                jp = _svadd(jp, _sscale(_qrot_s(jq, (ax, ay, az)), q_rows[d]))
            fp.append(jp)
            fq.append(bq_d)
            axes_w.append(_qrot_s(bq_d, tuple(float(v) for v in axis[d])))
        return fp, fq, axes_w

    def kernel(q_ref, qd_ref, tgt_ref, eff_ref,
               qn_ref, qdn_ref, tau_ref, fp_ref, fq_ref, L_ref):
        q = [q_ref[d] for d in range(nd)]
        qd = [qd_ref[d] for d in range(nd)]

        # PD drive + effort clamp (reference DOF_MODE_POS semantics)
        tau = []
        for d in range(nd):
            t_d = float(kp[d]) * (tgt_ref[d] - q[d]) - float(kd[d]) * qd[d] + eff_ref[d]
            t_d = jnp.clip(t_d, -float(effort[d]), float(effort[d]))
            tau.append(t_d)
            tau_ref[d] = t_d

        fp, fq, axes_w = fk(q)

        # world com + world inertia per link
        com_w, I_w = [], []
        for l in range(nd):
            com_w.append(_add(fp[l], _qrot(fq[l], tuple(float(v) for v in com_l[l]))))
            R = _rotmat_from_quat(fq[l])
            I_w.append(_world_inertia(R, I_l[l]))

        # velocity/bias propagation (RNEA with q̈ = 0, world frame)
        zero = jnp.zeros_like(q[0])
        w_list, wd_list, ao_list = [], [], []
        for d in range(nd):
            if parent[d] < 0:
                w_p = (zero, zero, zero)
                wd_p = (zero, zero, zero)
                ao_p = (zero, zero, zero)
                o_p = tuple(jnp.full_like(q[0], c) for c in bp)
            else:
                w_p, wd_p, ao_p = w_list[parent[d]], wd_list[parent[d]], ao_list[parent[d]]
                o_p = fp[parent[d]]
            r = _sub(fp[d], o_p)
            ao_d = _add(ao_p, _add(_cross(wd_p, r), _cross(w_p, _cross(w_p, r))))
            a_w = axes_w[d]
            if rev[d]:
                w_d = _add(w_p, _scale(a_w, qd[d]))
                wd_d = _add(wd_p, _scale(_cross(w_p, a_w), qd[d]))
            else:
                w_d, wd_d = w_p, wd_p
                ao_d = _add(ao_d, _scale(_cross(w_p, a_w), 2.0 * qd[d]))
            w_list.append(w_d)
            wd_list.append(wd_d)
            ao_list.append(ao_d)

        # link wrenches with q̈=0: f = m(a_com - g), n = I ω̇ + ω x (I ω)
        f_list, n_list = [], []
        for l in range(nd):
            rc = _sub(com_w[l], fp[l])
            a_com = _add(ao_list[l],
                         _add(_cross(wd_list[l], rc),
                              _cross(w_list[l], _cross(w_list[l], rc))))
            f = (_scale((a_com[0] - gx, a_com[1] - gy, a_com[2] - gz), float(m_l[l])))
            Iw = I_w[l]
            n = _add(_sym_mat_vec(Iw, wd_list[l]),
                     _cross(w_list[l], _sym_mat_vec(Iw, w_list[l])))
            f_list.append(f)
            n_list.append(n)

        # generalized bias force + mass matrix via Jacobian columns
        # J_ang[l][i] = axes_w[i] (mask), J_lin[l][i] = axes_w[i] x (c_l - o_i)
        Jlin = [[None] * nd for _ in range(nd)]
        for l in range(nd):
            for i in range(nd):
                if mask[l, i]:
                    Jlin[l][i] = (_cross(axes_w[i], _sub(com_w[l], fp[i]))
                                  if rev[i] else axes_w[i])

        rhs = []
        for i in range(nd):
            acc = zero
            for l in range(nd):
                if mask[l, i]:
                    if rev[i]:
                        acc = acc + _dot(axes_w[i], n_list[l])
                    acc = acc + _dot(Jlin[l][i], f_list[l])
            rhs.append(tau[i] - acc)

        M = [[None] * nd for _ in range(nd)]
        for i in range(nd):
            for j in range(i + 1):
                acc = zero
                for l in range(nd):
                    if mask[l, i] and mask[l, j]:
                        if rev[i] and rev[j]:
                            acc = acc + _dot(axes_w[i], _sym_mat_vec(I_w[l], axes_w[j]))
                        acc = acc + float(m_l[l]) * _dot(Jlin[l][i], Jlin[l][j])
                if i == j:
                    acc = acc + float(armature[i])
                M[i][j] = acc

        # unrolled Cholesky + solve (ops.linalg, scalar form)
        Lm = [[None] * (i + 1) for i in range(nd)]
        for j in range(nd):
            s = M[j][j]
            for k in range(j):
                s = s - Lm[j][k] * Lm[j][k]
            dia = jnp.sqrt(jnp.maximum(s, 1e-12))
            Lm[j][j] = dia
            inv_d = 1.0 / dia
            for i in range(j + 1, nd):
                s = M[i][j]
                for k in range(j):
                    s = s - Lm[i][k] * Lm[j][k]
                Lm[i][j] = s * inv_d
        for i in range(nd):
            for j in range(i + 1):
                L_ref[tri_index[(i, j)]] = Lm[i][j]

        y = [None] * nd
        for i in range(nd):
            s = rhs[i]
            for j in range(i):
                s = s - Lm[i][j] * y[j]
            y[i] = s / Lm[i][i]
        qdd = [None] * nd
        for i in reversed(range(nd)):
            s = y[i]
            for j in range(i + 1, nd):
                s = s - Lm[j][i] * qdd[j]
            qdd[i] = s / Lm[i][i]

        # semi-implicit Euler + joint limits (velocity zeroed at the stop);
        # DOF velocity clamped at the URDF limit (PhysX maxJointVelocity)
        q_new, qd_new = [], []
        for d in range(nd):
            v = qd[d] + dt_s * qdd[d]
            if float(maxvel[d]) > 0.0:
                v = jnp.clip(v, -float(maxvel[d]), float(maxvel[d]))
            p = q[d] + dt_s * v
            at_lo = p < float(lo[d])
            at_hi = p > float(hi[d])
            p = jnp.clip(p, float(lo[d]), float(hi[d]))
            v = jnp.where(at_lo, jnp.maximum(v, 0.0), v)
            v = jnp.where(at_hi, jnp.minimum(v, 0.0), v)
            q_new.append(p)
            qd_new.append(v)
            qn_ref[d] = p
            qdn_ref[d] = v

        # post-step FK for the contact phase
        fp2, fq2, _ = fk(q_new)
        for d in range(nd):
            for k in range(3):
                fp_ref[d * 3 + k] = fp2[d][k]
            for k in range(4):
                fq_ref[d * 4 + k] = fq2[d][k]

    def run(q, qd, targets, efforts) -> ArmStepOutputs:
        B = q.shape[0]
        assert B % LANE == 0, f"B={B} must be a multiple of {LANE}"
        R = B // LANE
        rb = min(rows_per_block, R)
        while R % rb:
            rb -= 1

        def to_chan(x):  # (B, nd) -> (nd, R, LANE)
            return jnp.transpose(x, (1, 0)).reshape(nd, R, LANE)

        grid = (R // rb,)
        chan_spec = lambda n: pl.BlockSpec((n, rb, LANE), lambda i: (0, i, 0),
                                           memory_space=pltpu.VMEM)
        out_shapes = (
            jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),   # q_new
            jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),   # qd_new
            jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),   # tau
            jax.ShapeDtypeStruct((nd * 3, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nd * 4, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((ntri, R, LANE), jnp.float32),
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[chan_spec(nd)] * 4,
            out_specs=(chan_spec(nd), chan_spec(nd), chan_spec(nd),
                       chan_spec(nd * 3), chan_spec(nd * 4), chan_spec(ntri)),
            out_shape=out_shapes,
            interpret=jax.default_backend() == "cpu",  # tests run on CPU
        )(to_chan(q), to_chan(qd), to_chan(targets), to_chan(efforts))

        def from_chan(x, n):  # (n, R, LANE) -> (B, n)
            return jnp.transpose(x.reshape(n, B), (1, 0))

        q_new = from_chan(outs[0], nd)
        qd_new = from_chan(outs[1], nd)
        tau = from_chan(outs[2], nd)
        fp = from_chan(outs[3], nd * 3).reshape(B, nd, 3)
        fq = from_chan(outs[4], nd * 4).reshape(B, nd, 4)
        chol = from_chan(outs[5], ntri)
        return ArmStepOutputs(q_new, qd_new, tau, fp, fq, chol)

    # jit so interpret-mode (CPU tests) traces once instead of re-interpreting
    return jax.jit(run)


def unpack_chol(packed, nd: int):
    """(…, ntri) packed factor -> nested tuple L[i][j] for ops.linalg.chol_solve."""
    out = []
    t = 0
    for i in range(nd):
        row = []
        for j in range(i + 1):
            row.append(packed[..., t])
            t += 1
        out.append(tuple(row))
    return tuple(out)


# ---------------------------------------------------------------------------
# fully-fused substep: articulation dynamics + ball contacts in ONE kernel
# ---------------------------------------------------------------------------

class FusedStepOutputs(NamedTuple):
    q_new: jnp.ndarray       # (B, nd)
    qd_new: jnp.ndarray      # (B, nd) post-contact
    tau: jnp.ndarray         # (B, nd)
    ball_pos: jnp.ndarray    # (B, 3)
    ball_vel: jnp.ndarray    # (B, 3)
    ball_omega: jnp.ndarray  # (B, 3) spin after friction coupling
    impulses: jnp.ndarray    # (B, ng+1, 3) — or (B, 2*ng+2, 3) when built
                             # with_torque: per-art-geom impulse on the geom
                             # body (rows 0..ng-1; ball reaction PLUS its
                             # art-vs-static contributions, matching the XLA
                             # ncf attribution), TOTAL ball impulse from all
                             # contacts (row ng), then per-art-geom contact
                             # MOMENT about the geom body's frame origin
                             # (rows ng+1..2ng) and the ball's contact-moment
                             # sum about its center (row 2ng+1) — force-
                             # sensor wrench lanes (impulse units; / dt)


def build_fused_substep(model: ArticulationModel, base_pos, base_quat,
                        kp, kd, gravity, dt_s: float,
                        ball_cfg: dict, static_geoms: list, art_geoms: list,
                        bounce_threshold: float = 0.2,
                        rows_per_block: int = 8,
                        with_dr: bool = False,
                        n_true_static: int = None,
                        max_depenetration: float = 10.0,
                        art_static: bool = True,
                        with_torque: bool = False,
                        exact_support: bool = False):
    """One Pallas kernel for the ENTIRE substep of a single-humanoid pingpong
    scene: PD -> dynamics -> integrate -> post FK -> ball gravity -> plane /
    static-box / articulated-geom impulse contacts (with joint-space
    reactions through the in-kernel Cholesky factor) -> ball integration.

    ``ball_cfg``: dict(mass, radius, restitution, friction).
    ``static_geoms``: list of dict(kind, pos(3), quat(4), size(3), e, mu) in
    WORLD frame (static actors' poses are scene constants).
    ``art_geoms``: list of dict(kind, link, off_pos(3), off_quat(4), size(3),
    e, mu) with offsets relative to the link's dof frame.

    Contact material combine = average (PhysX default), restitution gated by
    ``bounce_threshold`` — identical to ops.contacts.

    ``with_dr=True`` adds a per-env randomization channel input packing
    [kp_scale(nd), kd_scale(nd), lower_shift(nd), upper_shift(nd),
    mass_scale(1), gravity_offset(3), friction_scale(1),
    restitution_scale(1)] (see env/randomize.DRParams).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tree = model.tree
    nd = tree.n_dof
    assert supports(model)

    parent = [int(p) for p in tree.dof_parent]
    pre_pos = tree.dof_pre_pos.astype(np.float64)
    pre_quat = tree.dof_pre_quat.astype(np.float64)
    axis = tree.dof_axis.astype(np.float64)
    mask = model.ancestor_mask[:nd, :nd]
    m_l = tree.comp_mass.astype(np.float64)
    com_l = tree.comp_com.astype(np.float64)
    I_l = model.link_inertia_com[:nd].astype(np.float64)
    armature = model.armature.astype(np.float64)
    lo = tree.lower.astype(np.float64)
    hi = tree.upper.astype(np.float64)
    effort = tree.effort.astype(np.float64)
    maxvel = tree.max_velocity.astype(np.float64)
    gx, gy, gz = [float(v) for v in gravity]
    kp = np.asarray(kp, np.float64)
    kd = np.asarray(kd, np.float64)
    bq0 = tuple(float(v) for v in base_quat)
    bp0 = tuple(float(v) for v in base_pos)
    inv_mb = 1.0 / float(ball_cfg["mass"])
    rb_ = float(ball_cfg["radius"])
    e_ball = float(ball_cfg["restitution"])
    mu_ball = float(ball_cfg["friction"])
    max_lin_ball = float(ball_cfg.get("max_lin", 1000.0))
    max_ang_ball = float(ball_cfg.get("max_ang", 64.0))
    # PhysX velocity damping factors per substep (see simulator XLA path)
    lin_damp_f = max(0.0, 1.0 - float(ball_cfg.get("lin_damp", 0.0)) * dt_s)
    ang_damp_f = max(0.0, 1.0 - float(ball_cfg.get("ang_damp", 0.5)) * dt_s)
    # opt-in aerodynamics (0 = off, terms prune at trace time)
    kd_aero = float(ball_cfg.get("drag_k", 0.0))
    km_aero = float(ball_cfg.get("magnus_k", 0.0))
    # spin-friction coupling kappa = m r^2 / I (ops.contacts
    # resolve_sphere_impulse_spin); 0 decouples spin
    kappa = float(ball_cfg.get("kappa", 0.0))
    ng = len(art_geoms)
    if n_true_static is None:
        n_true_static = len(static_geoms)
    # per-dof joint type (compile-time): revolute rotates about the axis,
    # prismatic translates along it (kinematics.fk_dof_frames semantics)
    rev = [bool(t == U.JOINT_REVOLUTE) for t in tree.dof_type]

    def fk(q_rows):
        fp, fq, axes_w = [], [], []
        for d in range(nd):
            if parent[d] < 0:
                pp = tuple(jnp.full_like(q_rows[0], c) for c in bp0)
                pq = tuple(jnp.full_like(q_rows[0], c) for c in bq0)
            else:
                pp, pq = fp[parent[d]], fq[parent[d]]
            # constant pruning: identity pre_quat, zero offsets, and sparse
            # joint axes fold at build time (_qmul_s/_qrot_s/_sml1)
            jp = _svadd(pp, _qrot_s(pq, tuple(float(c) for c in pre_pos[d])))
            jq = _qmul_s(pq, tuple(float(c) for c in pre_quat[d]))
            ax, ay, az = [float(v) for v in axis[d]]
            if rev[d]:
                half = 0.5 * q_rows[d]
                s, c = jnp.sin(half), jnp.cos(half)
                bq_d = _qmul_s(jq, (_sml1(ax, s), _sml1(ay, s), _sml1(az, s), c))
            else:
                bq_d = jq
                jp = _svadd(jp, _sscale(_qrot_s(jq, (ax, ay, az)), q_rows[d]))
            fp.append(jp)
            fq.append(bq_d)
            axes_w.append(_qrot_s(bq_d, tuple(float(v) for v in axis[d])))
        return fp, fq, axes_w

    def _sphere_box_local(c_local, half):
        """closest-point sphere-vs-box in the box frame; returns (dist, n_local)."""
        cl = [jnp.clip(c_local[i], -float(half[i]), float(half[i])) for i in range(3)]
        d = _sub(c_local, tuple(cl))
        out2 = _dot(d, d)
        out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
        outside = out2 > 1e-12
        # inside: push through the nearest face
        gaps = [float(half[i]) - jnp.abs(c_local[i]) for i in range(3)]
        sx = jnp.where(c_local[0] >= 0, 1.0, -1.0)
        sy = jnp.where(c_local[1] >= 0, 1.0, -1.0)
        sz = jnp.where(c_local[2] >= 0, 1.0, -1.0)
        use_x = (gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2])
        use_y = (~use_x) & (gaps[1] <= gaps[2])
        use_z = (~use_x) & (~use_y)
        n_in = (jnp.where(use_x, sx, 0.0), jnp.where(use_y, sy, 0.0), jnp.where(use_z, sz, 0.0))
        d_in = -jnp.minimum(gaps[0], jnp.minimum(gaps[1], gaps[2]))
        inv = 1.0 / out_dist
        n_out = _scale(d, inv)
        n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
        dist = jnp.where(outside, out_dist, d_in) - rb_
        return dist, n

    def _sphere_cyl_local(c_local, radius, half_len):
        r2 = c_local[0] * c_local[0] + c_local[1] * c_local[1]
        r_xy = jnp.sqrt(jnp.maximum(r2, 1e-18))
        scale = jnp.minimum(1.0, float(radius) / r_xy)
        cl = (c_local[0] * scale, c_local[1] * scale,
              jnp.clip(c_local[2], -float(half_len), float(half_len)))
        d = _sub(c_local, cl)
        out2 = _dot(d, d)
        out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
        outside = out2 > 1e-12
        face_gap = float(half_len) - jnp.abs(c_local[2])
        wall_gap = float(radius) - r_xy
        zsgn = jnp.where(c_local[2] >= 0, 1.0, -1.0)
        use_face = face_gap < wall_gap
        inv_rxy = 1.0 / r_xy
        n_in = (jnp.where(use_face, 0.0, c_local[0] * inv_rxy),
                jnp.where(use_face, 0.0, c_local[1] * inv_rxy),
                jnp.where(use_face, zsgn, 0.0))
        d_in = -jnp.minimum(face_gap, wall_gap)
        inv = 1.0 / out_dist
        n_out = _scale(d, inv)
        n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
        dist = jnp.where(outside, out_dist, d_in) - rb_
        return dist, n

    def _swept_eval_local(eval_l, c0, dv_l, samples: int = 4):
        """Swept-sample CCD (ops.contacts.swept_frame, kernel form) evaluated
        in the geom's LOCAL frame: rotation into the frame is linear, so each
        sweep sample is one vector add on the local sphere center (``dv_l`` is
        the pre-scaled per-sample local delta) instead of a full quaternion
        rotate of the world position — the caller rotates only the SELECTED
        entry normal back to world. Activation frame = FIRST penetrating
        sample (entry-side normal); depenetration depth = current sample."""
        d0, n0 = eval_l(c0)
        best_d, best_n, found = d0, n0, d0 < 0.0
        ck = c0
        for k in range(1, samples + 1):
            ck = _add(ck, dv_l)
            dk, nk = eval_l(ck)
            take = (~found) & (dk < 0.0)
            best_d = jnp.where(take, dk, best_d)
            best_n = tuple(jnp.where(take, nk[i], best_n[i]) for i in range(3))
            found = found | (dk < 0.0)
        return best_d, best_n, d0

    def _resolve_static(vel, omg, dist, n, e, mu, dist_now=None):
        """spin-aware impulse against a static surface; returns
        (vel', omega', push, dv) — mirrors ops.contacts.resolve_sphere_impulse_spin:
        slip at the contact point is vel - r (omega x n), the tangential
        effective inverse mass gains (1 + kappa), and friction torques the
        ball by (kappa jt / r)(n x t_hat). ``dist`` is the swept activation
        depth (penetration-only test); ``dist_now`` the current depth used
        for positional projection."""
        if dist_now is None:
            dist_now = dist
        vn = _dot(vel, n)
        active = (dist < 0.0) & (vn < 0.0)
        e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
        jn = jnp.where(active, -(1.0 + e_eff) * vn, 0.0)
        slip = _sub(vel, _scale(_cross(omg, n), rb_)) if kappa > 0 else vel
        vt = _sub(slip, _scale(n, _dot(slip, n)))
        vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
        jt = jnp.where(active, jnp.minimum(mu * jn, vt_n / (1.0 + kappa)), 0.0)
        inv_vt = 1.0 / vt_n
        t_hat = _scale(vt, inv_vt)
        dv = _sub(_scale(n, jn), _scale(t_hat, jt))
        vel2 = _add(vel, dv)
        omg2 = _add(omg, _scale(_cross(n, t_hat), kappa / rb_ * jt))
        push = _scale(n, jnp.where(active, jnp.maximum(-dist_now, 0.0), 0.0))
        return vel2, omg2, push, dv

    def kernel(*refs):
        if with_dr:
            (q_ref, qd_ref, tgt_ref, eff_ref, bp_ref, bv_ref, bw_ref, dr_ref,
             qn_ref, qdn_ref, tau_ref, bpn_ref, bvn_ref, bwn_ref, imp_ref) = refs
        else:
            (q_ref, qd_ref, tgt_ref, eff_ref, bp_ref, bv_ref, bw_ref,
             qn_ref, qdn_ref, tau_ref, bpn_ref, bvn_ref, bwn_ref, imp_ref) = refs
            dr_ref = None
        q = [q_ref[d] for d in range(nd)]
        qd = [qd_ref[d] for d in range(nd)]
        zero = jnp.zeros_like(q[0])
        one = zero + 1.0

        # per-env randomization channels (identity when DR off)
        if with_dr:
            kps = [dr_ref[d] for d in range(nd)]
            kds = [dr_ref[nd + d] for d in range(nd)]
            losh = [dr_ref[2 * nd + d] for d in range(nd)]
            hish = [dr_ref[3 * nd + d] for d in range(nd)]
            ms = dr_ref[4 * nd]
            g_eff = (gx + dr_ref[4 * nd + 1], gy + dr_ref[4 * nd + 2],
                     gz + dr_ref[4 * nd + 3])
            fric_s = dr_ref[4 * nd + 4]
            rest_s = dr_ref[4 * nd + 5]
        else:
            kps = kds = [one] * nd
            losh = hish = [zero] * nd
            ms = one
            g_eff = (zero + gx, zero + gy, zero + gz)
            fric_s = rest_s = one

        tau = []
        for d in range(nd):
            t_d = (float(kp[d]) * kps[d] * (tgt_ref[d] - q[d])
                   - float(kd[d]) * kds[d] * qd[d] + eff_ref[d])
            t_d = jnp.clip(t_d, -float(effort[d]), float(effort[d]))
            tau.append(t_d)
            tau_ref[d] = t_d

        fp, fq, axes_w = fk(q)
        com_w, I_w = [], []
        for l in range(nd):
            com_w.append(_add(fp[l], _qrot(fq[l], tuple(float(v) for v in com_l[l]))))
            I_w.append(_world_inertia(_rotmat_from_quat(fq[l]), I_l[l]))

        w_list, wd_list, ao_list = [], [], []
        for d in range(nd):
            if parent[d] < 0:
                w_p = wd_p = ao_p = (zero, zero, zero)
                o_p = tuple(jnp.full_like(q[0], c) for c in bp0)
            else:
                w_p, wd_p, ao_p = w_list[parent[d]], wd_list[parent[d]], ao_list[parent[d]]
                o_p = fp[parent[d]]
            r = _sub(fp[d], o_p)
            ao_d = _add(ao_p, _add(_cross(wd_p, r), _cross(w_p, _cross(w_p, r))))
            a_w = axes_w[d]
            if rev[d]:
                w_d = _add(w_p, _scale(a_w, qd[d]))
                wd_d = _add(wd_p, _scale(_cross(w_p, a_w), qd[d]))
            else:
                # prismatic: no angular contribution; Coriolis 2 w x (a qd)
                w_d, wd_d = w_p, wd_p
                ao_d = _add(ao_d, _scale(_cross(w_p, a_w), 2.0 * qd[d]))
            w_list.append(w_d); wd_list.append(wd_d); ao_list.append(ao_d)

        f_list, n_list = [], []
        for l in range(nd):
            rc = _sub(com_w[l], fp[l])
            a_com = _add(ao_list[l], _add(_cross(wd_list[l], rc),
                                          _cross(w_list[l], _cross(w_list[l], rc))))
            f_list.append(_scale((a_com[0] - g_eff[0], a_com[1] - g_eff[1],
                                  a_com[2] - g_eff[2]), float(m_l[l]) * ms))
            Iw = I_w[l]
            n_list.append(_scale3x(_add(_sym_mat_vec(Iw, wd_list[l]),
                                        _cross(w_list[l], _sym_mat_vec(Iw, w_list[l]))), ms))

        # Jacobian columns: revolute -> axis x r (linear), axis (angular);
        # prismatic -> axis (linear), zero (angular)
        Jlin = [[None] * nd for _ in range(nd)]
        for l in range(nd):
            for i in range(nd):
                if mask[l, i]:
                    Jlin[l][i] = (_cross(axes_w[i], _sub(com_w[l], fp[i]))
                                  if rev[i] else axes_w[i])

        rhs = []
        for i in range(nd):
            acc = zero
            for l in range(nd):
                if mask[l, i]:
                    if rev[i]:
                        acc = acc + _dot(axes_w[i], n_list[l])
                    acc = acc + _dot(Jlin[l][i], f_list[l])
            rhs.append(tau[i] - acc)

        M = [[None] * nd for _ in range(nd)]
        for i in range(nd):
            for j in range(i + 1):
                acc = zero
                for l in range(nd):
                    if mask[l, i] and mask[l, j]:
                        if rev[i] and rev[j]:
                            acc = acc + _dot(axes_w[i], _sym_mat_vec(I_w[l], axes_w[j]))
                        acc = acc + float(m_l[l]) * _dot(Jlin[l][i], Jlin[l][j])
                acc = acc * ms
                if i == j:
                    acc = acc + float(armature[i])
                M[i][j] = acc

        Lm = [[None] * (i + 1) for i in range(nd)]
        for j in range(nd):
            s = M[j][j]
            for k2 in range(j):
                s = s - Lm[j][k2] * Lm[j][k2]
            dia = jnp.sqrt(jnp.maximum(s, 1e-12))
            Lm[j][j] = dia
            inv_d = 1.0 / dia
            for i in range(j + 1, nd):
                s = M[i][j]
                for k2 in range(j):
                    s = s - Lm[i][k2] * Lm[j][k2]
                Lm[i][j] = s * inv_d

        def fwd_sub(b):
            y = [None] * nd
            for i in range(nd):
                s = b[i]
                for j in range(i):
                    s = s - Lm[i][j] * y[j]
                y[i] = s / Lm[i][i]
            return y

        def back_sub(y):
            x = [None] * nd
            for i in reversed(range(nd)):
                s = y[i]
                for j in range(i + 1, nd):
                    s = s - Lm[j][i] * x[j]
                x[i] = s / Lm[i][i]
            return x

        qdd = back_sub(fwd_sub(rhs))

        q_new, u = [], []
        for d in range(nd):
            v = qd[d] + dt_s * qdd[d]
            if float(maxvel[d]) > 0.0:
                v = jnp.clip(v, -float(maxvel[d]), float(maxvel[d]))
            p = q[d] + dt_s * v
            lo_d = float(lo[d]) + losh[d]
            hi_d = float(hi[d]) + hish[d]
            at_lo = p < lo_d
            at_hi = p > hi_d
            p = jnp.clip(p, lo_d, hi_d)
            v = jnp.where(at_lo, jnp.maximum(v, 0.0), v)
            v = jnp.where(at_hi, jnp.minimum(v, 0.0), v)
            q_new.append(p)
            u.append(v)
            qn_ref[d] = p

        fp2, fq2, axes2 = fk(q_new)

        # ------------------- ball stage -------------------
        pos = (bp_ref[0], bp_ref[1], bp_ref[2])
        vel = (bv_ref[0] + g_eff[0] * dt_s, bv_ref[1] + g_eff[1] * dt_s,
               bv_ref[2] + g_eff[2] * dt_s)
        vel = _scale(vel, lin_damp_f)
        omg = _scale((bw_ref[0], bw_ref[1], bw_ref[2]), ang_damp_f)
        if kd_aero > 0.0:
            vel = _sub(vel, _scale(vel, dt_s * kd_aero
                                   * jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
        if km_aero > 0.0:
            vel = _add(vel, _scale(_cross(omg, vel), dt_s * km_aero))

        # ground plane (z = 0, normal +z): the swept minimum along a plane
        # is monotone — min of the current and end-of-substep distance
        e, mu = 0.5 * (e_ball + float(ball_cfg.get("plane_e", 0.0))), \
                0.5 * (mu_ball + float(ball_cfg.get("plane_mu", 1.0)))
        dist0 = pos[2] - rb_
        dist = jnp.minimum(dist0, dist0 + vel[2] * dt_s)
        vel, omg, push, dv = _resolve_static(vel, omg, dist,
                                             (zero, zero, zero + 1.0), e, mu,
                                             dist_now=dist0)
        pos = _add(pos, push)
        imp_x, imp_y, imp_z = [_scale(dv, 1.0 / inv_mb)[i] for i in range(3)]
        # ball contact-moment accumulator (about the ball center; lever of a
        # sphere contact = -r n, so tau += -r/inv_m * n x dv per contact).
        # Channels exist only when the scene registers force sensors
        # (with_torque) — sensor-less scenes pay zero ops for the lanes.
        tqb = (_sscale(_scross1((0.0, 0.0, 1.0), dv), -rb_ / inv_mb)
               if with_torque else None)

        # static world geoms (table top, net, base-welded humanoid bodies)
        for si, g in enumerate(static_geoms):
            gp = tuple(float(v) for v in g["pos"])
            gq = tuple(float(v) for v in g["quat"])
            gqi = (-gq[0], -gq[1], -gq[2], gq[3])
            kind_s = int(g["kind"])

            def eval_l(c_local, g=g, kind_s=kind_s):
                if kind_s == U.GEOM_SPHERE:
                    d2 = _dot(c_local, c_local)
                    dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                    return dn - float(g["size"][0]) - rb_, _scale(c_local, 1.0 / dn)
                elif kind_s == U.GEOM_BOX:
                    return _sphere_box_local(c_local, g["size"])
                return _sphere_cyl_local(c_local, g["size"][0], g["size"][1])

            c0 = _qrot_s(gqi, _sub(pos, gp))
            dv_l = _qrot_s(gqi, _scale(vel, dt_s / 2))
            dist, n_l, dist0 = _swept_eval_local(eval_l, c0, dv_l, samples=2)
            n = _qrot_s(gq, n_l)
            if with_dr and si >= n_true_static:
                # BASE-WELDED humanoid geoms (rows past the true statics):
                # shape-property DR scales apply to them like the moving art
                # geoms — the XLA path gets this via _ball_vs_art_group(dr)
                e = 0.5 * (e_ball + float(g["e"]) * rest_s)
                mu = 0.5 * (mu_ball + float(g["mu"]) * fric_s)
            else:
                e = 0.5 * (e_ball + float(g["e"]))
                mu = 0.5 * (mu_ball + float(g["mu"]))
            vel, omg, push, dv = _resolve_static(vel, omg, dist, n, e, mu,
                                                 dist_now=dist0)
            pos = _add(pos, push)
            imp_x = imp_x + dv[0] / inv_mb
            imp_y = imp_y + dv[1] / inv_mb
            imp_z = imp_z + dv[2] / inv_mb
            if with_torque:
                tqb = _svadd(tqb, _sscale(_scross1(n, dv), -rb_ / inv_mb))
        # per-geom-body impulse/torque accumulators: ball-contact reaction
        # plus (below) the art-vs-static contributions — written to imp_ref
        # at the end so the rows match the XLA path's ncf/nct attribution
        geom_imp = [[zero, zero, zero] for _ in range(ng)]
        geom_tq = [[zero, zero, zero] for _ in range(ng)] if with_torque else None

        # articulated geoms with joint-space reactions
        for gi, g in enumerate(art_geoms):
            link = int(g["link"])
            op = tuple(float(v) for v in g["off_pos"])
            oq = tuple(float(v) for v in g["off_quat"])
            gp = _svadd(fp2[link], _qrot_s(fq2[link], op))
            gq = _qmul_s(fq2[link], oq)
            gqi = (-gq[0], -gq[1], -gq[2], gq[3])
            kind = int(g["kind"])

            def eval_l(c_local, g=g, kind=kind):
                if kind == U.GEOM_SPHERE:
                    d2 = _dot(c_local, c_local)
                    dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                    return dn - float(g["size"][0]) - rb_, _scale(c_local, 1.0 / dn)
                elif kind == U.GEOM_BOX:
                    return _sphere_box_local(c_local, g["size"])
                return _sphere_cyl_local(c_local, g["size"][0], g["size"][1])

            c0 = _qrot_s(gqi, _sub(pos, gp))
            d_now, n_now_l = eval_l(c0)
            n_now = _qrot_s(gq, n_now_l)

            # contact point + its Jacobian columns (linear part only);
            # the Jacobian/velocity use the CURRENT closest point (the swept
            # activation frame reuses them — second-order error)
            cp = _sub(pos, _scale(n_now, rb_))
            Jcols = []
            for i in range(nd):
                if mask[link, i]:
                    Jcols.append(_cross(axes2[i], _sub(cp, fp2[i]))
                                 if rev[i] else axes2[i])
                else:
                    Jcols.append(None)

            def JT_dot(vec):   # J^T vec -> length-nd list
                out = []
                for i in range(nd):
                    out.append(_dot(Jcols[i], vec) if Jcols[i] is not None else zero)
                return out

            # v_point = J u
            v_point = (zero, zero, zero)
            for i in range(nd):
                if Jcols[i] is not None:
                    v_point = _add(v_point, _scale(Jcols[i], u[i]))

            v_rel0 = _sub(vel, v_point)

            # swept-sample CCD along the relative motion (geom frozen over
            # the substep); entry-side normal, current-depth depenetration.
            # Samples step in the geom's LOCAL frame (one add each); only the
            # selected entry normal is rotated back to world.
            dv_l = _qrot_s(gqi, _scale(v_rel0, dt_s / 4))
            dist, n_l, found = d_now, n_now_l, d_now < 0.0
            ck = c0
            for kk in range(1, 5):
                ck = _add(ck, dv_l)
                dk, nk = eval_l(ck)
                take = (~found) & (dk < 0.0)
                dist = jnp.where(take, dk, dist)
                n_l = tuple(jnp.where(take, nk[i], n_l[i]) for i in range(3))
                found = found | (dk < 0.0)
            n = _qrot_s(gq, n_l)

            v_rel = v_rel0
            vn = _dot(v_rel, n)
            active = (dist < 0.0) & (vn < 0.0)
            e = 0.5 * (e_ball + float(g["e"]) * rest_s)
            mu = 0.5 * (mu_ball + float(g["mu"]) * fric_s)
            e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)

            yn = fwd_sub(JT_dot(n))
            w_n = inv_mb + sum(v * v for v in yn)
            Pn = jnp.where(active, -(1.0 + e_eff) * vn / w_n, 0.0)

            slip = (_sub(v_rel, _scale(_cross(omg, n), rb_))
                    if kappa > 0 else v_rel)
            vt = _sub(slip, _scale(n, _dot(slip, n)))
            vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
            inv_vt = 1.0 / vt_n
            t_hat = _scale(vt, inv_vt)
            yt = fwd_sub(JT_dot(t_hat))
            w_t = (1.0 + kappa) * inv_mb + sum(v * v for v in yt)
            Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_n / w_t), 0.0)

            P = _sub(_scale(n, Pn), _scale(t_hat, Pt))
            vel = _add(vel, _scale(P, inv_mb))
            omg = _add(omg, _scale(_cross(n, t_hat), kappa * inv_mb / rb_ * Pt))
            du = back_sub([yn[i] * (-Pn) + yt[i] * Pt for i in range(nd)])
            for i in range(nd):
                u[i] = u[i] + du[i]
            pos = _add(pos, _scale(n, jnp.where(active, jnp.maximum(-d_now, 0.0), 0.0)))
            # ball total-impulse row includes the art reactions (row ng is
            # the FULL ball impulse; the geom rows stay per-body)
            imp_x = imp_x + P[0]
            imp_y = imp_y + P[1]
            imp_z = imp_z + P[2]
            geom_imp[gi] = [-P[0], -P[1], -P[2]]
            if with_torque:
                # contact moments: ball about its center (lever -r n_now),
                # geom body about its frame origin (lever cp - body origin)
                tqb = _svadd(tqb, _sscale(_scross1(n_now, P), -rb_))
                borg = _svadd(fp2[link], _qrot_s(
                    fq2[link], tuple(float(v) for v in g["body_off"])))
                geom_tq[gi] = list(_scross1(_svsub(cp, borg), _sscale(P, -1.0)))

        # articulation links vs TRUE static geoms (table slab, net) —
        # Baumgarte-stabilized impulses on the generalized velocity, the
        # in-kernel mirror of simulator._art_vs_static_group (the paddle/arm
        # is stopped by the table, PhysX full-pair narrowphase parity)
        if art_static:
            for gi_s, g in enumerate(art_geoms):
                link = int(g["link"])
                rbound = float(g["radius_bound"])
                op = tuple(float(v) for v in g["off_pos"])
                center = _svadd(fp2[link], _qrot_s(fq2[link], op))
                for sg in static_geoms[:n_true_static]:
                    if _static_pair_unreachable(model, base_pos, g, sg):
                        continue
                    sgp = tuple(float(v) for v in sg["pos"])
                    sgq = tuple(float(v) for v in sg["quat"])
                    c_local = _qrot_s((-sgq[0], -sgq[1], -sgq[2], sgq[3]),
                                    _sub(center, sgp))
                    kind_s = int(sg["kind"])
                    if kind_s == U.GEOM_SPHERE:
                        d2 = _dot(c_local, c_local)
                        dnn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                        n_local = _scale(c_local, 1.0 / dnn)
                        dist = dnn - float(sg["size"][0]) - rbound
                    elif kind_s == U.GEOM_BOX:
                        dist, n_local = _sphere_box_generic(c_local, sg["size"], rbound)
                    else:
                        dist, n_local = _sphere_cyl_generic(
                            c_local, sg["size"][0], sg["size"][1], rbound)
                    n = _qrot_s(sgq, n_local)
                    if (exact_support and
                            int(g["kind"]) in (U.GEOM_CYLINDER, U.GEOM_BOX)):
                        gqg = _qmul_s(fq2[link],
                                      tuple(float(v) for v in g["off_quat"]))
                        dist, point = _support_correct(g, gqg, n, dist,
                                                       center, rbound)
                    else:
                        point = _sub(center, _scale(n, rbound))
                    Jcols = []
                    for i in range(nd):
                        if mask[link, i]:
                            Jcols.append(_cross(axes2[i], _sub(point, fp2[i]))
                                         if rev[i] else axes2[i])
                        else:
                            Jcols.append(None)
                    v_point = (zero, zero, zero)
                    for i in range(nd):
                        if Jcols[i] is not None:
                            v_point = _add(v_point, _scale(Jcols[i], u[i]))
                    vn = _dot(v_point, n)
                    active = (dist < 0.0) & (vn < 0.1)
                    bias = jnp.minimum(
                        0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                        max_depenetration)
                    e_as = 0.5 * (float(g["e"]) + float(sg["e"]))
                    mu_as = 0.5 * (float(g["mu"]) + float(sg["mu"]))
                    e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e_as, 0.0)
                    JTn = [(_dot(Jcols[i], n) if Jcols[i] is not None else zero)
                           for i in range(nd)]
                    yn = fwd_sub(JTn)
                    w_n = sum(v_ * v_ for v_ in yn)
                    Pn = jnp.where(active,
                                   (-(1.0 + e_eff) * jnp.minimum(vn, 0.0) + bias)
                                   / jnp.maximum(w_n, 1e-9), 0.0)
                    vt = _sub(v_point, _scale(n, vn))
                    vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                    t_hat = _scale(vt, 1.0 / vt_n)
                    JTt = [(_dot(Jcols[i], t_hat) if Jcols[i] is not None else zero)
                           for i in range(nd)]
                    yt = fwd_sub(JTt)
                    w_t = sum(v_ * v_ for v_ in yt)
                    Pt = jnp.where(active,
                                   jnp.minimum(mu_as * Pn,
                                               vt_n / jnp.maximum(w_t, 1e-9)), 0.0)
                    s_r = _rest_smooth(dist, vn, bounce_threshold)
                    Pn = Pn * s_r
                    Pt = Pt * s_r
                    du = back_sub([yn[i] * Pn - yt[i] * Pt for i in range(nd)])
                    for i in range(nd):
                        u[i] = u[i] + du[i]
                    # record into the geom body's ncf/wrench rows — the XLA
                    # path adds art-static P/tq at the geom bodies
                    # (simulator._art_vs_static_group caller)
                    P_as = _sub(_scale(n, Pn), _scale(t_hat, Pt))
                    for i3 in range(3):
                        geom_imp[gi_s][i3] = geom_imp[gi_s][i3] + P_as[i3]
                    if with_torque:
                        borg = _svadd(fp2[link], _qrot_s(
                            fq2[link], tuple(float(v) for v in g["body_off"])))
                        tq_as = _scross1(_svsub(point, borg), P_as)
                        for i3 in range(3):
                            geom_tq[gi_s][i3] = geom_tq[gi_s][i3] + tq_as[i3]

        for d in range(nd):
            qdn_ref[d] = u[d]
        imp_ref[ng * 3 + 0] = imp_x
        imp_ref[ng * 3 + 1] = imp_y
        imp_ref[ng * 3 + 2] = imp_z
        for gi in range(ng):
            for i3 in range(3):
                imp_ref[gi * 3 + i3] = geom_imp[gi][i3]
        if with_torque:
            for gi in range(ng):
                for i3 in range(3):
                    imp_ref[(ng + 1 + gi) * 3 + i3] = geom_tq[gi][i3]
            imp_ref[(2 * ng + 1) * 3 + 0] = tqb[0]
            imp_ref[(2 * ng + 1) * 3 + 1] = tqb[1]
            imp_ref[(2 * ng + 1) * 3 + 2] = tqb[2]
        # ball AssetOptions.max_linear_velocity — PhysX caps the MAGNITUDE
        vel = _scale(vel, jnp.minimum(
            1.0, max_lin_ball / jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
        bpn_ref[0] = pos[0] + vel[0] * dt_s
        bpn_ref[1] = pos[1] + vel[1] * dt_s
        bpn_ref[2] = pos[2] + vel[2] * dt_s
        bvn_ref[0] = vel[0]
        bvn_ref[1] = vel[1]
        bvn_ref[2] = vel[2]
        omg = _scale(omg, jnp.minimum(
            1.0, max_ang_ball / jnp.sqrt(jnp.maximum(_dot(omg, omg), 1e-18))))
        bwn_ref[0] = omg[0]
        bwn_ref[1] = omg[1]
        bwn_ref[2] = omg[2]

    ndr = 4 * nd + 6

    def run(q, qd, targets, efforts, ball_pos, ball_vel, ball_omega,
            dr_chan=None) -> FusedStepOutputs:
        B = q.shape[0]
        assert B % LANE == 0
        R = B // LANE
        rb = min(rows_per_block, R)
        while R % rb:
            rb -= 1

        def to_chan(x, n):
            return jnp.transpose(x, (1, 0)).reshape(n, R, LANE)

        grid = (R // rb,)
        chan = lambda n: pl.BlockSpec((n, rb, LANE), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
        nimp = (2 * ng + 2) * 3 if with_torque else ng * 3 + 3
        in_specs = [chan(nd)] * 4 + [chan(3), chan(3), chan(3)]
        inputs = [to_chan(q, nd), to_chan(qd, nd), to_chan(targets, nd),
                  to_chan(efforts, nd), to_chan(ball_pos, 3),
                  to_chan(ball_vel, 3), to_chan(ball_omega, 3)]
        if with_dr:
            in_specs.append(chan(ndr))
            inputs.append(to_chan(dr_chan, ndr))
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(chan(nd), chan(nd), chan(nd), chan(3), chan(3),
                       chan(3), chan(nimp)),
            out_shape=(
                jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nd, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((3, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((3, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((3, R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nimp, R, LANE), jnp.float32),
            ),
            interpret=jax.default_backend() == "cpu",
        )(*inputs)

        def from_chan(x, n):
            return jnp.transpose(x.reshape(n, B), (1, 0))

        return FusedStepOutputs(
            q_new=from_chan(outs[0], nd),
            qd_new=from_chan(outs[1], nd),
            tau=from_chan(outs[2], nd),
            ball_pos=from_chan(outs[3], 3),
            ball_vel=from_chan(outs[4], 3),
            ball_omega=from_chan(outs[5], 3),
            impulses=from_chan(outs[6], nimp).reshape(B, nimp // 3, 3),
        )

    return jax.jit(run)


# ---------------------------------------------------------------------------
# multi-articulation / multi-ball fused substep (C8 two-robot class scenes)
# ---------------------------------------------------------------------------

def build_fused_substep_multi(arts: list, balls: list, static_geoms: list,
                              art_geoms: list, gravity, dt_s: float,
                              bounce_threshold: float = 0.2,
                              rows_per_block: int = 8,
                              n_true_static: int = None,
                              max_depenetration: float = 10.0,
                              art_static: bool = True,
                              with_torque: bool = False,
                              exact_support: bool = False):
    """Fully-fused substep for K fixed-base revolute articulations and M free
    balls (the 4/5-actor scenes). Same physics as
    :func:`build_fused_substep`, generalized:

      * ``arts``: list of dict(model, base_pos, base_quat, kp, kd,
        drive_mode); DOF channels are concatenated in list order.
        ``drive_mode=1`` (DOF_MODE_EFFORT, the C11 5-actor scene,
        /root/reference/tasks/humanoid_pingpong.py:581-585) applies the
        effort input directly instead of the PD law.
      * ``balls``: list of dict(mass, radius, e, mu, plane_e, plane_mu);
        ball channels are pos0,vel0,pos1,vel1,...
      * ``art_geoms`` entries carry an ``art`` index; every ball tests every
        geom. Impulse outputs: ng rows (impulse on each geom body, summed
        over balls, incl. the geom's art-vs-static contributions) + NB rows
        (each ball's plane/static impulse total) + NB rows (each ball's
        total reaction from articulated-geom contacts) — the last block
        makes per-ball net-contact-force attribution exact in multi-ball
        scenes. ``with_torque`` appends ng geom contact-moment rows (about
        each geom body's frame origin) + NB ball contact-moment rows (about
        each ball's center) — the force-sensor wrench lanes
        (create_asset_force_sensor capability, SURVEY.md §2 N2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if n_true_static is None:
        n_true_static = len(static_geoms)
    K = len(arts)
    NB = len(balls)
    nds = [a["model"].tree.n_dof for a in arts]
    nd_tot = sum(nds)
    offs = np.cumsum([0] + nds)[:-1]
    for a in arts:
        assert supports(a["model"]) and a["model"].tree.n_dof <= 32
    gx, gy, gz = [float(v) for v in gravity]
    ng = len(art_geoms)

    consts = []
    for a in arts:
        tree = a["model"].tree
        consts.append(dict(
            nd=tree.n_dof,
            parent=[int(p) for p in tree.dof_parent],
            pre_pos=tree.dof_pre_pos.astype(np.float64),
            pre_quat=tree.dof_pre_quat.astype(np.float64),
            axis=tree.dof_axis.astype(np.float64),
            rev=[bool(t == U.JOINT_REVOLUTE) for t in tree.dof_type],
            mask=a["model"].ancestor_mask[:tree.n_dof, :tree.n_dof],
            m_l=tree.comp_mass.astype(np.float64),
            com_l=tree.comp_com.astype(np.float64),
            I_l=a["model"].link_inertia_com[:tree.n_dof].astype(np.float64),
            armature=a["model"].armature.astype(np.float64),
            lo=tree.lower.astype(np.float64),
            hi=tree.upper.astype(np.float64),
            effort=tree.effort.astype(np.float64),
            maxvel=tree.max_velocity.astype(np.float64),
            kp=np.asarray(a["kp"], np.float64),
            kd=np.asarray(a["kd"], np.float64),
            drive=int(a.get("drive_mode", 0)),
            bp=tuple(float(v) for v in a["base_pos"]),
            bq=tuple(float(v) for v in a["base_quat"]),
        ))

    def kernel(q_ref, qd_ref, tgt_ref, eff_ref, bp_ref, bv_ref, bw_ref,
               qn_ref, qdn_ref, tau_ref, bpn_ref, bvn_ref, bwn_ref, imp_ref):
        zero = jnp.zeros_like(q_ref[0])
        art_rt = []
        for ai in range(K):
            c = consts[ai]
            nd = c["nd"]
            o = int(offs[ai])
            q = [q_ref[o + d] for d in range(nd)]
            qd = [qd_ref[o + d] for d in range(nd)]

            tau = []
            for d in range(nd):
                if c["drive"] == 1:  # DOF_MODE_EFFORT: direct torque input
                    t_d = eff_ref[o + d]
                else:
                    t_d = (float(c["kp"][d]) * (tgt_ref[o + d] - q[d])
                           - float(c["kd"][d]) * qd[d] + eff_ref[o + d])
                t_d = jnp.clip(t_d, -float(c["effort"][d]), float(c["effort"][d]))
                tau.append(t_d)
                tau_ref[o + d] = t_d

            def fk_a(q_rows, c=c, nd=nd):
                fp, fq, axes_w = [], [], []
                for d in range(nd):
                    if c["parent"][d] < 0:
                        pp = tuple(jnp.full_like(q_rows[0], v) for v in c["bp"])
                        pq = tuple(jnp.full_like(q_rows[0], v) for v in c["bq"])
                    else:
                        pp, pq = fp[c["parent"][d]], fq[c["parent"][d]]
                    jp = _svadd(pp, _qrot_s(pq, tuple(float(v) for v in c["pre_pos"][d])))
                    jq = _qmul_s(pq, tuple(float(v) for v in c["pre_quat"][d]))
                    ax, ay, az = [float(v) for v in c["axis"][d]]
                    if c["rev"][d]:
                        half = 0.5 * q_rows[d]
                        s_, co = jnp.sin(half), jnp.cos(half)
                        bq_d = _qmul_s(jq, (_sml1(ax, s_), _sml1(ay, s_),
                                            _sml1(az, s_), co))
                    else:
                        bq_d = jq
                        jp = _svadd(jp, _sscale(_qrot_s(jq, (ax, ay, az)), q_rows[d]))
                    fp.append(jp)
                    fq.append(bq_d)
                    axes_w.append(_qrot_s(bq_d, tuple(float(v) for v in c["axis"][d])))
                return fp, fq, axes_w

            fp, fq, axes_w = fk_a(q)
            com_w, I_w = [], []
            for l in range(nd):
                com_w.append(_add(fp[l], _qrot(fq[l], tuple(float(v) for v in c["com_l"][l]))))
                I_w.append(_world_inertia(_rotmat_from_quat(fq[l]), c["I_l"][l]))

            w_list, wd_list, ao_list = [], [], []
            for d in range(nd):
                if c["parent"][d] < 0:
                    w_p = wd_p = ao_p = (zero, zero, zero)
                    o_p = tuple(jnp.full_like(q[0], v) for v in c["bp"])
                else:
                    pd_ = c["parent"][d]
                    w_p, wd_p, ao_p = w_list[pd_], wd_list[pd_], ao_list[pd_]
                    o_p = fp[pd_]
                r = _sub(fp[d], o_p)
                ao_d = _add(ao_p, _add(_cross(wd_p, r), _cross(w_p, _cross(w_p, r))))
                a_w = axes_w[d]
                if c["rev"][d]:
                    w_list.append(_add(w_p, _scale(a_w, qd[d])))
                    wd_list.append(_add(wd_p, _scale(_cross(w_p, a_w), qd[d])))
                else:
                    w_list.append(w_p)
                    wd_list.append(wd_p)
                    ao_d = _add(ao_d, _scale(_cross(w_p, a_w), 2.0 * qd[d]))
                ao_list.append(ao_d)

            f_list, n_list = [], []
            for l in range(nd):
                rc = _sub(com_w[l], fp[l])
                a_com = _add(ao_list[l], _add(_cross(wd_list[l], rc),
                                              _cross(w_list[l], _cross(w_list[l], rc))))
                f_list.append(_scale((a_com[0] - gx, a_com[1] - gy, a_com[2] - gz),
                                     float(c["m_l"][l])))
                Iw = I_w[l]
                n_list.append(_add(_sym_mat_vec(Iw, wd_list[l]),
                                   _cross(w_list[l], _sym_mat_vec(Iw, w_list[l]))))

            Jlin = [[None] * nd for _ in range(nd)]
            for l in range(nd):
                for i in range(nd):
                    if c["mask"][l, i]:
                        Jlin[l][i] = (_cross(axes_w[i], _sub(com_w[l], fp[i]))
                                      if c["rev"][i] else axes_w[i])

            rhs = []
            for i in range(nd):
                acc = zero
                for l in range(nd):
                    if c["mask"][l, i]:
                        if c["rev"][i]:
                            acc = acc + _dot(axes_w[i], n_list[l])
                        acc = acc + _dot(Jlin[l][i], f_list[l])
                rhs.append(tau[i] - acc)

            M = [[None] * nd for _ in range(nd)]
            for i in range(nd):
                for j in range(i + 1):
                    acc = zero
                    for l in range(nd):
                        if c["mask"][l, i] and c["mask"][l, j]:
                            if c["rev"][i] and c["rev"][j]:
                                acc = acc + _dot(axes_w[i], _sym_mat_vec(I_w[l], axes_w[j]))
                            acc = acc + float(c["m_l"][l]) * _dot(Jlin[l][i], Jlin[l][j])
                    if i == j:
                        acc = acc + float(c["armature"][i])
                    M[i][j] = acc

            Lm = [[None] * (i + 1) for i in range(nd)]
            for j in range(nd):
                s_ = M[j][j]
                for k2 in range(j):
                    s_ = s_ - Lm[j][k2] * Lm[j][k2]
                dia = jnp.sqrt(jnp.maximum(s_, 1e-12))
                Lm[j][j] = dia
                inv_d = 1.0 / dia
                for i in range(j + 1, nd):
                    s_ = M[i][j]
                    for k2 in range(j):
                        s_ = s_ - Lm[i][k2] * Lm[j][k2]
                    Lm[i][j] = s_ * inv_d

            def fwd_sub(b, Lm=Lm, nd=nd):
                y = [None] * nd
                for i in range(nd):
                    s_ = b[i]
                    for j in range(i):
                        s_ = s_ - Lm[i][j] * y[j]
                    y[i] = s_ / Lm[i][i]
                return y

            def back_sub(y, Lm=Lm, nd=nd):
                x = [None] * nd
                for i in reversed(range(nd)):
                    s_ = y[i]
                    for j in range(i + 1, nd):
                        s_ = s_ - Lm[j][i] * x[j]
                    x[i] = s_ / Lm[i][i]
                return x

            qdd = back_sub(fwd_sub(rhs))
            q_new, u = [], []
            for d in range(nd):
                v = qd[d] + dt_s * qdd[d]
                if float(c["maxvel"][d]) > 0.0:
                    v = jnp.clip(v, -float(c["maxvel"][d]), float(c["maxvel"][d]))
                p = q[d] + dt_s * v
                at_lo = p < float(c["lo"][d])
                at_hi = p > float(c["hi"][d])
                p = jnp.clip(p, float(c["lo"][d]), float(c["hi"][d]))
                v = jnp.where(at_lo, jnp.maximum(v, 0.0), v)
                v = jnp.where(at_hi, jnp.minimum(v, 0.0), v)
                q_new.append(p)
                u.append(v)
                qn_ref[o + d] = p

            fp2, fq2, axes2 = fk_a(q_new)
            art_rt.append(dict(u=u, fp2=fp2, fq2=fq2, axes2=axes2,
                               fwd_sub=fwd_sub, back_sub=back_sub,
                               mask=c["mask"], rev=c["rev"], nd=nd, off=o))

        # zero the geom impulse (and wrench-torque) accumulators
        geom_imp = [[zero, zero, zero] for _ in range(ng)]
        geom_tq = [[zero, zero, zero] for _ in range(ng)] if with_torque else None

        def sphere_box_local(c_local, half, rad):
            cl = [jnp.clip(c_local[i], -float(half[i]), float(half[i])) for i in range(3)]
            d = _sub(c_local, tuple(cl))
            out2 = _dot(d, d)
            out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
            outside = out2 > 1e-12
            gaps = [float(half[i]) - jnp.abs(c_local[i]) for i in range(3)]
            sx = jnp.where(c_local[0] >= 0, 1.0, -1.0)
            sy = jnp.where(c_local[1] >= 0, 1.0, -1.0)
            sz = jnp.where(c_local[2] >= 0, 1.0, -1.0)
            use_x = (gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2])
            use_y = (~use_x) & (gaps[1] <= gaps[2])
            use_z = (~use_x) & (~use_y)
            n_in = (jnp.where(use_x, sx, 0.0), jnp.where(use_y, sy, 0.0),
                    jnp.where(use_z, sz, 0.0))
            d_in = -jnp.minimum(gaps[0], jnp.minimum(gaps[1], gaps[2]))
            inv = 1.0 / out_dist
            n_out = _scale(d, inv)
            n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
            return jnp.where(outside, out_dist, d_in) - rad, n

        def sphere_cyl_local(c_local, radius, half_len, rad):
            r2 = c_local[0] * c_local[0] + c_local[1] * c_local[1]
            r_xy = jnp.sqrt(jnp.maximum(r2, 1e-18))
            scale = jnp.minimum(1.0, float(radius) / r_xy)
            cl = (c_local[0] * scale, c_local[1] * scale,
                  jnp.clip(c_local[2], -float(half_len), float(half_len)))
            d = _sub(c_local, cl)
            out2 = _dot(d, d)
            out_dist = jnp.sqrt(jnp.maximum(out2, 1e-18))
            outside = out2 > 1e-12
            face_gap = float(half_len) - jnp.abs(c_local[2])
            wall_gap = float(radius) - r_xy
            zsgn = jnp.where(c_local[2] >= 0, 1.0, -1.0)
            use_face = face_gap < wall_gap
            inv_rxy = 1.0 / r_xy
            n_in = (jnp.where(use_face, 0.0, c_local[0] * inv_rxy),
                    jnp.where(use_face, 0.0, c_local[1] * inv_rxy),
                    jnp.where(use_face, zsgn, 0.0))
            d_in = -jnp.minimum(face_gap, wall_gap)
            inv = 1.0 / out_dist
            n_out = _scale(d, inv)
            n = tuple(jnp.where(outside, n_out[i], n_in[i]) for i in range(3))
            return jnp.where(outside, out_dist, d_in) - rad, n

        ball_rt = []  # per-ball (pos, vel, omg, s_imp, cfg) for the pair phase
        for bi, bc in enumerate(balls):
            rb_ = float(bc["radius"])
            inv_mb = 1.0 / float(bc["mass"])
            e_ball = float(bc["restitution"])
            mu_ball = float(bc["friction"])
            kap = float(bc.get("kappa", 0.0))
            ldf = max(0.0, 1.0 - float(bc.get("lin_damp", 0.0)) * dt_s)
            adf = max(0.0, 1.0 - float(bc.get("ang_damp", 0.5)) * dt_s)
            pos = (bp_ref[3 * bi + 0], bp_ref[3 * bi + 1], bp_ref[3 * bi + 2])
            vel = (bv_ref[3 * bi + 0] + gx * dt_s,
                   bv_ref[3 * bi + 1] + gy * dt_s,
                   bv_ref[3 * bi + 2] + gz * dt_s)
            vel = _scale(vel, ldf)
            omg = _scale((bw_ref[3 * bi + 0], bw_ref[3 * bi + 1],
                          bw_ref[3 * bi + 2]), adf)
            kd_a = float(bc.get("drag_k", 0.0))
            km_a = float(bc.get("magnus_k", 0.0))
            if kd_a > 0.0:
                vel = _sub(vel, _scale(vel, dt_s * kd_a
                                       * jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
            if km_a > 0.0:
                vel = _add(vel, _scale(_cross(omg, vel), dt_s * km_a))

            def resolve_static(vel, omg, dist, n, e, mu, dist_now=None,
                               rb_=rb_, kap=kap):
                # spin-aware (ops.contacts.resolve_sphere_impulse_spin);
                # penetration-only on the swept activation depth ``dist``
                if dist_now is None:
                    dist_now = dist
                vn = _dot(vel, n)
                active = (dist < 0.0) & (vn < 0.0)
                e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
                jn = jnp.where(active, -(1.0 + e_eff) * vn, 0.0)
                slip = (_sub(vel, _scale(_cross(omg, n), rb_))
                        if kap > 0 else vel)
                vt = _sub(slip, _scale(n, _dot(slip, n)))
                vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                jt = jnp.where(active, jnp.minimum(mu * jn, vt_n / (1.0 + kap)), 0.0)
                t_hat = _scale(vt, 1.0 / vt_n)
                dv = _sub(_scale(n, jn), _scale(t_hat, jt))
                omg2 = _add(omg, _scale(_cross(n, t_hat), kap / rb_ * jt))
                push = _scale(n, jnp.where(active, jnp.maximum(-dist_now, 0.0), 0.0))
                return _add(vel, dv), omg2, push, dv

            def swept_local(eval_l, c0, dv_l, samples=4):
                # first-penetrating sample (ops.contacts.swept_frame), stepped
                # in the geom's LOCAL frame (one add per sample; the caller
                # rotates only the selected entry normal back to world)
                d0, n0 = eval_l(c0)
                bd, bn, found = d0, n0, d0 < 0.0
                ck = c0
                for kk in range(1, samples + 1):
                    ck = _add(ck, dv_l)
                    dk, nk = eval_l(ck)
                    take = (~found) & (dk < 0.0)
                    bd = jnp.where(take, dk, bd)
                    bn = tuple(jnp.where(take, nk[i], bn[i]) for i in range(3))
                    found = found | (dk < 0.0)
                return bd, bn, d0

            e = 0.5 * (e_ball + float(bc.get("plane_e", 0.0)))
            mu = 0.5 * (mu_ball + float(bc.get("plane_mu", 1.0)))
            d0p = pos[2] - rb_
            vel, omg, push, dv = resolve_static(
                vel, omg, jnp.minimum(d0p, d0p + vel[2] * dt_s),
                (zero, zero, zero + 1.0), e, mu, dist_now=d0p)
            pos = _add(pos, push)
            s_imp = list(_scale(dv, 1.0 / inv_mb))
            # ball contact-moment accumulator (about the ball center; sphere
            # lever = -r n) — wrench lanes, built only with_torque
            b_tq = (list(_sscale(_scross1((0.0, 0.0, 1.0), dv), -rb_ / inv_mb))
                    if with_torque else None)

            for g in static_geoms:
                gp = tuple(float(v) for v in g["pos"])
                gq = tuple(float(v) for v in g["quat"])
                gqi = (-gq[0], -gq[1], -gq[2], gq[3])
                kind_s = int(g["kind"])

                def eval_l(c_local, g=g, kind_s=kind_s, rb_=rb_):
                    if kind_s == U.GEOM_SPHERE:
                        d2 = _dot(c_local, c_local)
                        dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                        return (dn - float(g["size"][0]) - rb_,
                                _scale(c_local, 1.0 / dn))
                    elif kind_s == U.GEOM_BOX:
                        return sphere_box_local(c_local, g["size"], rb_)
                    return sphere_cyl_local(c_local, g["size"][0], g["size"][1], rb_)

                c0 = _qrot_s(gqi, _sub(pos, gp))
                dv_l = _qrot_s(gqi, _scale(vel, dt_s / 2))
                dist, n_l, d0 = swept_local(eval_l, c0, dv_l, samples=2)
                n = _qrot_s(gq, n_l)
                e = 0.5 * (e_ball + float(g["e"]))
                mu = 0.5 * (mu_ball + float(g["mu"]))
                vel, omg, push, dv = resolve_static(vel, omg, dist, n, e, mu,
                                                    dist_now=d0)
                pos = _add(pos, push)
                for i3 in range(3):
                    s_imp[i3] = s_imp[i3] + dv[i3] / inv_mb
                if with_torque:
                    tq_c = _sscale(_scross1(n, dv), -rb_ / inv_mb)
                    for i3 in range(3):
                        b_tq[i3] = b_tq[i3] + tq_c[i3]
            b_art = [zero, zero, zero]  # Σ reactions this ball receives

            for gi, g in enumerate(art_geoms):
                rt = art_rt[int(g["art"])]
                link = int(g["link"])
                fp2, fq2, axes2 = rt["fp2"], rt["fq2"], rt["axes2"]
                gp = _svadd(fp2[link], _qrot_s(fq2[link], tuple(float(v) for v in g["off_pos"])))
                gq = _qmul_s(fq2[link], tuple(float(v) for v in g["off_quat"]))
                gqi = (-gq[0], -gq[1], -gq[2], gq[3])
                kind = int(g["kind"])

                def eval_l(c_local, g=g, kind=kind, rb_=rb_):
                    if kind == U.GEOM_SPHERE:
                        d2 = _dot(c_local, c_local)
                        dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                        return (dn - float(g["size"][0]) - rb_,
                                _scale(c_local, 1.0 / dn))
                    elif kind == U.GEOM_BOX:
                        return sphere_box_local(c_local, g["size"], rb_)
                    return sphere_cyl_local(c_local, g["size"][0], g["size"][1], rb_)

                c0 = _qrot_s(gqi, _sub(pos, gp))
                d_now, n_now_l = eval_l(c0)
                n_now = _qrot_s(gq, n_now_l)
                cp = _sub(pos, _scale(n_now, rb_))
                nd_a = rt["nd"]
                Jcols = []
                for i in range(nd_a):
                    if rt["mask"][link, i]:
                        Jcols.append(_cross(axes2[i], _sub(cp, fp2[i]))
                                     if rt["rev"][i] else axes2[i])
                    else:
                        Jcols.append(None)
                v_point = (zero, zero, zero)
                for i in range(nd_a):
                    if Jcols[i] is not None:
                        v_point = _add(v_point, _scale(Jcols[i], rt["u"][i]))
                v_rel = _sub(vel, v_point)
                # swept-sample CCD along the relative motion, stepped in the
                # geom's local frame (entry normal rotated back once)
                dv_l = _qrot_s(gqi, _scale(v_rel, dt_s / 4))
                dist, n_l, found = d_now, n_now_l, d_now < 0.0
                ck = c0
                for kk in range(1, 5):
                    ck = _add(ck, dv_l)
                    dk, nk = eval_l(ck)
                    take = (~found) & (dk < 0.0)
                    dist = jnp.where(take, dk, dist)
                    n_l = tuple(jnp.where(take, nk[i], n_l[i]) for i in range(3))
                    found = found | (dk < 0.0)
                n = _qrot_s(gq, n_l)
                vn = _dot(v_rel, n)
                active = (dist < 0.0) & (vn < 0.0)
                e = 0.5 * (e_ball + float(g["e"]))
                mu = 0.5 * (mu_ball + float(g["mu"]))
                e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
                JTn = [(_dot(Jcols[i], n) if Jcols[i] is not None else zero)
                       for i in range(nd_a)]
                yn = rt["fwd_sub"](JTn)
                w_n = inv_mb + sum(v * v for v in yn)
                Pn = jnp.where(active, -(1.0 + e_eff) * vn / w_n, 0.0)
                slip = (_sub(v_rel, _scale(_cross(omg, n), rb_))
                        if kap > 0 else v_rel)
                vt = _sub(slip, _scale(n, _dot(slip, n)))
                vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                t_hat = _scale(vt, 1.0 / vt_n)
                JTt = [(_dot(Jcols[i], t_hat) if Jcols[i] is not None else zero)
                       for i in range(nd_a)]
                yt = rt["fwd_sub"](JTt)
                w_t = (1.0 + kap) * inv_mb + sum(v * v for v in yt)
                Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_n / w_t), 0.0)
                P = _sub(_scale(n, Pn), _scale(t_hat, Pt))
                vel = _add(vel, _scale(P, inv_mb))
                omg = _add(omg, _scale(_cross(n, t_hat), kap * inv_mb / rb_ * Pt))
                du = rt["back_sub"]([yn[i] * (-Pn) + yt[i] * Pt for i in range(nd_a)])
                for i in range(nd_a):
                    rt["u"][i] = rt["u"][i] + du[i]
                pos = _add(pos, _scale(n, jnp.where(active, jnp.maximum(-d_now, 0.0), 0.0)))
                for i3 in range(3):
                    geom_imp[gi][i3] = geom_imp[gi][i3] - P[i3]
                    b_art[i3] = b_art[i3] + P[i3]
                if with_torque:
                    # ball about its center (lever -r n_now); geom body about
                    # its frame origin (lever cp - body origin) — matches the
                    # XLA _ball_vs_art_group torque attribution
                    tq_c = _sscale(_scross1(n_now, P), -rb_)
                    borg = _svadd(fp2[link], _qrot_s(
                        fq2[link], tuple(float(v) for v in g["body_off"])))
                    tq_g = _scross1(_svsub(cp, borg), _sscale(P, -1.0))
                    for i3 in range(3):
                        b_tq[i3] = b_tq[i3] + tq_c[i3]
                        geom_tq[gi][i3] = geom_tq[gi][i3] + tq_g[i3]

            for i3 in range(3):
                imp_ref[(ng + NB + bi) * 3 + i3] = b_art[i3]
            ball_rt.append(dict(pos=pos, vel=vel, omg=omg, s_imp=s_imp,
                                b_tq=b_tq, rb=rb_, inv_m=inv_mb, kap=kap,
                                bc=bc))

        # -- ball-ball contacts (C11: two balls in one env; matches the XLA
        # path's pairwise dynamic sphere-sphere impulse incl. spin) ---------
        for i in range(NB):
            for j in range(i + 1, NB):
                A, Bb = ball_rt[i], ball_rt[j]
                d = _sub(A["pos"], Bb["pos"])
                dn = jnp.sqrt(jnp.maximum(_dot(d, d), 1e-18))
                n = _scale(d, 1.0 / dn)
                v_rel = _sub(A["vel"], Bb["vel"])
                # swept-sample CCD on the relative separation
                dist = dn
                for kk in range(1, 5):
                    dk = _add(d, _scale(v_rel, dt_s * kk / 4))
                    dist = jnp.minimum(dist, jnp.sqrt(jnp.maximum(_dot(dk, dk), 1e-18)))
                dist_now = dn - A["rb"] - Bb["rb"]
                dist = dist - A["rb"] - Bb["rb"]
                vn = _dot(v_rel, n)
                active = (dist < 0.0) & (vn < 0.0)
                e = 0.5 * (float(A["bc"]["restitution"]) + float(Bb["bc"]["restitution"]))
                mu = 0.5 * (float(A["bc"]["friction"]) + float(Bb["bc"]["friction"]))
                e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
                Pn = jnp.where(active,
                               -(1.0 + e_eff) * vn / (A["inv_m"] + Bb["inv_m"]), 0.0)
                sa = (_scale(_cross(A["omg"], n), A["rb"])
                      if A["kap"] > 0 else (0.0, 0.0, 0.0))
                sb = (_scale(_cross(Bb["omg"], n), Bb["rb"])
                      if Bb["kap"] > 0 else (0.0, 0.0, 0.0))
                slip = _sub(v_rel, _add(sa, sb))
                vt = _sub(slip, _scale(n, _dot(slip, n)))
                vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                t_hat = _scale(vt, 1.0 / vt_n)
                w_t = (1.0 + A["kap"]) * A["inv_m"] + (1.0 + Bb["kap"]) * Bb["inv_m"]
                Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_n / w_t), 0.0)
                P = _sub(_scale(n, Pn), _scale(t_hat, Pt))
                dwdir = _cross(n, t_hat)
                A["vel"] = _add(A["vel"], _scale(P, A["inv_m"]))
                Bb["vel"] = _sub(Bb["vel"], _scale(P, Bb["inv_m"]))
                A["omg"] = _add(A["omg"], _scale(dwdir, A["kap"] * A["inv_m"] / A["rb"] * Pt))
                Bb["omg"] = _add(Bb["omg"], _scale(dwdir, Bb["kap"] * Bb["inv_m"] / Bb["rb"] * Pt))
                push = jnp.where(active, jnp.maximum(-dist_now, 0.0), 0.0)
                A["pos"] = _add(A["pos"], _scale(n, 0.5 * push))
                Bb["pos"] = _sub(Bb["pos"], _scale(n, 0.5 * push))
                for i3 in range(3):
                    A["s_imp"][i3] = A["s_imp"][i3] + P[i3]
                    Bb["s_imp"][i3] = Bb["s_imp"][i3] - P[i3]
                if with_torque:
                    # moments about each ball's center (contact at -+r n);
                    # both get -r_i (n x P) — see the XLA ball-ball block
                    nxP = _scross1(n, P)
                    for i3 in range(3):
                        A["b_tq"][i3] = A["b_tq"][i3] - A["rb"] * nxP[i3]
                        Bb["b_tq"][i3] = Bb["b_tq"][i3] - Bb["rb"] * nxP[i3]

        # -- clamp + integrate + write back ---------------------------------
        for bi, (bc, rt_b) in enumerate(zip(balls, ball_rt)):
            pos, vel, omg = rt_b["pos"], rt_b["vel"], rt_b["omg"]
            for i3 in range(3):
                imp_ref[(ng + bi) * 3 + i3] = rt_b["s_imp"][i3]
                if with_torque:
                    imp_ref[(2 * ng + 2 * NB + bi) * 3 + i3] = rt_b["b_tq"][i3]
            # ball AssetOptions.max_linear_velocity — PhysX caps the MAGNITUDE
            ml_b = float(bc.get("max_lin", 1000.0))
            vel = _scale(vel, jnp.minimum(
                1.0, ml_b / jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
            bpn_ref[3 * bi + 0] = pos[0] + vel[0] * dt_s
            bpn_ref[3 * bi + 1] = pos[1] + vel[1] * dt_s
            bpn_ref[3 * bi + 2] = pos[2] + vel[2] * dt_s
            bvn_ref[3 * bi + 0] = vel[0]
            bvn_ref[3 * bi + 1] = vel[1]
            bvn_ref[3 * bi + 2] = vel[2]
            ma_b = float(bc.get("max_ang", 64.0))
            omg = _scale(omg, jnp.minimum(
                1.0, ma_b / jnp.sqrt(jnp.maximum(_dot(omg, omg), 1e-18))))
            bwn_ref[3 * bi + 0] = omg[0]
            bwn_ref[3 * bi + 1] = omg[1]
            bwn_ref[3 * bi + 2] = omg[2]

        # articulation links vs TRUE static geoms (table slab, net) —
        # mirrors simulator._art_vs_static_group (see build_fused_substep)
        if art_static:
            for gi_s, g in enumerate(art_geoms):
                rt = art_rt[int(g["art"])]
                link = int(g["link"])
                rbound = float(g["radius_bound"])
                fp2, fq2, axes2 = rt["fp2"], rt["fq2"], rt["axes2"]
                nd_a = rt["nd"]
                center = _svadd(fp2[link], _qrot_s(fq2[link],
                                               tuple(float(v) for v in g["off_pos"])))
                art_spec = arts[int(g["art"])]
                for sg in static_geoms[:n_true_static]:
                    if _static_pair_unreachable(art_spec["model"],
                                                art_spec["base_pos"], g, sg):
                        continue
                    sgp = tuple(float(v) for v in sg["pos"])
                    sgq = tuple(float(v) for v in sg["quat"])
                    c_local = _qrot_s((-sgq[0], -sgq[1], -sgq[2], sgq[3]),
                                    _sub(center, sgp))
                    kind_s = int(sg["kind"])
                    if kind_s == U.GEOM_SPHERE:
                        d2 = _dot(c_local, c_local)
                        dnn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                        n_local = _scale(c_local, 1.0 / dnn)
                        dist = dnn - float(sg["size"][0]) - rbound
                    elif kind_s == U.GEOM_BOX:
                        dist, n_local = _sphere_box_generic(c_local, sg["size"], rbound)
                    else:
                        dist, n_local = _sphere_cyl_generic(
                            c_local, sg["size"][0], sg["size"][1], rbound)
                    n = _qrot_s(sgq, n_local)
                    if (exact_support and
                            int(g["kind"]) in (U.GEOM_CYLINDER, U.GEOM_BOX)):
                        gqg = _qmul_s(fq2[link],
                                      tuple(float(v) for v in g["off_quat"]))
                        dist, point = _support_correct(g, gqg, n, dist,
                                                       center, rbound)
                    else:
                        point = _sub(center, _scale(n, rbound))
                    Jcols = []
                    for i in range(nd_a):
                        if rt["mask"][link, i]:
                            Jcols.append(_cross(axes2[i], _sub(point, fp2[i]))
                                         if rt["rev"][i] else axes2[i])
                        else:
                            Jcols.append(None)
                    v_point = (zero, zero, zero)
                    for i in range(nd_a):
                        if Jcols[i] is not None:
                            v_point = _add(v_point, _scale(Jcols[i], rt["u"][i]))
                    vn = _dot(v_point, n)
                    active = (dist < 0.0) & (vn < 0.1)
                    bias = jnp.minimum(
                        0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                        max_depenetration)
                    e_as = 0.5 * (float(g["e"]) + float(sg["e"]))
                    mu_as = 0.5 * (float(g["mu"]) + float(sg["mu"]))
                    e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e_as, 0.0)
                    JTn = [(_dot(Jcols[i], n) if Jcols[i] is not None else zero)
                           for i in range(nd_a)]
                    yn = rt["fwd_sub"](JTn)
                    w_n = sum(v_ * v_ for v_ in yn)
                    Pn = jnp.where(active,
                                   (-(1.0 + e_eff) * jnp.minimum(vn, 0.0) + bias)
                                   / jnp.maximum(w_n, 1e-9), 0.0)
                    vt = _sub(v_point, _scale(n, vn))
                    vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                    t_hat = _scale(vt, 1.0 / vt_n)
                    JTt = [(_dot(Jcols[i], t_hat) if Jcols[i] is not None else zero)
                           for i in range(nd_a)]
                    yt = rt["fwd_sub"](JTt)
                    w_t = sum(v_ * v_ for v_ in yt)
                    Pt = jnp.where(active,
                                   jnp.minimum(mu_as * Pn,
                                               vt_n / jnp.maximum(w_t, 1e-9)), 0.0)
                    s_r = _rest_smooth(dist, vn, bounce_threshold)
                    Pn = Pn * s_r
                    Pt = Pt * s_r
                    du = rt["back_sub"]([yn[i] * Pn - yt[i] * Pt
                                         for i in range(nd_a)])
                    for i in range(nd_a):
                        rt["u"][i] = rt["u"][i] + du[i]
                    # record at the geom body (the XLA path adds art-static
                    # P/tq to ncf/nct at grp.body)
                    P_as = _sub(_scale(n, Pn), _scale(t_hat, Pt))
                    for i3 in range(3):
                        geom_imp[gi_s][i3] = geom_imp[gi_s][i3] + P_as[i3]
                    if with_torque:
                        borg = _svadd(fp2[link], _qrot_s(
                            fq2[link], tuple(float(v) for v in g["body_off"])))
                        tq_as = _scross1(_svsub(point, borg), P_as)
                        for i3 in range(3):
                            geom_tq[gi_s][i3] = geom_tq[gi_s][i3] + tq_as[i3]

        for gi in range(ng):
            for i3 in range(3):
                imp_ref[gi * 3 + i3] = geom_imp[gi][i3]
        if with_torque:
            for gi in range(ng):
                for i3 in range(3):
                    imp_ref[(ng + 2 * NB + gi) * 3 + i3] = geom_tq[gi][i3]
        for ai, rt in enumerate(art_rt):
            for d in range(rt["nd"]):
                qdn_ref[rt["off"] + d] = rt["u"][d]

    def run(q, qd, targets, efforts, ball_pos, ball_vel, ball_omega):
        """ball_pos/ball_vel/ball_omega: (B, NB, 3). Returns FusedStepOutputs
        with ball arrays shaped (B, NB, 3) and impulses (B, ng+2·NB, 3):
        [geom rows | per-ball static/plane rows | per-ball art-reaction
        rows]; with_torque appends [geom moment rows (ng) | per-ball moment
        rows (NB)] -> (B, 2·ng+3·NB, 3)."""
        B = q.shape[0]
        assert B % LANE == 0
        R = B // LANE
        rb = min(rows_per_block, R)
        while R % rb:
            rb -= 1

        def to_chan(x, n):
            return jnp.transpose(x.reshape(B, n), (1, 0)).reshape(n, R, LANE)

        grid = (R // rb,)
        chan = lambda n: pl.BlockSpec((n, rb, LANE), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
        nimp = (2 * ng + 3 * NB) * 3 if with_torque else (ng + 2 * NB) * 3
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[chan(nd_tot)] * 4 + [chan(3 * NB)] * 3,
            out_specs=(chan(nd_tot), chan(nd_tot), chan(nd_tot),
                       chan(3 * NB), chan(3 * NB), chan(3 * NB), chan(nimp)),
            out_shape=tuple(jax.ShapeDtypeStruct((n, R, LANE), jnp.float32)
                            for n in (nd_tot, nd_tot, nd_tot,
                                      3 * NB, 3 * NB, 3 * NB, nimp)),
            interpret=jax.default_backend() == "cpu",
        )(to_chan(q, nd_tot), to_chan(qd, nd_tot), to_chan(targets, nd_tot),
          to_chan(efforts, nd_tot), to_chan(ball_pos, 3 * NB),
          to_chan(ball_vel, 3 * NB), to_chan(ball_omega, 3 * NB))

        def from_chan(x, n):
            return jnp.transpose(x.reshape(n, B), (1, 0))

        return FusedStepOutputs(
            q_new=from_chan(outs[0], nd_tot),
            qd_new=from_chan(outs[1], nd_tot),
            tau=from_chan(outs[2], nd_tot),
            ball_pos=from_chan(outs[3], 3 * NB).reshape(B, NB, 3),
            ball_vel=from_chan(outs[4], 3 * NB).reshape(B, NB, 3),
            ball_omega=from_chan(outs[5], 3 * NB).reshape(B, NB, 3),
            impulses=from_chan(outs[6], nimp).reshape(B, nimp // 3, 3),
        )

    return jax.jit(run)


# ---------------------------------------------------------------------------
# floating-base fused substep (27-DOF whole-body scenes, C10 class)
# ---------------------------------------------------------------------------

class FloatingStepOutputs(NamedTuple):
    q_new: jnp.ndarray       # (B, nd)
    qd_new: jnp.ndarray      # (B, nd) post-contact
    tau: jnp.ndarray         # (B, nd)
    base_pos: jnp.ndarray    # (B, 3)
    base_quat: jnp.ndarray   # (B, 4)
    base_linvel: jnp.ndarray  # (B, 3) post-contact
    base_angvel: jnp.ndarray  # (B, 3) post-contact
    ball_pos: jnp.ndarray    # (B, 3)
    ball_vel: jnp.ndarray    # (B, 3)
    ball_omega: jnp.ndarray  # (B, 3) spin after friction coupling
    impulses: jnp.ndarray    # (B, ng+1, 3): per-geom-body impulse rows (ball
                             # reaction + art-vs-static) + TOTAL ball impulse
                             # row; with_torque -> (B, 2*ng+2, 3), appending
                             # per-geom contact-moment rows (about the geom
                             # body's frame origin) + the ball's moment row
                             # (about its center) — wrench lanes, / dt


def build_fused_substep_floating(model: ArticulationModel, kp, kd, gravity,
                                 dt_s: float, ball_cfg: dict,
                                 static_geoms: list, art_geoms: list,
                                 plane_cfg: dict,
                                 bounce_threshold: float = 0.2,
                                 drive_mode: int = 0,
                                 max_angular_velocity: float = 64.0,
                                 max_linear_velocity: float = 1000.0,
                                 rows_per_block: int = 8,
                                 art_static: bool = True,
                                 with_torque: bool = False,
                                 exact_support: bool = False):
    """ONE Pallas kernel for the ENTIRE substep of a floating-base humanoid
    pingpong scene (C10: 27-DOF whole-body G1, nv = 33): PD/effort drive ->
    floating-base forward dynamics (mass matrix over [omega, v, qdot] with the
    base composite link, RNEA-propagated bias, unrolled 33x33 Cholesky) ->
    semi-implicit Euler incl. base quat integration -> post FK -> ball
    contacts with full-body joint-space reactions (impulses kick the base
    too) -> articulation-vs-ground Baumgarte contacts (feet).

    Mirrors ops.dynamics.forward_dynamics + sim.Simulator._substep /
    _contacts_and_writeback exactly (same formulation, same ordering), so the
    XLA path is the parity oracle. The generalized-velocity layout matches
    ops.dynamics: ``u = [omega_world(3), v_origin_world(3), qdot(nd)]``.

    ``art_geoms``: dict(kind, link(-1 = welded to base), off_pos, off_quat,
    size, e, mu, radius_bound); offsets relative to the link dof frame (or
    the base frame for link -1). ``static_geoms`` as in build_fused_substep.
    ``plane_cfg``: dict(e, mu) for the articulation-geom ground contacts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tree = model.tree
    nd = tree.n_dof
    nv = nd + 6
    nl = nd + 1  # + base composite link (index nd)
    assert supports_floating(model)

    parent = [int(p) for p in tree.dof_parent]
    pre_pos = tree.dof_pre_pos.astype(np.float64)
    pre_quat = tree.dof_pre_quat.astype(np.float64)
    axis = tree.dof_axis.astype(np.float64)
    rev = [bool(t == U.JOINT_REVOLUTE) for t in tree.dof_type]
    # (nl, nd) incl. the zero base row; base columns handled symbolically
    mask = model.ancestor_mask
    m_l = model.link_mass.astype(np.float64)          # (nl,) incl. base
    com_l = model.link_com.astype(np.float64)         # (nl,3)
    I_l = model.link_inertia_com.astype(np.float64)   # (nl,3,3)
    armature = model.armature.astype(np.float64)      # (nv,)
    lo = tree.lower.astype(np.float64)
    hi = tree.upper.astype(np.float64)
    effort = tree.effort.astype(np.float64)
    maxvel = tree.max_velocity.astype(np.float64)
    max_ang = float(max_angular_velocity)
    max_lin = float(max_linear_velocity)
    gx, gy, gz = [float(v) for v in gravity]
    kp = np.asarray(kp, np.float64)
    kd = np.asarray(kd, np.float64)
    inv_mb = 1.0 / float(ball_cfg["mass"])
    rb_ = float(ball_cfg["radius"])
    e_ball = float(ball_cfg["restitution"])
    mu_ball = float(ball_cfg["friction"])
    max_lin_ball = float(ball_cfg.get("max_lin", 1000.0))
    max_ang_ball = float(ball_cfg.get("max_ang", 64.0))
    # PhysX velocity damping factors per substep (see simulator XLA path)
    lin_damp_f = max(0.0, 1.0 - float(ball_cfg.get("lin_damp", 0.0)) * dt_s)
    ang_damp_f = max(0.0, 1.0 - float(ball_cfg.get("ang_damp", 0.5)) * dt_s)
    # opt-in aerodynamics (0 = off, terms prune at trace time)
    kd_aero = float(ball_cfg.get("drag_k", 0.0))
    km_aero = float(ball_cfg.get("magnus_k", 0.0))
    # spin-friction coupling kappa = m r^2 / I (ops.contacts
    # resolve_sphere_impulse_spin); 0 decouples spin
    kappa = float(ball_cfg.get("kappa", 0.0))
    ng = len(art_geoms)
    # ground-contact material (matches _art_vs_ground_group)
    e_gnd = 0.5 * (0.0 + float(plane_cfg["e"]))
    mu_gnd = 0.5 * (0.8 + float(plane_cfg["mu"]))
    max_depen = float(plane_cfg.get("max_depen", 10.0))

    def kernel(q_ref, qd_ref, tgt_ref, eff_ref, bps_ref, bqt_ref, blv_ref,
               bav_ref, blp_ref, blv2_ref, blw_ref,
               qn_ref, qdn_ref, tau_ref, bpn_ref, bqn_ref, bvn_ref, bwn_ref,
               ballp_ref, ballv_ref, ballw_ref, imp_ref):
        q = [q_ref[d] for d in range(nd)]
        qd = [qd_ref[d] for d in range(nd)]
        zero = jnp.zeros_like(q[0])
        bp = (bps_ref[0], bps_ref[1], bps_ref[2])
        bq = (bqt_ref[0], bqt_ref[1], bqt_ref[2], bqt_ref[3])
        v_base = (blv_ref[0], blv_ref[1], blv_ref[2])
        w_base = (bav_ref[0], bav_ref[1], bav_ref[2])

        # -- drive torques ------------------------------------------------
        tau = []
        for d in range(nd):
            if drive_mode == 1:
                t_d = eff_ref[d]
            else:
                t_d = (float(kp[d]) * (tgt_ref[d] - q[d])
                       - float(kd[d]) * qd[d] + eff_ref[d])
            t_d = jnp.clip(t_d, -float(effort[d]), float(effort[d]))
            tau.append(t_d)
            tau_ref[d] = t_d

        # -- FK from the runtime base pose --------------------------------
        def fk(q_rows, bp_t, bq_t):
            fp, fq, axes_w = [], [], []
            for d in range(nd):
                if parent[d] < 0:
                    pp, pq = bp_t, bq_t
                else:
                    pp, pq = fp[parent[d]], fq[parent[d]]
                jp = _svadd(pp, _qrot_s(pq, tuple(float(v) for v in pre_pos[d])))
                jq = _qmul_s(pq, tuple(float(v) for v in pre_quat[d]))
                ax, ay, az = [float(v) for v in axis[d]]
                if rev[d]:
                    half = 0.5 * q_rows[d]
                    s_, c_ = jnp.sin(half), jnp.cos(half)
                    bq_d = _qmul_s(jq, (_sml1(ax, s_), _sml1(ay, s_),
                                        _sml1(az, s_), c_))
                else:
                    bq_d = jq
                    jp = _svadd(jp, _sscale(_qrot_s(jq, (ax, ay, az)), q_rows[d]))
                fp.append(jp)
                fq.append(bq_d)
                axes_w.append(_qrot_s(bq_d, tuple(float(v) for v in axis[d])))
            return fp, fq, axes_w

        fp, fq, axes_w = fk(q, bp, bq)
        # link origins/orientations incl. the base composite (index nd)
        org = fp + [bp]
        orient = fq + [bq]
        com_w, I_w = [], []
        for l in range(nl):
            com_w.append(_add(org[l], _qrot(orient[l],
                                            tuple(float(v) for v in com_l[l]))))
            I_w.append(_world_inertia(_rotmat_from_quat(orient[l]), I_l[l]))

        # -- velocity/bias propagation (u̇ = 0), base init (ω, wd=0, ao=0) --
        w_list, wd_list, ao_list = [], [], []
        for d in range(nd):
            if parent[d] < 0:
                w_p, wd_p, ao_p, o_p = w_base, (zero, zero, zero), (zero, zero, zero), bp
            else:
                w_p, wd_p, ao_p = w_list[parent[d]], wd_list[parent[d]], ao_list[parent[d]]
                o_p = fp[parent[d]]
            r = _sub(fp[d], o_p)
            ao_d = _add(ao_p, _add(_cross(wd_p, r), _cross(w_p, _cross(w_p, r))))
            a_w = axes_w[d]
            if rev[d]:
                w_list.append(_add(w_p, _scale(a_w, qd[d])))
                wd_list.append(_add(wd_p, _scale(_cross(w_p, a_w), qd[d])))
            else:
                w_list.append(w_p)
                wd_list.append(wd_p)
                ao_d = _add(ao_d, _scale(_cross(w_p, a_w), 2.0 * qd[d]))
            ao_list.append(ao_d)
        # base composite link rides the base directly
        w_list.append(w_base)
        wd_list.append((zero, zero, zero))
        ao_list.append((zero, zero, zero))

        f_list, n_list = [], []
        for l in range(nl):
            o_l = org[l] if l < nd else bp
            rc = _sub(com_w[l], o_l)
            a_com = _add(ao_list[l], _add(_cross(wd_list[l], rc),
                                          _cross(w_list[l], _cross(w_list[l], rc))))
            f_list.append(_scale((a_com[0] - gx, a_com[1] - gy, a_com[2] - gz),
                                 float(m_l[l])))
            Iw = I_w[l]
            n_list.append(_add(_sym_mat_vec(Iw, wd_list[l]),
                               _cross(w_list[l], _sym_mat_vec(Iw, w_list[l]))))

        # -- Jacobian columns (symbolic; constants prune) -------------------
        # col c of link l: Jang[l][c], Jlin[l][c]
        E3 = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))

        def Jang_col(l, c):
            if c < 3:
                return E3[c]
            if c < 6:
                return (0.0, 0.0, 0.0)
            d = c - 6
            if mask[l, d] and rev[d]:
                return axes_w[d]
            return (0.0, 0.0, 0.0)

        def Jlin_col(l, c):
            if c < 3:
                return _scross(E3[c], _svsub(com_w[l], bp))
            if c < 6:
                return E3[c - 3]
            d = c - 6
            if mask[l, d]:
                return (_cross(axes_w[d], _sub(com_w[l], fp[d]))
                        if rev[d] else axes_w[d])
            return (0.0, 0.0, 0.0)

        def col_nonzero(l, c):
            return c < 6 or mask[l, c - 6]

        # generalized bias + rhs
        tau_gen = [0.0] * 6 + tau
        rhs = []
        for c in range(nv):
            acc = 0.0
            for l in range(nl):
                if not col_nonzero(l, c):
                    continue
                acc = _sad2(acc, _sad2(_sdot(Jang_col(l, c), n_list[l]),
                                       _sdot(Jlin_col(l, c), f_list[l])))
            rhs.append(_ssub(tau_gen[c], acc))

        # mass matrix (lower triangle), memoizing I_w · Jang per (l, c)
        IwJ = {}

        def iw_jang(l, c):
            key = (l, c)
            if key not in IwJ:
                col = Jang_col(l, c)
                IwJ[key] = ((0.0, 0.0, 0.0) if all(_isz(x) for x in col)
                            else _sym_mat_vec(I_w[l], col))
            return IwJ[key]

        Jl_memo = {}

        def jlin(l, c):
            key = (l, c)
            if key not in Jl_memo:
                Jl_memo[key] = Jlin_col(l, c)
            return Jl_memo[key]

        M = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                acc = 0.0
                for l in range(nl):
                    if not (col_nonzero(l, i) and col_nonzero(l, j)):
                        continue
                    term = _sad2(_sdot(Jang_col(l, i), iw_jang(l, j)),
                                 _sml(float(m_l[l]), _sdot(jlin(l, i), jlin(l, j))))
                    acc = _sad2(acc, term)
                if i == j:
                    acc = _sad2(acc, float(armature[i]))
                M[i][j] = acc

        # -- unrolled nv x nv Cholesky + solves ----------------------------
        import math
        Lm = [[None] * (i + 1) for i in range(nv)]
        for j in range(nv):
            s_ = M[j][j]
            for k2 in range(j):
                s_ = _ssub(s_, _sml(Lm[j][k2], Lm[j][k2]))
            if isinstance(s_, float):
                dia = math.sqrt(max(s_, 1e-12))
                inv_d = 1.0 / dia
            else:
                dia = jnp.sqrt(jnp.maximum(s_, 1e-12))
                inv_d = 1.0 / dia
            Lm[j][j] = dia
            for i in range(j + 1, nv):
                s_ = M[i][j]
                for k2 in range(j):
                    s_ = _ssub(s_, _sml(Lm[i][k2], Lm[j][k2]))
                Lm[i][j] = _sml(s_, inv_d)

        def fwd_sub(b):
            y = [None] * nv
            for i in range(nv):
                s_ = b[i]
                for j in range(i):
                    s_ = _ssub(s_, _sml(Lm[i][j], y[j]))
                y[i] = (s_ / Lm[i][i]) if not _isz(s_) else 0.0
            return y

        def back_sub(y):
            x = [None] * nv
            for i in reversed(range(nv)):
                s_ = y[i]
                for j in range(i + 1, nv):
                    s_ = _ssub(s_, _sml(Lm[j][i], x[j]))
                x[i] = (s_ / Lm[i][i]) if not _isz(s_) else 0.0
            return x

        udot = back_sub(fwd_sub(rhs))

        # -- semi-implicit Euler + joint limits + base integration ---------
        # base angular velocity clamped at max_angular_velocity (reference
        # AssetOptions.max_angular_velocity); DOF velocity at the URDF limit
        # (PhysX maxJointVelocity) — both required for stability parity.
        u = [None] * nv
        for c in range(6):
            u0 = w_base[c] if c < 3 else v_base[c - 3]
            u[c] = _sad2(u0, _sml(dt_s, udot[c]))
            if c < 3 and max_ang > 0.0:
                u[c] = jnp.clip(u[c], -max_ang, max_ang)
            if c >= 3 and max_lin > 0.0:
                u[c] = jnp.clip(u[c], -max_lin, max_lin)
        q_new = []
        for d in range(nd):
            v = _sad2(qd[d], _sml(dt_s, udot[6 + d]))
            if float(maxvel[d]) > 0.0:
                v = jnp.clip(v, -float(maxvel[d]), float(maxvel[d]))
            p = q[d] + dt_s * v
            at_lo = p < float(lo[d])
            at_hi = p > float(hi[d])
            p = jnp.clip(p, float(lo[d]), float(hi[d]))
            v = jnp.where(at_lo, jnp.maximum(v, 0.0), v)
            v = jnp.where(at_hi, jnp.minimum(v, 0.0), v)
            q_new.append(p)
            u[6 + d] = v
            qn_ref[d] = p
        omega_n = (u[0], u[1], u[2])
        vel_n = (u[3], u[4], u[5])
        bp2 = _add(bp, _scale(vel_n, dt_s))
        # quat update: q̇ = 0.5 * [ω,0] ⊗ q, then normalize
        wq = (omega_n[0], omega_n[1], omega_n[2], zero)
        dq = _qmul(wq, bq)
        bq2 = tuple(bq[i] + 0.5 * dt_s * dq[i] for i in range(4))
        qn = jnp.sqrt(jnp.maximum(
            bq2[0] * bq2[0] + bq2[1] * bq2[1] + bq2[2] * bq2[2] + bq2[3] * bq2[3],
            1e-12))
        bq2 = tuple(c / qn for c in bq2)
        for i in range(3):
            bpn_ref[i] = bp2[i]
        for i in range(4):
            bqn_ref[i] = bq2[i]

        # -- post-step FK (new base pose) for the contact phase ------------
        fp2, fq2, axes2 = fk(q_new, bp2, bq2)
        org2 = fp2 + [bp2]
        orient2 = fq2 + [bq2]

        # world pose of every articulation geom at the post-step config
        geom_pos, geom_quat = [], []
        for g in art_geoms:
            link = int(g["link"])
            li = nd if link < 0 else link
            gp = _svadd(org2[li], _qrot_s(orient2[li], tuple(float(v) for v in g["off_pos"])))
            gq = _qmul_s(orient2[li], tuple(float(v) for v in g["off_quat"]))
            geom_pos.append(gp)
            geom_quat.append(gq)

        # contact-point Jacobian columns (shared by ball + ground phases)
        def point_cols(link, cp):
            cols = [None] * nv
            rbv = _sub(cp, bp2)
            cols[0] = (0.0, _ssub(0.0, rbv[2]), rbv[1])
            cols[1] = (rbv[2], 0.0, _ssub(0.0, rbv[0]))
            cols[2] = (_ssub(0.0, rbv[1]), rbv[0], 0.0)
            cols[3] = (1.0, 0.0, 0.0)
            cols[4] = (0.0, 1.0, 0.0)
            cols[5] = (0.0, 0.0, 1.0)
            for i in range(nd):
                if link >= 0 and mask[link, i]:
                    cols[6 + i] = (_cross(axes2[i], _sub(cp, fp2[i]))
                                   if rev[i] else axes2[i])
                else:
                    cols[6 + i] = (0.0, 0.0, 0.0)
            return cols

        def jt_dot(cols, vec):
            return [_sdot(cols[c], vec) for c in range(nv)]

        def j_u(cols):
            vp = (0.0, 0.0, 0.0)
            for c in range(nv):
                vp = _svadd(vp, _sscale(cols[c], u[c]))
            return vp

        # ------------------- ball stage -----------------------------------
        pos = (blp_ref[0], blp_ref[1], blp_ref[2])
        vel = (blv2_ref[0] + gx * dt_s, blv2_ref[1] + gy * dt_s,
               blv2_ref[2] + gz * dt_s)
        vel = _scale(vel, lin_damp_f)
        omg = _scale((blw_ref[0], blw_ref[1], blw_ref[2]), ang_damp_f)
        if kd_aero > 0.0:
            vel = _sub(vel, _scale(vel, dt_s * kd_aero
                                   * jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
        if km_aero > 0.0:
            vel = _add(vel, _scale(_cross(omg, vel), dt_s * km_aero))

        def resolve_static(vel, omg, dist, n, e, mu, dist_now=None):
            # spin-aware (ops.contacts.resolve_sphere_impulse_spin);
            # penetration-only on the swept activation depth ``dist``
            if dist_now is None:
                dist_now = dist
            vn = _dot(vel, n)
            active = (dist < 0.0) & (vn < 0.0)
            e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
            jn = jnp.where(active, -(1.0 + e_eff) * vn, 0.0)
            slip = (_sub(vel, _scale(_cross(omg, n), rb_))
                    if kappa > 0 else vel)
            vt = _sub(slip, _scale(n, _dot(slip, n)))
            vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
            jt = jnp.where(active, jnp.minimum(mu * jn, vt_n / (1.0 + kappa)), 0.0)
            t_hat = _scale(vt, 1.0 / vt_n)
            dv = _sub(_scale(n, jn), _scale(t_hat, jt))
            omg2 = _add(omg, _scale(_cross(n, t_hat), kappa / rb_ * jt))
            push = _scale(n, jnp.where(active, jnp.maximum(-dist_now, 0.0), 0.0))
            return _add(vel, dv), omg2, push, dv

        def swept_local(eval_l, c0, dv_l, samples=4):
            # first-penetrating sample (ops.contacts.swept_frame), stepped in
            # the geom's LOCAL frame (one add per sample; the caller rotates
            # only the selected entry normal back to world)
            d0, n0 = eval_l(c0)
            bd, bn, found = d0, n0, d0 < 0.0
            ck = c0
            for kk in range(1, samples + 1):
                ck = _add(ck, dv_l)
                dk, nk = eval_l(ck)
                take = (~found) & (dk < 0.0)
                bd = jnp.where(take, dk, bd)
                bn = tuple(jnp.where(take, nk[i], bn[i]) for i in range(3))
                found = found | (dk < 0.0)
            return bd, bn, d0

        e = 0.5 * (e_ball + float(ball_cfg.get("plane_e", 0.0)))
        mu = 0.5 * (mu_ball + float(ball_cfg.get("plane_mu", 1.0)))
        d0p = pos[2] - rb_
        vel, omg, push, dv = resolve_static(
            vel, omg, jnp.minimum(d0p, d0p + vel[2] * dt_s),
            (zero, zero, zero + 1.0), e, mu, dist_now=d0p)
        pos = _add(pos, push)
        s_imp = list(_scale(dv, 1.0 / inv_mb))
        # wrench accumulators (with_torque only): ball moment about its
        # center; per-geom impulse/moment rows (written at the end so the
        # art-vs-static contributions land in the same rows as on XLA)
        b_tq = (list(_sscale(_scross1((0.0, 0.0, 1.0), dv), -rb_ / inv_mb))
                if with_torque else None)
        geom_imp = [[zero, zero, zero] for _ in range(ng)]
        geom_tq = [[zero, zero, zero] for _ in range(ng)] if with_torque else None

        def borg_of(g, gi):
            link = int(g["link"])
            li = nd if link < 0 else link
            return _svadd(org2[li], _qrot_s(
                orient2[li], tuple(float(v) for v in g["body_off"])))

        for g in static_geoms:
            gp = tuple(float(v) for v in g["pos"])
            gq = tuple(float(v) for v in g["quat"])
            gqi = (-gq[0], -gq[1], -gq[2], gq[3])
            kind_s = int(g["kind"])

            def eval_l(c_local, g=g, kind_s=kind_s):
                if kind_s == U.GEOM_SPHERE:
                    d2 = _dot(c_local, c_local)
                    dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                    return (dn - float(g["size"][0]) - rb_,
                            _scale(c_local, 1.0 / dn))
                elif kind_s == U.GEOM_BOX:
                    return _sphere_box_generic(c_local, g["size"], rb_)
                return _sphere_cyl_generic(c_local, g["size"][0], g["size"][1], rb_)

            c0 = _qrot_s(gqi, _sub(pos, gp))
            dv_l = _qrot_s(gqi, _scale(vel, dt_s / 2))
            dist, n_l, d0 = swept_local(eval_l, c0, dv_l, samples=2)
            n = _qrot_s(gq, n_l)
            e = 0.5 * (e_ball + float(g["e"]))
            mu = 0.5 * (mu_ball + float(g["mu"]))
            vel, omg, push, dv = resolve_static(vel, omg, dist, n, e, mu,
                                                dist_now=d0)
            pos = _add(pos, push)
            for i3 in range(3):
                s_imp[i3] = s_imp[i3] + dv[i3] / inv_mb
            if with_torque:
                tq_c = _sscale(_scross1(n, dv), -rb_ / inv_mb)
                for i3 in range(3):
                    b_tq[i3] = b_tq[i3] + tq_c[i3]

        # articulated geoms with FULL-BODY joint-space reactions
        for gi, g in enumerate(art_geoms):
            gp, gq = geom_pos[gi], geom_quat[gi]
            gqi = (-gq[0], -gq[1], -gq[2], gq[3])
            kind = int(g["kind"])

            def eval_l(c_local, g=g, kind=kind):
                if kind == U.GEOM_SPHERE:
                    d2 = _dot(c_local, c_local)
                    dn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                    return (dn - float(g["size"][0]) - rb_,
                            _scale(c_local, 1.0 / dn))
                elif kind == U.GEOM_BOX:
                    return _sphere_box_generic(c_local, g["size"], rb_)
                return _sphere_cyl_generic(c_local, g["size"][0], g["size"][1], rb_)

            c0 = _qrot_s(gqi, _sub(pos, gp))
            d_now, n_now_l = eval_l(c0)
            n_now = _qrot_s(gq, n_now_l)
            cp = _sub(pos, _scale(n_now, rb_))
            cols = point_cols(int(g["link"]), cp)
            v_point = j_u(cols)
            v_rel = _sub(vel, v_point)
            # swept-sample CCD along the relative motion, stepped in the
            # geom's local frame (entry normal rotated back once)
            dv_l = _qrot_s(gqi, _scale(v_rel, dt_s / 4))
            dist, n_l, found = d_now, n_now_l, d_now < 0.0
            ck = c0
            for kk in range(1, 5):
                ck = _add(ck, dv_l)
                dk, nk = eval_l(ck)
                take = (~found) & (dk < 0.0)
                dist = jnp.where(take, dk, dist)
                n_l = tuple(jnp.where(take, nk[i], n_l[i]) for i in range(3))
                found = found | (dk < 0.0)
            n = _qrot_s(gq, n_l)
            vn = _dot(v_rel, n)
            active = (dist < 0.0) & (vn < 0.0)
            e = 0.5 * (e_ball + float(g["e"]))
            mu = 0.5 * (mu_ball + float(g["mu"]))
            e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e, 0.0)
            yn = fwd_sub(jt_dot(cols, n))
            w_n = inv_mb + sum(v_ * v_ for v_ in yn if not _isz(v_))
            Pn = jnp.where(active, -(1.0 + e_eff) * vn / w_n, 0.0)
            slip = (_sub(v_rel, _scale(_cross(omg, n), rb_))
                    if kappa > 0 else v_rel)
            vt = _sub(slip, _scale(n, _dot(slip, n)))
            vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
            t_hat = _scale(vt, 1.0 / vt_n)
            yt = fwd_sub(jt_dot(cols, t_hat))
            w_t = (1.0 + kappa) * inv_mb + sum(v_ * v_ for v_ in yt if not _isz(v_))
            Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_n / w_t), 0.0)
            P = _sub(_scale(n, Pn), _scale(t_hat, Pt))
            vel = _add(vel, _scale(P, inv_mb))
            omg = _add(omg, _scale(_cross(n, t_hat), kappa * inv_mb / rb_ * Pt))
            du = back_sub([_sad2(_sml(yn[i], -Pn), _sml(yt[i], Pt))
                           for i in range(nv)])
            for c in range(nv):
                u[c] = _sad2(u[c], du[c])
            pos = _add(pos, _scale(n, jnp.where(active, jnp.maximum(-d_now, 0.0), 0.0)))
            # row ng is the ball's TOTAL impulse (incl. art reactions)
            for i3 in range(3):
                s_imp[i3] = s_imp[i3] + P[i3]
            geom_imp[gi] = [-P[0], -P[1], -P[2]]
            if with_torque:
                tq_c = _sscale(_scross1(n_now, P), -rb_)
                tq_g = _scross1(_svsub(cp, borg_of(g, gi)), _sscale(P, -1.0))
                for i3 in range(3):
                    b_tq[i3] = b_tq[i3] + tq_c[i3]
                    geom_tq[gi][i3] = geom_tq[gi][i3] + tq_g[i3]

        # -------- articulation links vs static geoms (table slab, net):
        # a fallen floating-base humanoid rests ON the table; mirrors
        # simulator._art_vs_static_group with the full 6+nd-channel Jacobian
        if art_static:
            for gi, g in enumerate(art_geoms):
                center = geom_pos[gi]
                rbound = float(g["radius_bound"])
                for sg in static_geoms:
                    sgp = tuple(float(v) for v in sg["pos"])
                    sgq = tuple(float(v) for v in sg["quat"])
                    c_local = _qrot_s((-sgq[0], -sgq[1], -sgq[2], sgq[3]),
                                    _sub(center, sgp))
                    kind_s = int(sg["kind"])
                    if kind_s == U.GEOM_SPHERE:
                        d2 = _dot(c_local, c_local)
                        dnn = jnp.sqrt(jnp.maximum(d2, 1e-18))
                        n_local = _scale(c_local, 1.0 / dnn)
                        dist = dnn - float(sg["size"][0]) - rbound
                    elif kind_s == U.GEOM_BOX:
                        dist, n_local = _sphere_box_generic(c_local, sg["size"], rbound)
                    else:
                        dist, n_local = _sphere_cyl_generic(
                            c_local, sg["size"][0], sg["size"][1], rbound)
                    n = _qrot_s(sgq, n_local)
                    if (exact_support and
                            int(g["kind"]) in (U.GEOM_CYLINDER, U.GEOM_BOX)):
                        dist, point = _support_correct(g, geom_quat[gi], n,
                                                       dist, center, rbound)
                    else:
                        point = _sub(center, _scale(n, rbound))
                    cols = point_cols(int(g["link"]), point)
                    v_point = j_u(cols)
                    vn = _dot(v_point, n)
                    active = (dist < 0.0) & (vn < 0.1)
                    bias = jnp.minimum(
                        0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0), max_depen)
                    e_as = 0.5 * (float(g["e"]) + float(sg["e"]))
                    mu_as = 0.5 * (float(g["mu"]) + float(sg["mu"]))
                    e_eff = jnp.where(jnp.abs(vn) > bounce_threshold, e_as, 0.0)
                    yn = fwd_sub(jt_dot(cols, n))
                    w_n = sum(v_ * v_ for v_ in yn if not _isz(v_))
                    Pn = jnp.where(active,
                                   (-(1.0 + e_eff) * jnp.minimum(vn, 0.0) + bias)
                                   / jnp.maximum(w_n, 1e-9), 0.0)
                    vt = _sub(v_point, _scale(n, vn))
                    vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
                    t_hat = _scale(vt, 1.0 / vt_n)
                    yt = fwd_sub(jt_dot(cols, t_hat))
                    w_t = sum(v_ * v_ for v_ in yt if not _isz(v_))
                    Pt = jnp.where(active,
                                   jnp.minimum(mu_as * Pn,
                                               vt_n / jnp.maximum(w_t, 1e-9)), 0.0)
                    s_r = _rest_smooth(dist, vn, bounce_threshold)
                    Pn = Pn * s_r
                    Pt = Pt * s_r
                    du = back_sub([_sad2(_sml(yn[i], Pn), _sml(yt[i], -Pt))
                                   for i in range(nv)])
                    for c in range(nv):
                        u[c] = _sad2(u[c], du[c])
                    # record at the geom body (XLA adds art-static P/tq to
                    # ncf/nct at grp.body; ground contacts stay unrecorded
                    # on both paths)
                    P_as = _sub(_scale(n, Pn), _scale(t_hat, Pt))
                    for i3 in range(3):
                        geom_imp[gi][i3] = geom_imp[gi][i3] + P_as[i3]
                    if with_torque:
                        tq_as = _scross1(_svsub(point, borg_of(g, gi)), P_as)
                        for i3 in range(3):
                            geom_tq[gi][i3] = geom_tq[gi][i3] + tq_as[i3]

        # ---------------- articulation vs ground (feet) --------------------
        for gi, g in enumerate(art_geoms):
            center = geom_pos[gi]
            radius = float(g["radius_bound"])
            dist = center[2] - radius
            point = (center[0], center[1], center[2] - radius)
            cols = point_cols(int(g["link"]), point)
            v_point = j_u(cols)
            vn = v_point[2]
            active = (dist < 0.0) & (vn < 0.1)
            # capped at max_depenetration_velocity (matches _art_vs_ground_group)
            bias = jnp.minimum(0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                               max_depen)
            n = (zero, zero, zero + 1.0)
            yn = fwd_sub(jt_dot(cols, n))
            w_n = sum(v_ * v_ for v_ in yn if not _isz(v_))
            Pn = jnp.where(active,
                           (-(1.0 + e_gnd) * jnp.minimum(vn, 0.0) + bias)
                           / jnp.maximum(w_n, 1e-9), 0.0)
            vt = _sub(v_point, _scale(n, vn))
            vt_n = jnp.sqrt(jnp.maximum(_dot(vt, vt), 1e-18))
            t_hat = _scale(vt, 1.0 / vt_n)
            yt = fwd_sub(jt_dot(cols, t_hat))
            w_t = sum(v_ * v_ for v_ in yt if not _isz(v_))
            Pt = jnp.where(active,
                           jnp.minimum(mu_gnd * Pn, vt_n / jnp.maximum(w_t, 1e-9)), 0.0)
            s_r = _rest_smooth(dist, vn, bounce_threshold)
            Pn = Pn * s_r
            Pt = Pt * s_r
            du = back_sub([_sad2(_sml(yn[i], Pn), _sml(yt[i], -Pt))
                           for i in range(nv)])
            for c in range(nv):
                u[c] = _sad2(u[c], du[c])

        # ---------------- writeback ---------------------------------------
        for i3 in range(3):
            imp_ref[ng * 3 + i3] = s_imp[i3]
        for gi in range(ng):
            for i3 in range(3):
                imp_ref[gi * 3 + i3] = geom_imp[gi][i3]
        if with_torque:
            for gi in range(ng):
                for i3 in range(3):
                    imp_ref[(ng + 1 + gi) * 3 + i3] = geom_tq[gi][i3]
            for i3 in range(3):
                imp_ref[(2 * ng + 1) * 3 + i3] = b_tq[i3]
        for d in range(nd):
            qdn_ref[d] = u[6 + d]
        for i in range(3):
            bwn_ref[i] = u[i]
            bvn_ref[i] = u[3 + i]
        # ball AssetOptions.max_linear_velocity — PhysX caps the MAGNITUDE
        vel = _scale(vel, jnp.minimum(
            1.0, max_lin_ball / jnp.sqrt(jnp.maximum(_dot(vel, vel), 1e-18))))
        ballp_ref[0] = pos[0] + vel[0] * dt_s
        ballp_ref[1] = pos[1] + vel[1] * dt_s
        ballp_ref[2] = pos[2] + vel[2] * dt_s
        ballv_ref[0] = vel[0]
        ballv_ref[1] = vel[1]
        ballv_ref[2] = vel[2]
        omg = _scale(omg, jnp.minimum(
            1.0, max_ang_ball / jnp.sqrt(jnp.maximum(_dot(omg, omg), 1e-18))))
        ballw_ref[0] = omg[0]
        ballw_ref[1] = omg[1]
        ballw_ref[2] = omg[2]

    def run(q, qd, targets, efforts, base_pos, base_quat, base_linvel,
            base_angvel, ball_pos, ball_vel, ball_omega) -> FloatingStepOutputs:
        B = q.shape[0]
        assert B % LANE == 0
        R = B // LANE
        rb = min(rows_per_block, R)
        while R % rb:
            rb -= 1

        def to_chan(x, n):
            return jnp.transpose(x.reshape(B, n), (1, 0)).reshape(n, R, LANE)

        grid = (R // rb,)
        chan = lambda n: pl.BlockSpec((n, rb, LANE), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
        nimp = (2 * ng + 2) * 3 if with_torque else ng * 3 + 3
        in_ns = [nd, nd, nd, nd, 3, 4, 3, 3, 3, 3, 3]
        out_ns = [nd, nd, nd, 3, 4, 3, 3, 3, 3, 3, nimp]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[chan(n) for n in in_ns],
            out_specs=tuple(chan(n) for n in out_ns),
            out_shape=tuple(jax.ShapeDtypeStruct((n, R, LANE), jnp.float32)
                            for n in out_ns),
            interpret=jax.default_backend() == "cpu",
        )(to_chan(q, nd), to_chan(qd, nd), to_chan(targets, nd),
          to_chan(efforts, nd), to_chan(base_pos, 3), to_chan(base_quat, 4),
          to_chan(base_linvel, 3), to_chan(base_angvel, 3),
          to_chan(ball_pos, 3), to_chan(ball_vel, 3), to_chan(ball_omega, 3))

        def from_chan(x, n):
            return jnp.transpose(x.reshape(n, B), (1, 0))

        return FloatingStepOutputs(
            q_new=from_chan(outs[0], nd),
            qd_new=from_chan(outs[1], nd),
            tau=from_chan(outs[2], nd),
            base_pos=from_chan(outs[3], 3),
            base_quat=from_chan(outs[4], 4),
            base_linvel=from_chan(outs[5], 3),
            base_angvel=from_chan(outs[6], 3),
            ball_pos=from_chan(outs[7], 3),
            ball_vel=from_chan(outs[8], 3),
            ball_omega=from_chan(outs[9], 3),
            impulses=from_chan(outs[10], nimp).reshape(B, nimp // 3, 3),
        )

    return jax.jit(run)
