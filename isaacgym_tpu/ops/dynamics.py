"""Articulated rigid-body dynamics in generalized coordinates, TPU-first.

Capability equivalent of the reference's native PhysX reduced-coordinate
solver (``gym.simulate``; SURVEY.md §2 N1), re-designed for XLA rather than
translated: instead of sequential Featherstone ABA propagations (branchy,
6x6-matrix chains), the equations of motion are assembled as **dense batched
tensor contractions**:

  * geometric Jacobians for every articulated link from FK world frames
    (static ancestor masks baked at compile time),
  * mass matrix  ``M = J_ang^T I J_ang + m J_lin^T J_lin``  via einsum (MXU),
  * Coriolis/centrifugal/gravity bias via one exact ``jax.jvp`` through the
    velocity kinematics (d/dt of J(q)·u with u̇=0) — no hand-derived
    Christoffel terms,
  * one batched Cholesky solve for  ``u̇ = M⁻¹ (τ − bias)``.

Supports fixed and floating bases. Generalized velocity layout:
``u = [ω_base(3,world), v_base(3,world), q̇]`` when floating, else ``q̇``.

All functions are single-env; batch with ``vmap`` (the simulator does).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models.kinematics import KinematicTree, fk_dof_frames
from isaacgym_tpu.utils import rotations as rot


@dataclass(frozen=True)
class ArticulationModel:
    """Static (compile-time) dynamics view of a KinematicTree."""

    tree: KinematicTree
    floating: bool
    nv: int                          # generalized velocity dimension
    ancestor_mask: np.ndarray        # (nl, nd) link l moved by joint dof d
    link_mass: np.ndarray            # (nl,)
    link_com: np.ndarray             # (nl,3) composite com in link body frame
    link_inertia_com: np.ndarray     # (nl,3,3) composite inertia about com, body frame
    armature: np.ndarray             # (nv,)
    is_revolute: np.ndarray          # (nd,) 1.0 for revolute, 0.0 prismatic

    @property
    def nd(self) -> int:
        return self.tree.n_dof

    @property
    def nl(self) -> int:
        # one articulated link per dof, plus the base composite when floating
        return self.tree.n_dof + (1 if self.floating else 0)


def build_articulation(tree: KinematicTree) -> ArticulationModel:
    nd = tree.n_dof
    # ancestor-or-self mask over the dof tree
    mask = np.zeros((nd, nd), dtype=np.float32)
    for l in range(nd):
        a = l
        while a != -1:
            mask[l, a] = 1.0
            a = int(tree.dof_parent[a])
    # composite inertia about composite com (stored about body origin)
    m = tree.comp_mass
    c = tree.comp_com
    I_com = np.zeros_like(tree.comp_inertia)
    for l in range(nd):
        cc = c[l]
        shift = m[l] * ((cc @ cc) * np.eye(3) - np.outer(cc, cc))
        I_com[l] = tree.comp_inertia[l] - shift
    floating = tree.floating_base
    nv = nd + (6 if floating else 0)
    armature = np.concatenate([np.zeros(6, np.float32), tree.armature]) if floating else tree.armature
    link_mass = m.astype(np.float32)
    link_com = c.astype(np.float32)
    link_inertia = I_com.astype(np.float32)
    if floating:
        # the base's welded composite is a link of its own, moved only by the
        # 6 base columns (zero row in the joint ancestor mask)
        bm = tree.base_comp_mass
        bc = tree.base_comp_com
        shift = bm * ((bc @ bc) * np.eye(3) - np.outer(bc, bc))
        b_inertia = tree.base_comp_inertia - shift
        mask = np.concatenate([mask, np.zeros((1, nd), np.float32)], axis=0)
        link_mass = np.concatenate([link_mass, np.asarray([bm], np.float32)])
        link_com = np.concatenate([link_com, bc[None].astype(np.float32)], axis=0)
        link_inertia = np.concatenate([link_inertia, b_inertia[None].astype(np.float32)], axis=0)
    return ArticulationModel(
        tree=tree,
        floating=floating,
        nv=nv,
        ancestor_mask=mask,
        link_mass=link_mass,
        link_com=link_com,
        link_inertia_com=link_inertia,
        armature=armature.astype(np.float32),
        is_revolute=(tree.dof_type == U.JOINT_REVOLUTE).astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Kinematic quantities (single env)
# ---------------------------------------------------------------------------

def _link_frames(model: ArticulationModel, base_pos, base_quat, q):
    """World pose of each dof child frame: (nd,3), (nd,4)."""
    return fk_dof_frames(model.tree, base_pos, base_quat, q)


def link_geometry(model: ArticulationModel, base_pos, base_quat, q):
    """Returns (frame_pos (nd,3), frame_quat (nd,4), com_w (nl,3),
    axis_w (nd,3), I_w (nl,3,3))."""
    fp, fq = _link_frames(model, base_pos, base_quat, q)
    axis_w = rot.quat_rotate(fq, jnp.asarray(model.tree.dof_axis))
    if model.floating:
        # append the base composite link (moved only by base columns)
        frames_q = jnp.concatenate([fq, base_quat[None]], axis=0)
    else:
        frames_q = fq
    com_local = jnp.asarray(model.link_com)
    origins = jnp.concatenate([fp, base_pos[None]], axis=0) if model.floating else fp
    com_w = origins + rot.quat_rotate(frames_q, com_local)
    R = rot.quat_to_rotmat(frames_q)                             # (nl,3,3)
    I_w = jnp.einsum("lij,ljk,lmk->lim", R, jnp.asarray(model.link_inertia_com), R)
    return fp, fq, com_w, axis_w, I_w


def jacobians(model: ArticulationModel, frame_pos, axis_w, com_w, base_pos):
    """Geometric Jacobians at each link com.

    Returns (J_ang, J_lin): (nl, 3, nv).
    """
    mask = jnp.asarray(model.ancestor_mask)                      # (nl, nd)
    rev = jnp.asarray(model.is_revolute)                         # (nd,)
    # joint columns
    r = com_w[:, None, :] - frame_pos[None, :, :]                # (nl, nd, 3)
    ang_cols = axis_w[None, :, :] * (mask * rev)[..., None]      # (nl, nd, 3)
    lin_rev = jnp.cross(axis_w[None, :, :], r) * (mask * rev)[..., None]
    lin_pris = axis_w[None, :, :] * (mask * (1.0 - rev))[..., None]
    lin_cols = lin_rev + lin_pris
    J_ang_j = jnp.swapaxes(ang_cols, 1, 2)                       # (nl, 3, nd)
    J_lin_j = jnp.swapaxes(lin_cols, 1, 2)
    if not model.floating:
        return J_ang_j, J_lin_j
    nl = model.nl
    eye = jnp.broadcast_to(jnp.eye(3), (nl, 3, 3))
    zeros = jnp.zeros((nl, 3, 3))
    rb = com_w - base_pos                                        # (nl,3)
    # J_lin for base rotation cols: e_i x rb  -> -skew(rb)
    def skew(v):
        zero = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ], -2)
    J_ang = jnp.concatenate([eye, zeros, J_ang_j], axis=-1)      # (nl,3,6+nd)
    J_lin = jnp.concatenate([-skew(rb), eye, J_lin_j], axis=-1)
    return J_ang, J_lin


def mass_matrix(model: ArticulationModel, J_ang, J_lin, I_w, mass_scale=None):
    m = jnp.asarray(model.link_mass)
    if mass_scale is not None:
        m = m * mass_scale
    M = (jnp.einsum("lai,lab,lbj->ij", J_ang, I_w, J_ang)
         + jnp.einsum("l,lai,laj->ij", m, J_lin, J_lin))
    return M + jnp.diag(jnp.asarray(model.armature))


def _qpos_pack(model, base_pos, base_quat, q):
    if model.floating:
        return jnp.concatenate([base_pos, base_quat, q])
    return q


def _qpos_unpack(model, qpos):
    if model.floating:
        return qpos[0:3], qpos[3:7], qpos[7:]
    zero3 = jnp.zeros(3)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    return zero3, ident, qpos


def _qpos_dot(model: ArticulationModel, qpos, u):
    """Time derivative of the generalized position under velocity u."""
    if not model.floating:
        return u
    base_quat = qpos[3:7]
    omega = u[0:3]
    vq = jnp.concatenate([omega, jnp.zeros(1)])
    quat_dot = 0.5 * rot.quat_mul(vq, base_quat)
    return jnp.concatenate([u[3:6], quat_dot, u[6:]])


def link_velocities(model: ArticulationModel, qpos, u,
                    base_pos=None, base_quat=None):
    """(ω_L, v_comL) stacked: returns (nl, 6) array [ω; v_com].

    For fixed-base articulations ``qpos`` carries only the joint angles; the
    (constant) base pose MUST be supplied explicitly — evaluating at the
    identity base silently skews the Coriolis bias for yawed bases (C5's
    -30 deg humanoid, C8's 180 deg robot2)."""
    bp0, bq0, q = _qpos_unpack(model, qpos)
    if not model.floating:
        if base_pos is not None:
            bp0 = base_pos
        if base_quat is not None:
            bq0 = base_quat
    fp, fq, com_w, axis_w, I_w = link_geometry(model, bp0, bq0, q)
    J_ang, J_lin = jacobians(model, fp, axis_w, com_w, bp0)
    w = J_ang @ u
    v = J_lin @ u
    return jnp.concatenate([w, v], axis=-1)


def forward_dynamics(model: ArticulationModel, base_pos, base_quat, q, u,
                     tau, gravity, ext_forces: Optional[Tuple] = None,
                     mass_scale=None):
    """Generalized accelerations and the mass-matrix Cholesky factor.

    Args:
      tau: (nv,) applied generalized force (PD + limits etc.).
      gravity: (3,) world gravity.
      ext_forces: optional ((nl,3) force_at_com, (nl,3) torque) external wrench
        per link in world frame.
    Returns:
      (udot (nv,), chol (nv,nv)) — the factor is reused for contact impulses.
    """
    qpos = _qpos_pack(model, base_pos, base_quat, q)
    fp, fq, com_w, axis_w, I_w = link_geometry(model, base_pos, base_quat, q)
    if mass_scale is not None:
        I_w = I_w * mass_scale  # uniform mass DR scales inertias identically
    J_ang, J_lin = jacobians(model, fp, axis_w, com_w, base_pos)
    M = mass_matrix(model, J_ang, J_lin, I_w,
                    mass_scale=(mass_scale if mass_scale is not None else None))

    # bias accelerations via jvp: d/dt (J(q)·u) with u fixed
    vel_fn = lambda qp: link_velocities(model, qp, u, base_pos, base_quat)
    wv, wv_dot = jax.jvp(vel_fn, (qpos,), (_qpos_dot(model, qpos, u),))
    w, wdot = wv[:, 0:3], wv_dot[:, 0:3]
    a_com = wv_dot[:, 3:6]

    m = jnp.asarray(model.link_mass)
    if mass_scale is not None:
        m = m * mass_scale
    f_bias = m[:, None] * (a_com - gravity[None, :])             # (nl,3)
    n_bias = jnp.einsum("lab,lb->la", I_w, wdot) + jnp.cross(w, jnp.einsum("lab,lb->la", I_w, w))

    Q_bias = jnp.einsum("lai,la->i", J_ang, n_bias) + jnp.einsum("lai,la->i", J_lin, f_bias)

    rhs = tau - Q_bias
    if ext_forces is not None:
        f_ext, n_ext = ext_forces
        rhs = rhs + jnp.einsum("lai,la->i", J_lin, f_ext) + jnp.einsum("lai,la->i", J_ang, n_ext)

    # unrolled small-matrix factorization (ops.linalg): ~20x faster than the
    # loop-based lax cholesky on TPU for joint-space sizes
    from isaacgym_tpu.ops.linalg import chol_factor, chol_solve
    factor = chol_factor(M)
    udot = chol_solve(factor, rhs)
    return udot, factor


def point_jacobians(model: ArticulationModel, frames, base_pos, links, points_w):
    """Vectorized linear-velocity Jacobians for K world points attached to
    articulated links.

    Args:
      frames: precomputed ``fk_dof_frames`` output (fp (nd,3), fq (nd,4)) —
        reused across all contact points of a substep.
      links: (K,) int numpy array of link (dof) indices; -1 = welded to base.
      points_w: (K,3) world points.
    Returns:
      (K, 3, nv) Jacobians.
    """
    fp, fq = frames
    nd = model.tree.n_dof
    axis_w = rot.quat_rotate(fq, jnp.asarray(model.tree.dof_axis))   # (nd,3)
    rev = jnp.asarray(model.is_revolute)
    # joint rows of the ancestor mask + a zero row for base-welded points
    joint_mask = np.concatenate([model.ancestor_mask[:nd, :nd],
                                 np.zeros((1, nd), np.float32)], axis=0)
    links = np.asarray(links)
    rows = jnp.asarray(joint_mask[np.where(links < 0, nd, links)])   # (K,nd)
    r = points_w[:, None, :] - fp[None, :, :]                        # (K,nd,3)
    cols = (jnp.cross(axis_w[None], r) * rev[None, :, None]
            + axis_w[None] * (1.0 - rev)[None, :, None]) * rows[..., None]
    J = jnp.swapaxes(cols, 1, 2)                                     # (K,3,nd)
    if not model.floating:
        return J
    rb = points_w - base_pos                                          # (K,3)

    def skew(v):
        zero = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ], -2)
    K = J.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
    return jnp.concatenate([-skew(rb), eye, J], axis=-1)


def point_jacobian(model: ArticulationModel, base_pos, base_quat, q, link: int, point_w):
    """Single-point convenience wrapper over :func:`point_jacobians`."""
    frames = _link_frames(model, base_pos, base_quat, q)
    return point_jacobians(model, frames, base_pos,
                           np.asarray([link]), point_w[None])[0]
