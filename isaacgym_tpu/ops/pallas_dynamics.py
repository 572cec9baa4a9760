"""Fused articulated-dynamics Pallas TPU kernel (the hot op).

Replaces ~400 small XLA kernels per substep (FK chains, Jacobian einsums,
jvp bias, batched Cholesky, integration) with ONE Pallas kernel for the
fixed-base all-revolute case (the 7-DOF pingpong arm — the framework's hot
path; floating-base/prismatic articulations keep the XLA path).

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

import math
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.ops.dynamics import ArticulationModel

LANE = 128


def supports(model: ArticulationModel) -> bool:
    """Kernel coverage: fixed base, revolute joints only."""
    return (not model.floating) and bool(np.all(model.tree.dof_type == U.JOINT_REVOLUTE))


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
    gx, gy, gz = [float(v) for v in gravity]
    kp = np.asarray(kp, np.float64)
    kd = np.asarray(kd, np.float64)

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
            jp = _add(pp, _qrot(pq, tuple(float(c) for c in pre_pos[d])))
            # constant-quat multiply folded scalar-wise
            cq = tuple(float(c) for c in pre_quat[d])
            jq = _qmul(pq, cq)
            half = 0.5 * q_rows[d]
            s, c = jnp.sin(half), jnp.cos(half)
            ax, ay, az = [float(v) for v in axis[d]]
            rq = (ax * s, ay * s, az * s, c)
            bq_d = _qmul(jq, rq)
            fp.append(jp)
            fq.append(bq_d)
            axes_w.append(_qrot(bq_d, tuple(float(v) for v in axis[d])))
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
            w_d = _add(w_p, _scale(a_w, qd[d]))
            wd_d = _add(wd_p, _scale(_cross(w_p, a_w), qd[d]))
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
                    Jlin[l][i] = _cross(axes_w[i], _sub(com_w[l], fp[i]))

        rhs = []
        for i in range(nd):
            acc = zero
            for l in range(nd):
                if mask[l, i]:
                    acc = acc + _dot(axes_w[i], n_list[l]) + _dot(Jlin[l][i], f_list[l])
            rhs.append(tau[i] - acc)

        M = [[None] * nd for _ in range(nd)]
        for i in range(nd):
            for j in range(i + 1):
                acc = zero
                for l in range(nd):
                    if mask[l, i] and mask[l, j]:
                        acc = (acc + _dot(axes_w[i], _sym_mat_vec(I_w[l], axes_w[j]))
                               + float(m_l[l]) * _dot(Jlin[l][i], Jlin[l][j]))
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

        # semi-implicit Euler + joint limits (velocity zeroed at the stop)
        q_new, qd_new = [], []
        for d in range(nd):
            v = qd[d] + dt_s * qdd[d]
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
