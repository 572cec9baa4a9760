"""Batched rigid-body simulator — the ``gym.simulate`` equivalent (N1/N2).

One fused, jittable step over a PyTree state: PD drives -> articulated
forward dynamics (ops.dynamics) -> semi-implicit Euler -> impulse contacts
(ops.contacts) with two-body coupling between the ball and the articulated
arm.  The whole substep loop lives inside ``jit``; the env batch is a
``vmap`` axis (reference hot loop: SURVEY.md §3.2).

State layout follows the reference tensor-API contract (SURVEY.md §1 L1):
  root:     (num_actors, 13) = pos(3) + quat(4, xyzw) + linvel(3) + angvel(3)
  dof_pos/dof_vel: (num_dofs,)
batched to (B, ...) by the public API.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models.kinematics import fk_body_states, fk_dof_frames
from isaacgym_tpu.ops import contacts as C
from isaacgym_tpu.ops import dynamics as D
from isaacgym_tpu.sim.scene import (
    DRIVE_POS, ArticulationSlot, CompiledScene, FreeBodySlot,
)
from isaacgym_tpu.utils import rotations as rot


class SimState(NamedTuple):
    """Single-env state pytree (leading batch axis added by the public API)."""
    root: jnp.ndarray       # (num_actors, 13)
    dof_pos: jnp.ndarray    # (num_dofs,)
    dof_vel: jnp.ndarray    # (num_dofs,)
    dof_force: jnp.ndarray  # (num_dofs,) last applied drive torque (sensor parity)


class Simulator:
    """Compiled simulator for one scene layout.

    The per-env step is written single-env and ``vmap``-ed; everything static
    (trees, gains, geom tables) is a Python/numpy constant baked into the
    trace — no dynamic shapes anywhere.
    """

    def __init__(self, scene: CompiledScene):
        self.scene = scene
        self.gravity = jnp.asarray(scene.spec.gravity, dtype=jnp.float32)
        self.dt = float(scene.spec.dt)
        self.substeps = int(scene.spec.substeps)
        self.bounce_threshold = float(scene.spec.bounce_threshold_velocity)
        # vmapped entry points
        self.step = jax.vmap(self._step_single, in_axes=(0, 0, 0))
        self.rigid_body_states = jax.vmap(self._rigid_body_states_single)

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------

    def initial_state(self, batch: Optional[int] = None) -> SimState:
        s = SimState(
            root=jnp.asarray(self.scene.initial_root),
            dof_pos=jnp.zeros(self.scene.num_dofs, jnp.float32),
            dof_vel=jnp.zeros(self.scene.num_dofs, jnp.float32),
            dof_force=jnp.zeros(self.scene.num_dofs, jnp.float32),
        )
        if batch is None:
            return s
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)

    # ------------------------------------------------------------------
    # single-env step
    # ------------------------------------------------------------------

    def _step_single(self, state: SimState, targets, efforts) -> SimState:
        dt_s = self.dt / self.substeps
        for _ in range(self.substeps):
            state = self._substep(state, targets, efforts, dt_s)
        return state

    def _articulation_state(self, state: SimState, slot: ArticulationSlot):
        q = state.dof_pos[slot.dof_start:slot.dof_end]
        qd = state.dof_vel[slot.dof_start:slot.dof_end]
        ra = state.root[slot.actor_index]
        base_pos, base_quat = ra[0:3], ra[3:7]
        if slot.model.floating:
            u = jnp.concatenate([ra[10:13], ra[7:10], qd])
        else:
            u = qd
        return q, qd, base_pos, base_quat, u

    def _substep(self, state: SimState, targets, efforts, dt_s) -> SimState:
        scene = self.scene
        root = state.root
        dof_pos = state.dof_pos
        dof_vel = state.dof_vel
        dof_force = state.dof_force

        # -- articulated dynamics + integration --------------------------------
        art_runtime = []  # per articulation: (slot, q, u, chol, base_pos, base_quat)
        for slot in scene.articulations:
            model = slot.model
            tree = model.tree
            q, qd, base_pos, base_quat, u = self._articulation_state(state, slot)
            tgt = targets[slot.dof_start:slot.dof_end]
            eff = efforts[slot.dof_start:slot.dof_end]
            kp = jnp.asarray(slot.stiffness)
            kd = jnp.asarray(slot.damping)
            if slot.drive_mode == DRIVE_POS:
                tau = kp * (tgt - q) - kd * qd + eff
            else:
                tau = eff
            tau = jnp.clip(tau, -jnp.asarray(tree.effort), jnp.asarray(tree.effort))
            tau_gen = jnp.concatenate([jnp.zeros(6), tau]) if model.floating else tau
            udot, chol = D.forward_dynamics(model, base_pos, base_quat, q, u, tau_gen, self.gravity)
            u = u + dt_s * udot

            if model.floating:
                omega, vel, qd_new = u[0:3], u[3:6], u[6:]
            else:
                qd_new = u

            # joint limits: clamp position, kill inward velocity at the stop
            q_new = q + dt_s * qd_new
            lo, hi = jnp.asarray(tree.lower), jnp.asarray(tree.upper)
            at_lo = q_new < lo
            at_hi = q_new > hi
            q_new = jnp.clip(q_new, lo, hi)
            qd_new = jnp.where(at_lo, jnp.maximum(qd_new, 0.0), qd_new)
            qd_new = jnp.where(at_hi, jnp.minimum(qd_new, 0.0), qd_new)

            if model.floating:
                base_pos = base_pos + dt_s * vel
                wq = jnp.concatenate([omega, jnp.zeros(1)])
                base_quat = rot.quat_unit(base_quat + 0.5 * dt_s * rot.quat_mul(wq, base_quat))
                u = jnp.concatenate([omega, vel, qd_new])
            else:
                u = qd_new

            dof_pos = dof_pos.at[slot.dof_start:slot.dof_end].set(q_new)
            dof_vel = dof_vel.at[slot.dof_start:slot.dof_end].set(qd_new)
            dof_force = dof_force.at[slot.dof_start:slot.dof_end].set(tau)
            art_runtime.append({
                "slot": slot, "q": q_new, "u": u, "chol": chol,
                "base_pos": base_pos, "base_quat": base_quat,
                # dof frames post-integration, shared by all geoms of this articulation
                "frames": fk_dof_frames(model.tree, base_pos, base_quat, q_new),
            })

        # -- free bodies: gravity, contacts, integration -----------------------
        for ball in scene.free_bodies:
            ra = root[ball.actor_index]
            pos, vel = ra[0:3], ra[7:10]
            vel = vel + self.gravity * dt_s

            # ground plane
            if scene.spec.plane is not None:
                e, mu = C.combine_material(ball.restitution, scene.spec.plane.restitution,
                                           ball.friction, scene.spec.plane.dynamic_friction)
                frame = C.sphere_plane(pos, ball.radius)
                dv, _, active = C.resolve_sphere_impulse(vel, frame, jnp.zeros(3), e, mu, self.bounce_threshold)
                vel = vel + dv
                pos = C.depenetrate(pos, frame, active)

            # static geoms (table top, net)
            for g in scene.static_geoms:
                ga = root[g.actor_index]
                gpos = ga[0:3] + rot.quat_rotate(ga[3:7], jnp.asarray(g.local_pos))
                gquat = rot.quat_mul(ga[3:7], jnp.asarray(g.local_quat))
                frame = self._sphere_vs_geom(pos, ball.radius, g.kind, gpos, gquat, g.size)
                e, mu = C.combine_material(ball.restitution, g.restitution, ball.friction, g.friction)
                dv, _, active = C.resolve_sphere_impulse(vel, frame, jnp.zeros(3), e, mu, self.bounce_threshold)
                vel = vel + dv
                pos = C.depenetrate(pos, frame, active)

            # articulated geoms (paddle, hands, torso...) with two-body coupling
            for g in scene.art_geoms:
                rt = art_runtime[g.art_index]
                slot = rt["slot"]
                model = slot.model
                tree = model.tree
                fp, fq = rt["frames"]
                d = int(tree.body_ref_dof[g.body_index])
                if d < 0:
                    bq = rt["base_quat"]
                    bp = rt["base_pos"]
                else:
                    bp, bq = fp[d], fq[d]
                off_p = jnp.asarray(tree.body_ref_pos[g.body_index]) + rot.quat_rotate(
                    jnp.asarray(tree.body_ref_quat[g.body_index]), jnp.asarray(g.local_pos))
                gpos = bp + rot.quat_rotate(bq, off_p)
                gquat = rot.quat_mul(bq, rot.quat_mul(
                    jnp.asarray(tree.body_ref_quat[g.body_index]), jnp.asarray(g.local_quat)))
                frame = self._sphere_vs_geom(pos, ball.radius, g.kind, gpos, gquat, g.size)
                e, mu = C.combine_material(ball.restitution, g.restitution, ball.friction, g.friction)
                vel, du = self._two_body_impulse(
                    model, rt, frame, vel, 1.0 / ball.mass, e, mu,
                    link=d, point=frame.point)
                rt["u"] = rt["u"] + du
                pos = C.depenetrate(pos, frame, jnp.asarray(True))

            pos = pos + dt_s * vel
            root = root.at[ball.actor_index, 0:3].set(pos)
            root = root.at[ball.actor_index, 7:10].set(vel)

        # -- articulation vs ground (floating-base feet) -----------------------
        for g in scene.art_geoms:
            rt = art_runtime[g.art_index]
            slot = rt["slot"]
            if not slot.model.floating or scene.spec.plane is None:
                continue
            rt["u"] = self._art_ground_impulse(rt, g, dt_s)

        # write back articulation velocity updates from contact reactions
        for rt in art_runtime:
            slot = rt["slot"]
            u = rt["u"]
            if slot.model.floating:
                root = root.at[slot.actor_index, 10:13].set(u[0:3])
                root = root.at[slot.actor_index, 7:10].set(u[3:6])
                root = root.at[slot.actor_index, 0:3].set(rt["base_pos"])
                root = root.at[slot.actor_index, 3:7].set(rt["base_quat"])
                dof_vel = dof_vel.at[slot.dof_start:slot.dof_end].set(u[6:])
            else:
                dof_vel = dof_vel.at[slot.dof_start:slot.dof_end].set(u)

        return SimState(root=root, dof_pos=dof_pos, dof_vel=dof_vel, dof_force=dof_force)

    # ------------------------------------------------------------------
    # contact helpers
    # ------------------------------------------------------------------

    @staticmethod
    def _sphere_vs_geom(pos, radius, kind, gpos, gquat, size) -> C.ContactFrame:
        size = np.asarray(size)
        if kind == U.GEOM_BOX:
            return C.sphere_box(pos, radius, gpos, gquat, jnp.asarray(size))
        if kind == U.GEOM_CYLINDER:
            return C.sphere_cylinder(pos, radius, gpos, gquat, float(size[0]), float(size[1]))
        if kind == U.GEOM_SPHERE:
            return C.sphere_sphere(pos, radius, gpos, float(size[0]))
        raise NotImplementedError(kind)

    def _two_body_impulse(self, model, rt, frame, v_ball, inv_m_ball, e, mu, link, point):
        """Ball <-> articulated-link impulse with joint-space effective mass.

        Returns (new ball velocity, Δu for the articulation).
        """
        slot = rt["slot"]
        J = D.point_jacobian(model, rt["base_pos"], rt["base_quat"], rt["q"], link, point)  # (3,nv)
        chol = rt["chol"]
        MinvJT = jax.scipy.linalg.cho_solve((chol, True), J.T)     # (nv,3)
        v_point = J @ rt["u"]
        n = frame.normal
        v_rel = v_ball - v_point
        vn = jnp.dot(v_rel, n)
        active = (frame.dist < 0.0) & (vn < 0.0)
        e_eff = jnp.where(jnp.abs(vn) > self.bounce_threshold, e, 0.0)
        w_n = inv_m_ball + n @ (J @ (MinvJT @ n))
        Pn = jnp.where(active, -(1.0 + e_eff) * vn / jnp.maximum(w_n, 1e-9), 0.0)
        vt = v_rel - vn * n
        vt_norm = jnp.linalg.norm(vt)
        t_hat = vt / jnp.maximum(vt_norm, 1e-9)
        w_t = inv_m_ball + t_hat @ (J @ (MinvJT @ t_hat))
        Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_norm / jnp.maximum(w_t, 1e-9)), 0.0)
        P = Pn * n - Pt * t_hat
        v_ball_new = v_ball + P * inv_m_ball
        du = -(MinvJT @ P)
        return v_ball_new, du

    def _art_ground_impulse(self, rt, g, dt_s):
        """Floating-base articulation geom vs ground plane (feet contact)."""
        slot = rt["slot"]
        model = slot.model
        tree = model.tree
        fp, fq = rt["frames"]
        d = int(tree.body_ref_dof[g.body_index])
        if d < 0:
            bp, bq = rt["base_pos"], rt["base_quat"]
        else:
            bp, bq = fp[d], fq[d]
        off_p = jnp.asarray(tree.body_ref_pos[g.body_index]) + rot.quat_rotate(
            jnp.asarray(tree.body_ref_quat[g.body_index]), jnp.asarray(g.local_pos))
        gpos = bp + rot.quat_rotate(bq, off_p)
        # approximate geom by its bounding sphere for ground contact
        size = np.asarray(g.size)
        radius = float(np.max(size)) if g.kind != U.GEOM_SPHERE else float(size[0])
        frame = C.sphere_plane(gpos, radius)
        J = D.point_jacobian(model, rt["base_pos"], rt["base_quat"], rt["q"], d, frame.point)
        MinvJT = jax.scipy.linalg.cho_solve((rt["chol"], True), J.T)
        v_point = J @ rt["u"]
        n = frame.normal
        vn = jnp.dot(v_point, n)
        active = (frame.dist < 0.0) & (vn < 0.1)
        # Baumgarte bias pushes penetration out over a few substeps
        bias = 0.2 / dt_s * jnp.maximum(-frame.dist - 0.005, 0.0)
        w_n = n @ (J @ (MinvJT @ n))
        plane = self.scene.spec.plane
        e, mu = C.combine_material(0.0, plane.restitution, 0.8, plane.dynamic_friction)
        Pn = jnp.where(active, (-(1.0 + e) * jnp.minimum(vn, 0.0) + bias) / jnp.maximum(w_n, 1e-9), 0.0)
        vt = v_point - vn * n
        vt_norm = jnp.linalg.norm(vt)
        t_hat = vt / jnp.maximum(vt_norm, 1e-9)
        w_t = t_hat @ (J @ (MinvJT @ t_hat))
        Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_norm / jnp.maximum(w_t, 1e-9)), 0.0)
        P = Pn * n - Pt * t_hat
        return rt["u"] + MinvJT @ P

    # ------------------------------------------------------------------
    # state reporting (tensor-API parity, N2)
    # ------------------------------------------------------------------

    def _rigid_body_states_single(self, state: SimState) -> jnp.ndarray:
        """(num_bodies, 13) rigid-body state tensor in reference layout."""
        scene = self.scene
        parts = []
        cursor = 0
        art_by_body = {slot.body_start: slot for slot in scene.articulations}
        free_by_body = {fb.body_start: fb for fb in scene.free_bodies}
        for ai, actor in enumerate(scene.spec.actors):
            nb = actor.tree.n_bodies
            ra = state.root[ai]
            if actor.tree.n_dof > 0:
                slot = next(s for s in scene.articulations if s.actor_index == ai)
                q = state.dof_pos[slot.dof_start:slot.dof_end]
                qd = state.dof_vel[slot.dof_start:slot.dof_end]
                if slot.model.floating:
                    states = fk_body_states(actor.tree, ra[0:3], ra[3:7], q, qd,
                                            base_linvel=ra[7:10], base_angvel=ra[10:13])
                else:
                    states = fk_body_states(actor.tree, ra[0:3], ra[3:7], q, qd)
                parts.append(states)
            else:
                parts.append(ra[None, :].repeat(nb, axis=0) if nb > 1 else ra[None, :])
            cursor += nb
        return jnp.concatenate(parts, axis=0)
