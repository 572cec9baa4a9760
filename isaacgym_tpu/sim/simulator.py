"""Batched rigid-body simulator — the ``gym.simulate`` equivalent (N1/N2).

One fused, jittable step over a PyTree state: PD drives -> articulated
forward dynamics (ops.dynamics) -> semi-implicit Euler -> impulse contacts
(ops.contacts) with two-body coupling between the ball and the articulated
arm. The whole substep loop lives inside ``jit``; the env batch is a
``vmap`` axis (reference hot loop: SURVEY.md §3.2).

TPU-first structure: DOF-frame FK is a single ``lax.scan`` (compiled once,
not unrolled per joint); all collision geoms are **grouped by primitive
kind at compile time** and evaluated as stacked vectorized ops; contact
Jacobians for every candidate point come from one gather + einsum; the
joint-space solve reuses one Cholesky factor per articulation per substep.

State layout follows the reference tensor-API contract (SURVEY.md §1 L1):
  root:     (num_actors, 13) = pos(3) + quat(4, xyzw) + linvel(3) + angvel(3)
  dof_pos/dof_vel: (num_dofs,)
batched to (B, ...) by the public API.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models.kinematics import fk_body_states, fk_dof_frames
from isaacgym_tpu.ops import contacts as C
from isaacgym_tpu.ops import dynamics as D
from isaacgym_tpu.ops import linalg as L
from isaacgym_tpu.sim.scene import DRIVE_POS, CompiledScene
from isaacgym_tpu.utils import rotations as rot


class SimState(NamedTuple):
    """Single-env state pytree (leading batch axis added by the public API)."""
    root: jnp.ndarray       # (num_actors, 13)
    dof_pos: jnp.ndarray    # (num_dofs,)
    dof_vel: jnp.ndarray    # (num_dofs,)
    dof_force: jnp.ndarray  # (num_dofs,) last applied drive torque (sensor parity)
    net_contact_force: jnp.ndarray  # (num_bodies, 3) per-step contact force (N2 parity)
    #: (num_bodies, 3) per-step contact-moment sum about each body's frame
    #: origin (ball bodies: about the ball center) — fills the torque lanes of
    #: ``acquire_force_sensor_tensor`` (reference ``create_asset_force_sensor``
    #: wrench). Exact on the XLA path always; on the fused single-articulation
    #: kernel when the scene registers force sensors (sensor-less scenes skip
    #: the channels — zero kernel cost); zero on the multi/floating fused
    #: kernels (docs/PARITY.md).
    net_contact_torque: jnp.ndarray


class _GeomGroup(NamedTuple):
    """Static stacked arrays for one (owner, primitive-kind) geom group."""
    kind: int
    actor_index: np.ndarray   # (k,) owning actor (static geoms) or articulation actor
    link: np.ndarray          # (k,) dof-link index within articulation (-1 = base)
    body: np.ndarray          # (k,) env-level body index (contact-force reporting)
    offset_pos: np.ndarray    # (k,3) owner-frame offset (body_ref ∘ local for art geoms)
    offset_quat: np.ndarray   # (k,4)
    size: np.ndarray          # (k,3)
    restitution: np.ndarray   # (k,)
    friction: np.ndarray      # (k,)
    radius_bound: np.ndarray  # (k,) bounding-sphere radius (ground contact)
    body_off_pos: np.ndarray  # (k,3) body-frame origin rel. the link dof frame
                              # (tree.body_ref_pos; zeros for statics) — the
                              # reference point for force-sensor torque
    kinds: Optional[np.ndarray] = None  # (k,) per-geom kind for MIXED groups
                              # (kind == -1); None for single-kind groups


def _integrate_quat(quat, omega, dt):
    """Batched free-body orientation update q += dt/2 [w,0] o q, normalized."""
    wq = jnp.concatenate([omega, jnp.zeros_like(omega[..., :1])], axis=-1)
    q2 = quat + 0.5 * dt * rot.quat_mul(wq, quat)
    return q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)


def _ball_kappa(ball) -> float:
    """Spin-coupling ratio kappa = m r^2 / I for a free sphere (3/2 for the
    hollow ping-pong ball's URDF inertia, 5/2 for a solid sphere); 0 when no
    inertia is recorded (spin decoupled, pre-spin behavior).

    Diagnostic override: ``ISAACGYM_TPU_BALL_KAPPA`` forces the value (both
    the XLA path and the fused Pallas kernels read kappa through here at
    trace/build time) — used to bisect learning regressions against the
    spin-less contact model."""
    import os
    override = os.environ.get("ISAACGYM_TPU_BALL_KAPPA")
    if override is not None:
        return float(override)
    if getattr(ball, "inertia", 0.0) > 0.0:
        return float(ball.mass * ball.radius ** 2 / ball.inertia)
    return 0.0  # contacts treat kappa == 0 as fully spin-decoupled


def _art_static_enabled() -> bool:
    """Articulation-link-vs-static-geom narrowphase (paddle/arm vs table+net,
    floating humanoid resting on the table). On by default (PhysX parity);
    ``ISAACGYM_TPU_ART_STATIC=0`` disables for bisection."""
    import os
    return os.environ.get("ISAACGYM_TPU_ART_STATIC", "1") != "0"


RESTING_SMOOTH_BAND = 0.002  # m; see _resting_smooth


def _resting_smooth(dist, vn, bounce_threshold):
    """Resting-contact activation smoothing (round 5, VERDICT r4 weak 2).

    Link-vs-static/ground contacts activate on ``dist < 0`` — a discrete
    branch. A resting ragdoll (C10) holds ~20 contacts sitting AT that
    margin (dist ~ 0, vn ~ 0), so last-ulp f32 differences between the fused
    kernels and the XLA path flip activation and turn into O(0.1) one-step
    state deltas (the 12.8%/step contact-flip rate of docs/runs/parity_r4).

    Fix: for RESTING-class contacts (|vn| <= bounce_threshold, the same cut
    that zeroes restitution) the impulse ramps in linearly over the first
    ``RESTING_SMOOTH_BAND`` of penetration instead of jumping — a margin
    flip now changes the impulse by ~0. Impacting contacts
    (|vn| > bounce_threshold) keep the hard activation: their swept-CCD
    entry depth is well past the band, and softening them would corrupt
    restitution timing. Static equilibrium is unchanged (the Baumgarte bias
    holds resting penetration ~5 mm >> the 2 mm band). Applied IDENTICALLY
    in the XLA groups and all fused kernels, scaling Pn and Pt together so
    the friction cone is preserved."""
    s = jnp.clip(-dist / RESTING_SMOOTH_BAND, 0.0, 1.0)
    return jnp.where(jnp.abs(vn) > bounce_threshold, 1.0, s)


def _ccd_dt(dt_s: float) -> float:
    """Swept-CCD window (one substep). Contacts activate on the minimum
    closest-point distance sampled along the relative motion over this window
    (ops.contacts.swept_frame) — edge-correct tunneling protection, PhysX
    sweep-CCD equivalent. Diagnostic override: ``ISAACGYM_TPU_CCD=0``
    disables the sweep (penetration-only activation) for physics bisection."""
    import os
    if os.environ.get("ISAACGYM_TPU_CCD", "1") == "0":
        return 0.0
    return dt_s


def _compose(p1, q1, p2, q2):
    """Pure-numpy compose of two transforms (compile time; no jax attach)."""
    from isaacgym_tpu.models.kinematics import _qmul, _qrot
    p = np.asarray(p1, np.float64) + _qrot(np.asarray(q1, np.float64), np.asarray(p2, np.float64))
    q = _qmul(np.asarray(q1, np.float64), np.asarray(q2, np.float64))
    return p.astype(np.float32), q.astype(np.float32)


class Simulator:
    """Compiled simulator for one scene layout.

    The per-env step is written single-env and ``vmap``-ed; everything static
    (trees, gains, geom tables) is a numpy constant baked into the trace.
    """

    def __init__(self, scene: CompiledScene):
        self.scene = scene
        self.gravity = jnp.asarray(scene.spec.gravity, dtype=jnp.float32)
        self.dt = float(scene.spec.dt)
        self.substeps = int(scene.spec.substeps)
        self.bounce_threshold = float(scene.spec.bounce_threshold_velocity)
        self.max_depenetration = float(
            getattr(scene.spec, "max_depenetration_velocity", 10.0))
        self._build_geom_groups()
        self._art_art_pairs = (self._build_art_art_pairs()
                               if scene.spec.link_collision else [])
        self._step_vmapped = jax.vmap(self._step_single, in_axes=(0, 0, 0))
        # step with per-env domain-randomization params (env/randomize.py)
        self._step_dr_vmapped = jax.vmap(self._step_single, in_axes=(0, 0, 0, 0))
        self.rigid_body_states = jax.vmap(self._rigid_body_states_single)
        self._pallas_kernels = None
        self._fused = None
        self._fused_dr = None
        self._fused_multi = None
        self._fused_floating = None
        # actors whose world pose the Pallas fast path folds as compile-time
        # constants; runtime writes to them divert the step to the (fully
        # runtime-correct) XLA path via lax.cond — see step()
        self._baked_actors = np.zeros(0, np.int64)
        self._maybe_build_pallas()

    def _build_geom_groups(self) -> None:
        scene = self.scene
        # static geoms grouped by kind
        static: Dict[int, List] = {}
        for g in scene.static_geoms:
            static.setdefault(g.kind, []).append(g)
        self.static_groups: List[_GeomGroup] = []
        for kind, gs in static.items():
            self.static_groups.append(_GeomGroup(
                kind=kind,
                actor_index=np.asarray([g.actor_index for g in gs]),
                link=np.full(len(gs), -1),
                body=np.asarray([g.body_start for g in gs]),
                offset_pos=np.stack([g.local_pos for g in gs]).astype(np.float32),
                offset_quat=np.stack([g.local_quat for g in gs]).astype(np.float32),
                size=np.stack([g.size for g in gs]).astype(np.float32),
                restitution=np.asarray([g.restitution for g in gs], np.float32),
                friction=np.asarray([g.friction for g in gs], np.float32),
                radius_bound=np.asarray([float(np.max(g.size)) for g in gs], np.float32),
                body_off_pos=np.zeros((len(gs), 3), np.float32),
            ))
        # articulation geoms grouped by (articulation, kind); offsets folded
        # through the welded body_ref transform at compile time
        self.art_groups: Dict[int, List[_GeomGroup]] = {}
        self.art_ground_groups: Dict[int, _GeomGroup] = {}
        per_art: Dict[int, Dict[int, List]] = {}
        for g in scene.art_geoms:
            per_art.setdefault(g.art_index, {}).setdefault(g.kind, []).append(g)
        for art_idx, kinds in per_art.items():
            slot = scene.articulations[art_idx]
            tree = slot.model.tree
            groups = []
            for kind, gs in kinds.items():
                offs = [_compose(tree.body_ref_pos[g.body_index], tree.body_ref_quat[g.body_index],
                                 g.local_pos, g.local_quat) for g in gs]
                groups.append(_GeomGroup(
                    kind=kind,
                    actor_index=np.asarray([slot.actor_index] * len(gs)),
                    link=np.asarray([int(tree.body_ref_dof[g.body_index]) for g in gs]),
                    body=np.asarray([slot.body_start + g.body_index for g in gs]),
                    offset_pos=np.stack([o[0] for o in offs]),
                    offset_quat=np.stack([o[1] for o in offs]),
                    size=np.stack([g.size for g in gs]).astype(np.float32),
                    restitution=np.asarray([g.restitution for g in gs], np.float32),
                    friction=np.asarray([g.friction for g in gs], np.float32),
                    radius_bound=np.asarray(
                        [float(g.size[0]) if g.kind == U.GEOM_SPHERE else float(np.max(g.size))
                         for g in gs], np.float32),
                    body_off_pos=np.stack(
                        [tree.body_ref_pos[g.body_index] for g in gs]).astype(np.float32),
                ))
            self.art_groups[art_idx] = groups
            # ground contacts are kind-independent (bounding spheres), so a
            # single SCENE-ORDER group per articulation keeps the XLA path's
            # sequential Gauss-Seidel order identical to the fused kernels'
            # flat art_geoms walk (kind-grouped iteration resolved the same
            # contacts in a different order -> systematic fused-vs-XLA
            # activation flips in many-contact ragdoll states)
            gs_all = [g for g in scene.art_geoms if g.art_index == art_idx]
            offs_all = [_compose(tree.body_ref_pos[g.body_index],
                                 tree.body_ref_quat[g.body_index],
                                 g.local_pos, g.local_quat) for g in gs_all]
            self.art_ground_groups[art_idx] = _GeomGroup(
                kind=-1,
                actor_index=np.asarray([slot.actor_index] * len(gs_all)),
                link=np.asarray([int(tree.body_ref_dof[g.body_index])
                                 for g in gs_all]),
                body=np.asarray([slot.body_start + g.body_index
                                 for g in gs_all]),
                offset_pos=np.stack([o[0] for o in offs_all]),
                offset_quat=np.stack([o[1] for o in offs_all]),
                size=np.stack([g.size for g in gs_all]).astype(np.float32),
                restitution=np.asarray([g.restitution for g in gs_all],
                                       np.float32),
                friction=np.asarray([g.friction for g in gs_all], np.float32),
                radius_bound=np.asarray(
                    [float(g.size[0]) if g.kind == U.GEOM_SPHERE
                     else float(np.max(g.size)) for g in gs_all], np.float32),
                body_off_pos=np.stack(
                    [tree.body_ref_pos[g.body_index]
                     for g in gs_all]).astype(np.float32),
                kinds=np.asarray([g.kind for g in gs_all]),
            )

    def _maybe_build_pallas(self, force: bool = False) -> None:
        """Build fused Pallas articulation kernels when the scene qualifies:
        TPU backend, fixed-base all-revolute articulations (the pingpong hot
        path), PD/effort drive. ``force=True`` builds them on CPU too
        (interpret mode; used by parity tests)."""
        import os
        if os.environ.get("ISAACGYM_TPU_PALLAS", "1") == "0" and not force:
            return
        if self.scene.spec.link_collision:
            # link-vs-link narrowphase exists only on the XLA path; keep the
            # whole scene there rather than silently dropping those contacts
            return
        if jax.default_backend() == "cpu" and not force:
            return
        from isaacgym_tpu.ops import pallas_dynamics as PDK
        scene = self.scene
        if not scene.articulations:
            return
        # floating-base whole-body scenes (C10 class): single articulation +
        # single ball over a flat ground -> dedicated fused kernel
        if (len(scene.articulations) == 1 and len(scene.free_bodies) == 1
                and scene.spec.terrain is None and scene.spec.plane is not None
                and PDK.supports_floating(scene.articulations[0].model)
                and scene.articulations[0].model.tree.n_dof <= 32):
            self._build_fused_floating()
            return
        for slot in scene.articulations:
            if not PDK.supports(slot.model):
                return
        kernels = []
        for slot in scene.articulations:
            init = scene.initial_root[slot.actor_index]
            kernels.append(PDK.build_arm_step(
                slot.model, init[0:3], init[3:7],
                slot.stiffness, slot.damping,
                np.asarray(self.gravity), self.dt / self.substeps))
        self._pallas_kernels = kernels
        self._fused = None
        # arm kernels fold each fixed articulation's base pose
        self._baked_actors = np.asarray(
            sorted({s.actor_index for s in scene.articulations}), np.int64)
        self._maybe_build_fused()

    def _sensors_want_torque(self) -> bool:
        """Force-sensor torque channels only when the scene registers sensors
        (reference semantics: ``create_asset_force_sensor`` is called on the
        asset BEFORE actor creation) — sensor-less scenes pay zero kernel ops
        for the lanes. ISAACGYM_TPU_TORQUE=1 forces them on (tests/tools)."""
        import os as _os
        from isaacgym_tpu.sim.asset_api import scene_force_sensor_body_indices
        return (scene_force_sensor_body_indices(self.scene).size > 0
                or _os.environ.get("ISAACGYM_TPU_TORQUE") == "1")

    def _build_fused_floating(self) -> None:
        """Fused substep kernel for single floating-base humanoid + single
        ball scenes (C10, reference cfg/task/HumanoidPingpongTiltNESSparse27DOFG1.yaml).
        All articulation geoms (incl. base-welded ones) move with the runtime
        base pose — nothing is constant-folded except truly-static actors."""
        from isaacgym_tpu.ops import pallas_dynamics as PDK
        scene = self.scene
        slot = scene.articulations[0]
        ball = scene.free_bodies[0]
        tree = slot.model.tree
        plane = scene.spec.plane

        static_list = []
        for g in scene.static_geoms:
            sroot = scene.initial_root[g.actor_index]
            gp, gq = _compose(sroot[0:3], sroot[3:7], g.local_pos, g.local_quat)
            static_list.append(dict(kind=g.kind, pos=gp, quat=gq, size=g.size,
                                    e=g.restitution, mu=g.friction))
        art_list, art_bodies = [], []
        for g in scene.art_geoms:
            link = int(tree.body_ref_dof[g.body_index])
            offp, offq = _compose(tree.body_ref_pos[g.body_index],
                                  tree.body_ref_quat[g.body_index],
                                  g.local_pos, g.local_quat)
            rb = (float(g.size[0]) if g.kind == U.GEOM_SPHERE
                  else float(np.max(g.size)))
            art_list.append(dict(kind=g.kind, link=link, off_pos=offp,
                                 off_quat=offq, size=g.size, e=g.restitution,
                                 mu=g.friction, radius_bound=rb,
                                 body_off=np.asarray(
                                     tree.body_ref_pos[g.body_index],
                                     np.float32)))
            art_bodies.append(slot.body_start + g.body_index)
        self._ffl_art_bodies = np.asarray(art_bodies)

        ball_cfg = dict(mass=ball.mass, radius=ball.radius,
                        restitution=ball.restitution, friction=ball.friction,
                        plane_e=plane.restitution,
                        plane_mu=plane.dynamic_friction,
                        max_lin=ball.max_linear_velocity,
                        max_ang=ball.max_angular_velocity,
                        lin_damp=ball.linear_damping,
                        ang_damp=ball.angular_damping,
                        drag_k=ball.drag_k, magnus_k=ball.magnus_k,
                        kappa=_ball_kappa(ball))
        # floating kernel: only static actors are constant-folded (the base
        # pose is a runtime input)
        self._baked_actors = np.asarray(
            sorted({g.actor_index for g in scene.static_geoms}), np.int64)
        self._fused_floating = PDK.build_fused_substep_floating(
            slot.model, slot.stiffness, slot.damping,
            np.asarray(self.gravity), self.dt / self.substeps,
            ball_cfg, static_list, art_list,
            plane_cfg=dict(e=plane.restitution, mu=plane.dynamic_friction,
                           max_depen=self.max_depenetration),
            bounce_threshold=self.bounce_threshold,
            drive_mode=slot.drive_mode,
            exact_support=self.scene.spec.exact_link_support,
            max_angular_velocity=slot.max_angular_velocity,
            max_linear_velocity=slot.max_linear_velocity,
            art_static=_art_static_enabled(),
            with_torque=self._sensors_want_torque())
        self._ffl_slot = slot
        self._ffl_ball = ball

    def _substep_fused_floating(self, state: SimState, targets, efforts, dt_s) -> SimState:
        """Entire floating-base substep as ONE kernel (C10 class)."""
        slot, ball = self._ffl_slot, self._ffl_ball
        sl = slice(slot.dof_start, slot.dof_end)
        root = state.root
        hr = root[:, slot.actor_index]
        out = self._fused_floating(
            state.dof_pos[:, sl], state.dof_vel[:, sl],
            targets[:, sl], efforts[:, sl],
            hr[:, 0:3], hr[:, 3:7], hr[:, 7:10], hr[:, 10:13],
            root[:, ball.actor_index, 0:3], root[:, ball.actor_index, 7:10],
            root[:, ball.actor_index, 10:13])
        ai = slot.actor_index
        root = root.at[:, ai, 0:3].set(out.base_pos)
        root = root.at[:, ai, 3:7].set(out.base_quat)
        root = root.at[:, ai, 7:10].set(out.base_linvel)
        root = root.at[:, ai, 10:13].set(out.base_angvel)
        root = root.at[:, ball.actor_index, 0:3].set(out.ball_pos)
        root = root.at[:, ball.actor_index, 3:7].set(_integrate_quat(
            root[:, ball.actor_index, 3:7], out.ball_omega, dt_s))
        root = root.at[:, ball.actor_index, 7:10].set(out.ball_vel)
        root = root.at[:, ball.actor_index, 10:13].set(out.ball_omega)
        ncf = state.net_contact_force
        nct = state.net_contact_torque
        ng = len(self._ffl_art_bodies)
        inv_dt = 1.0 / self.dt
        with_torque = out.impulses.shape[1] == 2 * ng + 2
        if ng:
            ncf = ncf.at[:, jnp.asarray(self._ffl_art_bodies)].add(
                out.impulses[:, :ng] * inv_dt)
            if with_torque:
                nct = nct.at[:, jnp.asarray(self._ffl_art_bodies)].add(
                    out.impulses[:, ng + 1:2 * ng + 1] * inv_dt)
        # row ng is the ball's TOTAL contact impulse (see FloatingStepOutputs)
        ncf = ncf.at[:, ball.body_start].add(out.impulses[:, ng] * inv_dt)
        if with_torque:
            nct = nct.at[:, ball.body_start].add(
                out.impulses[:, 2 * ng + 1] * inv_dt)
        return SimState(
            root=root,
            dof_pos=state.dof_pos.at[:, sl].set(out.q_new),
            dof_vel=state.dof_vel.at[:, sl].set(out.qd_new),
            dof_force=state.dof_force.at[:, sl].set(out.tau),
            net_contact_force=ncf,
            net_contact_torque=nct,
        )

    def _maybe_build_fused(self) -> None:
        """Fully-fused substep (dynamics + ball contacts in ONE kernel) for
        single-humanoid + single-ball scenes with a flat ground — the
        flagship pingpong family. Base-welded humanoid geoms fold into the
        static contact list (their world pose is a scene constant under a
        fixed base); per-body ncf on those bodies is lumped into the ball
        row on this path."""
        from isaacgym_tpu.ops import pallas_dynamics as PDK
        scene = self.scene
        self._fused_multi = None
        if (not scene.articulations or not scene.free_bodies
                or scene.spec.terrain is not None or scene.spec.plane is None):
            return
        if any(not PDK.supports(sl.model) or sl.model.tree.n_dof > 32
               for sl in scene.articulations):
            return

        plane = scene.spec.plane
        static_list = []
        for g in scene.static_geoms:
            sroot = scene.initial_root[g.actor_index]
            gp, gq = _compose(sroot[0:3], sroot[3:7], g.local_pos, g.local_quat)
            static_list.append(dict(kind=g.kind, pos=gp, quat=gq, size=g.size,
                                    e=g.restitution, mu=g.friction))
        # TRUE static geoms (table slab, net) participate in the in-kernel
        # articulation-link narrowphase; the welded humanoid geoms appended
        # below are ball-contact constants only
        n_true_static = len(static_list)
        # the fused kernels also fold static actors' world poses
        self._baked_actors = np.asarray(sorted(
            set(self._baked_actors.tolist())
            | {g.actor_index for g in scene.static_geoms}), np.int64)
        art_list, art_bodies = [], []
        for g in scene.art_geoms:
            slot_g = scene.articulations[g.art_index]
            tree = slot_g.model.tree
            init = scene.initial_root[slot_g.actor_index]
            link = int(tree.body_ref_dof[g.body_index])
            offp, offq = _compose(tree.body_ref_pos[g.body_index],
                                  tree.body_ref_quat[g.body_index],
                                  g.local_pos, g.local_quat)
            rb = (float(g.size[0]) if g.kind == U.GEOM_SPHERE
                  else float(np.max(g.size)))
            if link < 0:
                # welded to the (fixed) base: world pose is a constant
                wp, wq = _compose(init[0:3], init[3:7], offp, offq)
                static_list.append(dict(kind=g.kind, pos=wp, quat=wq, size=g.size,
                                        e=g.restitution, mu=g.friction))
            else:
                art_list.append(dict(kind=g.kind, art=g.art_index, link=link,
                                     off_pos=offp, off_quat=offq, size=g.size,
                                     e=g.restitution, mu=g.friction,
                                     radius_bound=rb,
                                     body_off=np.asarray(
                                         tree.body_ref_pos[g.body_index],
                                         np.float32)))
                art_bodies.append(slot_g.body_start + g.body_index)
        self._fused_art_bodies = np.asarray(art_bodies)

        if (len(scene.articulations) == 1 and len(scene.free_bodies) == 1
                and scene.articulations[0].drive_mode == DRIVE_POS):
            slot = scene.articulations[0]
            ball = scene.free_bodies[0]
            init = scene.initial_root[slot.actor_index]
            ball_cfg = dict(mass=ball.mass, radius=ball.radius,
                            restitution=ball.restitution, friction=ball.friction,
                            plane_e=plane.restitution, plane_mu=plane.dynamic_friction,
                            max_lin=ball.max_linear_velocity,
                            max_ang=ball.max_angular_velocity,
                            lin_damp=ball.linear_damping,
                            ang_damp=ball.angular_damping,
                            drag_k=ball.drag_k, magnus_k=ball.magnus_k,
                            kappa=_ball_kappa(ball))
            single_art = [dict(g, **{}) for g in art_list]
            for g in single_art:
                g.pop("art", None)
            with_torque = self._sensors_want_torque()
            self._fused = PDK.build_fused_substep(
                slot.model, init[0:3], init[3:7], slot.stiffness, slot.damping,
                np.asarray(self.gravity), self.dt / self.substeps,
                ball_cfg, static_list, single_art,
                bounce_threshold=self.bounce_threshold,
                n_true_static=n_true_static,
                max_depenetration=self.max_depenetration,
                art_static=_art_static_enabled(), with_torque=with_torque,
                exact_support=self.scene.spec.exact_link_support)
            self._fused_dr = PDK.build_fused_substep(
                slot.model, init[0:3], init[3:7], slot.stiffness, slot.damping,
                np.asarray(self.gravity), self.dt / self.substeps,
                ball_cfg, static_list, single_art,
                bounce_threshold=self.bounce_threshold, with_dr=True,
                n_true_static=n_true_static,
                max_depenetration=self.max_depenetration,
                art_static=_art_static_enabled(), with_torque=with_torque,
                exact_support=self.scene.spec.exact_link_support)
            self._fused_slot = slot
            self._fused_ball = ball
            return

        # multi-articulation / multi-ball scenes (C8 / C11 class)
        if any(sl.dof_start != off for sl, off in zip(
                scene.articulations,
                np.cumsum([0] + [s.model.tree.n_dof for s in scene.articulations])[:-1])):
            return
        arts = [dict(model=sl.model,
                     base_pos=scene.initial_root[sl.actor_index][0:3],
                     base_quat=scene.initial_root[sl.actor_index][3:7],
                     kp=sl.stiffness, kd=sl.damping, drive_mode=sl.drive_mode)
                for sl in scene.articulations]
        balls = [dict(mass=fb.mass, radius=fb.radius, restitution=fb.restitution,
                      friction=fb.friction, plane_e=plane.restitution,
                      plane_mu=plane.dynamic_friction,
                      max_lin=fb.max_linear_velocity,
                      max_ang=fb.max_angular_velocity,
                      lin_damp=fb.linear_damping,
                      ang_damp=fb.angular_damping,
                      drag_k=fb.drag_k, magnus_k=fb.magnus_k,
                      kappa=_ball_kappa(fb))
                 for fb in scene.free_bodies]
        self._fused_multi = PDK.build_fused_substep_multi(
            arts, balls, static_list, art_list,
            np.asarray(self.gravity), self.dt / self.substeps,
            bounce_threshold=self.bounce_threshold,
            n_true_static=n_true_static,
            max_depenetration=self.max_depenetration,
            art_static=_art_static_enabled(),
            with_torque=self._sensors_want_torque(),
            exact_support=self.scene.spec.exact_link_support)
        self._fused_ball_actors = np.asarray(
            [fb.actor_index for fb in scene.free_bodies])
        self._fused_ball_bodies = np.asarray(
            [fb.body_start for fb in scene.free_bodies])

    def _baked_roots_moved(self, state: SimState):
        """Scalar bool: some constant-folded actor root differs from the
        scene constant (a ``set_actor_root_state_tensor_indexed`` write the
        fused kernels cannot see)."""
        idx = jnp.asarray(self._baked_actors)
        baked = jnp.asarray(self.scene.initial_root[self._baked_actors, 0:7])
        return jnp.any(state.root[:, idx, 0:7] != baked[None])

    def step(self, state: SimState, targets, efforts) -> SimState:
        """Batched step; routes to the fused Pallas path when eligible.

        Correctness guard: actors whose pose is folded into the kernels
        (fixed articulation bases, static actors) are compared against the
        scene constants; if any was rewritten at runtime the step runs on
        the XLA path, which reads every pose from the state."""
        if ((self._pallas_kernels is not None or self._fused_floating is not None)
                and state.root.shape[0] % 128 == 0):
            if self._baked_actors.size:
                return jax.lax.cond(
                    self._baked_roots_moved(state),
                    lambda s: self._step_vmapped(s, targets, efforts),
                    lambda s: self._step_batched_pallas(s, targets, efforts),
                    state)
            return self._step_batched_pallas(state, targets, efforts)
        return self._step_vmapped(state, targets, efforts)

    def step_dr(self, state: SimState, targets, efforts, dr) -> SimState:
        """Domain-randomized batched step; uses the DR-aware fused kernel
        when eligible. Base-welded humanoid geoms receive the shape-property
        DR scales too (round 4): their poses are compile-time constants but
        their materials ride the per-env DR channel, matching the XLA path's
        ``_ball_vs_art_group(dr)``."""
        if (getattr(self, "_fused_dr", None) is not None
                and state.root.shape[0] % 128 == 0):
            def fused(state):
                dt_s = self.dt / self.substeps
                state = state._replace(
                    net_contact_force=jnp.zeros_like(state.net_contact_force),
                    net_contact_torque=jnp.zeros_like(state.net_contact_torque))
                sl = slice(self._fused_slot.dof_start, self._fused_slot.dof_end)
                dr_chan = jnp.concatenate([
                    dr.kp_scale[:, sl], dr.kd_scale[:, sl],
                    dr.lower_shift[:, sl], dr.upper_shift[:, sl],
                    dr.mass_scale[:, None], dr.gravity_offset,
                    dr.friction_scale[:, None], dr.restitution_scale[:, None],
                ], axis=1)
                for _ in range(self.substeps):
                    state = self._substep_fused(state, targets, efforts, dt_s,
                                                dr_chan=dr_chan)
                return state
            if self._baked_actors.size:
                return jax.lax.cond(
                    self._baked_roots_moved(state),
                    lambda s: self._step_dr_vmapped(s, targets, efforts, dr),
                    fused, state)
            return fused(state)
        return self._step_dr_vmapped(state, targets, efforts, dr)

    def _step_batched_pallas(self, state: SimState, targets, efforts) -> SimState:
        dt_s = self.dt / self.substeps
        state = state._replace(
            net_contact_force=jnp.zeros_like(state.net_contact_force),
            net_contact_torque=jnp.zeros_like(state.net_contact_torque))
        if self._fused is not None:
            sub = self._substep_fused
        elif self._fused_floating is not None:
            sub = self._substep_fused_floating
        elif self._fused_multi is not None:
            sub = self._substep_fused_multi
        else:
            sub = self._substep_pallas
        for _ in range(self.substeps):
            state = sub(state, targets, efforts, dt_s)
        return state

    def _substep_fused_multi(self, state: SimState, targets, efforts, dt_s) -> SimState:
        """Entire substep for K-articulation / M-ball scenes as ONE kernel."""
        root = state.root
        ball_actors = jnp.asarray(self._fused_ball_actors)
        out = self._fused_multi(
            state.dof_pos, state.dof_vel, targets, efforts,
            root[:, ball_actors, 0:3], root[:, ball_actors, 7:10],
            root[:, ball_actors, 10:13])
        root = root.at[:, ball_actors, 0:3].set(out.ball_pos)
        root = root.at[:, ball_actors, 3:7].set(_integrate_quat(
            root[:, ball_actors, 3:7], out.ball_omega, dt_s))
        root = root.at[:, ball_actors, 7:10].set(out.ball_vel)
        root = root.at[:, ball_actors, 10:13].set(out.ball_omega)
        ncf = state.net_contact_force
        nct = state.net_contact_torque
        ng = len(self._fused_art_bodies)
        nb = len(self._fused_ball_actors)
        inv_dt = 1.0 / self.dt
        with_torque = out.impulses.shape[1] == 2 * ng + 3 * nb
        if ng:
            ncf = ncf.at[:, jnp.asarray(self._fused_art_bodies)].add(
                out.impulses[:, :ng] * inv_dt)
            if with_torque:
                nct = nct.at[:, jnp.asarray(self._fused_art_bodies)].add(
                    out.impulses[:, ng + 2 * nb:2 * ng + 2 * nb] * inv_dt)
        # exact per-ball attribution: static/plane row + the ball's own
        # art-reaction row (kernel impulse layout: geoms | static | art
        # [| geom moments | ball moments])
        ball_bodies = jnp.asarray(self._fused_ball_bodies)
        ball_imp = out.impulses[:, ng:ng + nb] + out.impulses[:, ng + nb:ng + 2 * nb]
        ncf = ncf.at[:, ball_bodies].add(ball_imp * inv_dt)
        if with_torque:
            nct = nct.at[:, ball_bodies].add(
                out.impulses[:, 2 * ng + 2 * nb:] * inv_dt)
        return SimState(
            root=root,
            dof_pos=out.q_new,
            dof_vel=out.qd_new,
            dof_force=out.tau,
            net_contact_force=ncf,
            net_contact_torque=nct,
        )

    def _substep_fused(self, state: SimState, targets, efforts, dt_s,
                       dr_chan=None) -> SimState:
        """The entire substep as ONE Pallas kernel (see _maybe_build_fused)."""
        slot, ball = self._fused_slot, self._fused_ball
        sl = slice(slot.dof_start, slot.dof_end)
        root = state.root
        if dr_chan is None:
            out = self._fused(
                state.dof_pos[:, sl], state.dof_vel[:, sl],
                targets[:, sl], efforts[:, sl],
                root[:, ball.actor_index, 0:3], root[:, ball.actor_index, 7:10],
                root[:, ball.actor_index, 10:13])
        else:
            out = self._fused_dr(
                state.dof_pos[:, sl], state.dof_vel[:, sl],
                targets[:, sl], efforts[:, sl],
                root[:, ball.actor_index, 0:3], root[:, ball.actor_index, 7:10],
                root[:, ball.actor_index, 10:13], dr_chan)
        root = root.at[:, ball.actor_index, 0:3].set(out.ball_pos)
        root = root.at[:, ball.actor_index, 3:7].set(_integrate_quat(
            root[:, ball.actor_index, 3:7], out.ball_omega, dt_s))
        root = root.at[:, ball.actor_index, 7:10].set(out.ball_vel)
        root = root.at[:, ball.actor_index, 10:13].set(out.ball_omega)
        ncf = state.net_contact_force
        nct = state.net_contact_torque
        ng = len(self._fused_art_bodies)
        inv_dt = 1.0 / self.dt
        with_torque = out.impulses.shape[1] == 2 * ng + 2
        if ng:
            ncf = ncf.at[:, jnp.asarray(self._fused_art_bodies)].add(
                out.impulses[:, :ng] * inv_dt)
            if with_torque:
                nct = nct.at[:, jnp.asarray(self._fused_art_bodies)].add(
                    out.impulses[:, ng + 1:2 * ng + 1] * inv_dt)
        # row ng is the ball's TOTAL contact impulse (plane + statics + art
        # reactions) — the geom rows carry ball reaction + art-static P
        ball_imp = out.impulses[:, ng]
        ncf = ncf.at[:, ball.body_start].add(ball_imp * inv_dt)
        if with_torque:
            nct = nct.at[:, ball.body_start].add(
                out.impulses[:, 2 * ng + 1] * inv_dt)
        return SimState(
            root=root,
            dof_pos=state.dof_pos.at[:, sl].set(out.q_new),
            dof_vel=state.dof_vel.at[:, sl].set(out.qd_new),
            dof_force=state.dof_force.at[:, sl].set(out.tau),
            net_contact_force=ncf,
            net_contact_torque=nct,
        )

    def _substep_pallas(self, state: SimState, targets, efforts, dt_s) -> SimState:
        """Articulation dynamics via the fused Pallas kernel (ONE TPU kernel
        per articulation replacing ~400 XLA ops), then the shared vmapped
        contact phase consuming the kernel's frames + Cholesky factors."""
        from isaacgym_tpu.ops import pallas_dynamics as PDK
        scene = self.scene
        root = state.root
        dof_pos, dof_vel, dof_force = state.dof_pos, state.dof_vel, state.dof_force

        flat = []
        for si, slot in enumerate(scene.articulations):
            sl = slice(slot.dof_start, slot.dof_end)
            out = self._pallas_kernels[si](
                dof_pos[:, sl], dof_vel[:, sl], targets[:, sl], efforts[:, sl])
            dof_pos = dof_pos.at[:, sl].set(out.q_new)
            dof_force = dof_force.at[:, sl].set(out.tau)
            flat += [out.q_new, out.qd_new, out.frame_pos, out.frame_quat, out.chol]

        def contact_one(root1, dp1, dv1, df1, ncf1, nct1, *art_flat):
            art_runtime = []
            it = iter(art_flat)
            for slot in scene.articulations:
                qn, qdn, fp, fq, cholp = (next(it) for _ in range(5))
                init = scene.initial_root[slot.actor_index]
                art_runtime.append({
                    "slot": slot, "q": qn, "u": qdn,
                    "chol": PDK.unpack_chol(cholp, slot.model.tree.n_dof),
                    "base_pos": jnp.asarray(init[0:3]),
                    "base_quat": jnp.asarray(init[3:7]),
                    "frames": (fp, fq),
                })
            return self._contacts_and_writeback(root1, dp1, dv1, df1,
                                                art_runtime, dt_s, None,
                                                ncf=ncf1, nct=nct1)

        return jax.vmap(contact_one)(root, dof_pos, dof_vel, dof_force,
                                     state.net_contact_force,
                                     state.net_contact_torque, *flat)

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------

    def initial_state(self, batch: Optional[int] = None) -> SimState:
        s = SimState(
            root=jnp.asarray(self.scene.initial_root),
            dof_pos=jnp.zeros(self.scene.num_dofs, jnp.float32),
            dof_vel=jnp.zeros(self.scene.num_dofs, jnp.float32),
            dof_force=jnp.zeros(self.scene.num_dofs, jnp.float32),
            net_contact_force=jnp.zeros((self.scene.num_bodies, 3), jnp.float32),
            net_contact_torque=jnp.zeros((self.scene.num_bodies, 3), jnp.float32),
        )
        if batch is None:
            return s
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), s)

    # ------------------------------------------------------------------
    # single-env step
    # ------------------------------------------------------------------

    def _step_single(self, state: SimState, targets, efforts, dr=None) -> SimState:
        dt_s = self.dt / self.substeps
        state = state._replace(
            net_contact_force=jnp.zeros_like(state.net_contact_force),
            net_contact_torque=jnp.zeros_like(state.net_contact_torque))
        for _ in range(self.substeps):
            state = self._substep(state, targets, efforts, dt_s, dr)
        return state

    def _substep(self, state: SimState, targets, efforts, dt_s, dr=None) -> SimState:
        scene = self.scene
        root = state.root
        dof_pos, dof_vel, dof_force = state.dof_pos, state.dof_vel, state.dof_force
        gravity = self.gravity if dr is None else self.gravity + dr.gravity_offset

        # -- articulated dynamics + integration --------------------------------
        art_runtime = []
        for slot in scene.articulations:
            model, tree = slot.model, slot.model.tree
            q = dof_pos[slot.dof_start:slot.dof_end]
            qd = dof_vel[slot.dof_start:slot.dof_end]
            ra = root[slot.actor_index]
            base_pos, base_quat = ra[0:3], ra[3:7]
            u = jnp.concatenate([ra[10:13], ra[7:10], qd]) if model.floating else qd

            tgt = targets[slot.dof_start:slot.dof_end]
            eff = efforts[slot.dof_start:slot.dof_end]
            kp = jnp.asarray(slot.stiffness)
            kd = jnp.asarray(slot.damping)
            if dr is not None:
                kp = kp * dr.kp_scale[slot.dof_start:slot.dof_end]
                kd = kd * dr.kd_scale[slot.dof_start:slot.dof_end]
            if slot.drive_mode == DRIVE_POS:
                tau = kp * (tgt - q) - kd * qd + eff
            else:
                tau = eff
            tau = jnp.clip(tau, -jnp.asarray(tree.effort), jnp.asarray(tree.effort))
            tau_gen = jnp.concatenate([jnp.zeros(6), tau]) if model.floating else tau

            mass_scale = None if dr is None else dr.mass_scale
            udot, chol = D.forward_dynamics(model, base_pos, base_quat, q, u, tau_gen, gravity,
                                            mass_scale=mass_scale)
            u = u + dt_s * udot
            if model.floating:
                omega, vel, qd_new = u[0:3], u[3:6], u[6:]
                # base velocity clamps (AssetOptions.max_angular_velocity /
                # max_linear_velocity)
                ma = float(slot.max_angular_velocity)
                if ma > 0.0:
                    omega = jnp.clip(omega, -ma, ma)
                ml = float(slot.max_linear_velocity)
                if ml > 0.0:
                    vel = jnp.clip(vel, -ml, ml)
            else:
                qd_new = u
            # DOF velocity clamp at the URDF limit (PhysX maxJointVelocity);
            # 0 = unlimited. Matches the fused Pallas kernels.
            vmax = np.where(tree.max_velocity > 0,
                            tree.max_velocity, np.inf).astype(np.float32)
            qd_new = jnp.clip(qd_new, -vmax, vmax)

            q_new = q + dt_s * qd_new
            lo, hi = jnp.asarray(tree.lower), jnp.asarray(tree.upper)
            if dr is not None:
                lo = lo + dr.lower_shift[slot.dof_start:slot.dof_end]
                hi = hi + dr.upper_shift[slot.dof_start:slot.dof_end]
            at_lo, at_hi = q_new < lo, q_new > hi
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
            dof_force = dof_force.at[slot.dof_start:slot.dof_end].set(tau)
            frames = fk_dof_frames(tree, base_pos, base_quat, q_new)
            art_runtime.append({
                "slot": slot, "q": q_new, "u": u, "chol": chol,
                "base_pos": base_pos, "base_quat": base_quat, "frames": frames,
            })

        return self._contacts_and_writeback(root, dof_pos, dof_vel, dof_force,
                                            art_runtime, dt_s, dr,
                                            ncf=state.net_contact_force,
                                            nct=state.net_contact_torque)

    def _contacts_and_writeback(self, root, dof_pos, dof_vel, dof_force,
                                art_runtime, dt_s, dr, ncf=None, nct=None):
        """Shared contact + integration tail (single env); consumed by both
        the XLA articulation phase and the fused Pallas kernel phase.
        Accumulates per-body net contact forces (impulse / step dt) and
        contact moments about each body's frame origin (ball bodies: about
        the ball center) into the state — the reference
        ``net_contact_force_tensor`` + force-sensor wrench capability."""
        scene = self.scene
        gravity = self.gravity if dr is None else self.gravity + dr.gravity_offset
        if ncf is None:
            ncf = jnp.zeros((scene.num_bodies, 3), jnp.float32)
        if nct is None:
            nct = jnp.zeros((scene.num_bodies, 3), jnp.float32)

        # -- free bodies (balls): gravity + environment contacts ---------------
        ball_states = []
        for ball in scene.free_bodies:
            ra = root[ball.actor_index]
            pos, vel, omega = ra[0:3], ra[7:10], ra[10:13]
            kappa = _ball_kappa(ball)
            vel = vel + gravity * dt_s
            # PhysX velocity damping (AssetOptions.linear/angular_damping;
            # IsaacGym defaults 0.0 / 0.5): v *= max(0, 1 - d dt) per substep
            ld = float(getattr(ball, "linear_damping", 0.0))
            ad = float(getattr(ball, "angular_damping", 0.5))
            if ld > 0.0:
                vel = vel * max(0.0, 1.0 - ld * dt_s)
            if ad > 0.0:
                omega = omega * max(0.0, 1.0 - ad * dt_s)
            # opt-in aerodynamics (beyond the reference; scene.py FreeBodySlot)
            kd_aero = float(getattr(ball, "drag_k", 0.0))
            km_aero = float(getattr(ball, "magnus_k", 0.0))
            if kd_aero > 0.0:
                vel = vel - dt_s * kd_aero * jnp.linalg.norm(vel) * vel
            if km_aero > 0.0:
                vel = vel + dt_s * km_aero * jnp.cross(omega, vel)

            if scene.spec.plane is not None:
                e, mu = C.combine_material(ball.restitution, scene.spec.plane.restitution,
                                           ball.friction, scene.spec.plane.dynamic_friction)
                if scene.spec.terrain is not None:
                    # heightfield ground (N5): bilinear height + fd normal
                    terr = scene.spec.terrain
                    def plane_fn(p):
                        h = terr.sample(p[:2])
                        n = terr.normal(p[:2])
                        dist = (p[2] - h) * n[2] - ball.radius
                        return C.ContactFrame(dist, n, p - n * ball.radius)
                else:
                    plane_fn = lambda p: C.sphere_plane(p, ball.radius)
                frame, now_dist = C.swept_frame(plane_fn, pos, vel, _ccd_dt(dt_s))
                dv, dw, _, active = C.resolve_sphere_impulse_spin(
                    vel, omega, ball.radius, kappa, frame, jnp.zeros(3),
                    e, mu, self.bounce_threshold)
                vel = vel + dv
                omega = omega + dw
                pos = C.depenetrate(pos, frame._replace(dist=now_dist), active)
                ncf = ncf.at[ball.body_start].add(dv * (ball.mass / self.dt))
                # contact moment about the ball center: lever = -r n
                nct = nct.at[ball.body_start].add(
                    -ball.radius * jnp.cross(frame.normal, dv)
                    * (ball.mass / self.dt))

            for grp in self.static_groups:
                pos, vel, omega, dv_tot, tq_ball = self._ball_vs_static_group(
                    root, grp, ball, pos, vel, omega, dt_s)
                ncf = ncf.at[ball.body_start].add(dv_tot * (ball.mass / self.dt))
                nct = nct.at[ball.body_start].add(tq_ball * (ball.mass / self.dt))

            for art_idx, groups in self.art_groups.items():
                rt = art_runtime[art_idx]
                for grp in groups:
                    pos, vel, omega, du, P, tq_art, tq_ball = \
                        self._ball_vs_art_group(
                            rt, grp, ball, pos, vel, omega, dt_s, dr)
                    rt["u"] = rt["u"] + du
                    ncf = ncf.at[ball.body_start].add(P.sum(axis=0) / self.dt)
                    ncf = ncf.at[jnp.asarray(grp.body)].add(-P / self.dt)
                    nct = nct.at[ball.body_start].add(tq_ball / self.dt)
                    nct = nct.at[jnp.asarray(grp.body)].add(tq_art / self.dt)

            ball_states.append([pos, vel, omega])

        # -- ball-ball contacts (C11 class: two free balls in one env) ---------
        for i in range(len(scene.free_bodies)):
            for j in range(i + 1, len(scene.free_bodies)):
                a, b = scene.free_bodies[i], scene.free_bodies[j]
                pa, va, wa = ball_states[i]
                pb, vb, wb = ball_states[j]
                ka, kb = _ball_kappa(a), _ball_kappa(b)
                inv_ma, inv_mb = 1.0 / a.mass, 1.0 / b.mass
                v_rel = va - vb
                # swept-sample CCD on the relative separation (edge-correct:
                # sphere-sphere distance is radial, min over samples)
                ccd = _ccd_dt(dt_s)
                offs = ([0.0] if ccd == 0.0 else
                        [ccd * s / 4 for s in range(5)])
                dist = jnp.stack([
                    jnp.linalg.norm(pa - pb + v_rel * t) for t in offs]
                ).min(axis=0) - a.radius - b.radius
                d = pa - pb
                dn = jnp.linalg.norm(d)
                n = d / jnp.maximum(dn, 1e-9)
                vn = jnp.sum(v_rel * n)
                active = (dist < 0.0) & (vn < 0.0)
                e, mu = C.combine_material(a.restitution, b.restitution,
                                           a.friction, b.friction)
                e_eff = jnp.where(jnp.abs(vn) > self.bounce_threshold, e, 0.0)
                Pn = jnp.where(active, -(1.0 + e_eff) * vn / (inv_ma + inv_mb), 0.0)
                # slip of a's surface past b's at the contact point
                slip = (v_rel - a.radius * jnp.cross(wa, n)
                        - b.radius * jnp.cross(wb, n))
                vt = slip - jnp.sum(slip * n) * n
                vt_norm = jnp.linalg.norm(vt)
                t_hat = vt / jnp.maximum(vt_norm, 1e-9)
                w_t = (1.0 + ka) * inv_ma + (1.0 + kb) * inv_mb
                Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_norm / w_t), 0.0)
                P = Pn * n - Pt * t_hat
                dwdir = jnp.cross(n, t_hat)
                ball_states[i][1] = va + P * inv_ma
                ball_states[j][1] = vb - P * inv_mb
                ball_states[i][2] = wa + (ka * inv_ma / a.radius) * Pt * dwdir
                ball_states[j][2] = wb + (kb * inv_mb / b.radius) * Pt * dwdir
                push = jnp.where(active,
                                 jnp.maximum(-(dn - a.radius - b.radius), 0.0),
                                 0.0)
                ball_states[i][0] = pa + 0.5 * push * n
                ball_states[j][0] = pb - 0.5 * push * n
                ncf = ncf.at[a.body_start].add(P / self.dt)
                ncf = ncf.at[b.body_start].add(-P / self.dt)
                # moments about each ball's center (contact at +-r n)
                nct = nct.at[a.body_start].add(
                    -a.radius * jnp.cross(n, P) / self.dt)
                nct = nct.at[b.body_start].add(
                    -b.radius * jnp.cross(n, P) / self.dt)

        # -- clamp + integrate + write back -------------------------------------
        for ball, (pos, vel, omega) in zip(scene.free_bodies, ball_states):
            # AssetOptions.max_linear_velocity (default 1000): inert in play,
            # bounds runaway states like the articulation clamps do.
            # PhysX caps the MAGNITUDE (not per component).
            ml = float(ball.max_linear_velocity)
            if ml > 0.0:
                vel = vel * jnp.minimum(
                    1.0, ml / jnp.maximum(jnp.linalg.norm(vel), 1e-9))
            # AssetOptions.max_angular_velocity (the reference loads the ball
            # with default options -> 64 rad/s spin cap in PhysX)
            ma = float(getattr(ball, "max_angular_velocity", 64.0))
            if ma > 0.0:
                omega = omega * jnp.minimum(
                    1.0, ma / jnp.maximum(jnp.linalg.norm(omega), 1e-9))
            pos = pos + dt_s * vel
            # integrate the ball's orientation from its (spin-updated)
            # angular velocity — PhysX integrates free-body rotation
            bq = _integrate_quat(root[ball.actor_index, 3:7], omega, dt_s)
            root = root.at[ball.actor_index, 0:3].set(pos)
            root = root.at[ball.actor_index, 3:7].set(bq)
            root = root.at[ball.actor_index, 7:10].set(vel)
            root = root.at[ball.actor_index, 10:13].set(omega)

        # -- articulations vs static geoms (table slab, net): the paddle/arm
        # stops at the table and a fallen floating-base humanoid rests ON it
        # (PhysX full-pair narrowphase implied by the reference scenes,
        # humanoid_pingpong_3_actor_all_dof.py:470-640) ------------------------
        if _art_static_enabled():
            # scene-order concatenated group per articulation: sequential
            # resolution order identical to the fused kernels' art_geoms walk
            for art_idx, grp in self.art_ground_groups.items():
                rt = art_runtime[art_idx]
                for sgrp in self.static_groups:
                    du, P_sum, tq_sum = self._art_vs_static_group(
                        rt, grp, sgrp, root, dt_s)
                    rt["u"] = rt["u"] + du
                    ncf = ncf.at[jnp.asarray(grp.body)].add(
                        P_sum / self.dt)
                    nct = nct.at[jnp.asarray(grp.body)].add(
                        tq_sum / self.dt)

        # -- articulation links vs articulation links (opt-in narrowphase,
        # SceneSpec.link_collision: self-collision + cross-articulation link
        # pairs, compile-time pruned — crossing paddles collide instead of
        # passing through) -----------------------------------------------------
        for pa, pb in self._art_art_pairs:
            ncf, nct = self._art_vs_art_pair(pa, pb, art_runtime, ncf, nct,
                                             dt_s)

        # -- floating articulations vs ground (feet etc.) ----------------------
        # ONE scene-order group per articulation: the same sequential
        # resolution order as the fused kernels (see _build_geom_groups)
        if scene.spec.plane is not None:
            for art_idx, grp in self.art_ground_groups.items():
                rt = art_runtime[art_idx]
                if not rt["slot"].model.floating:
                    continue
                rt["u"] = rt["u"] + self._art_vs_ground_group(rt, grp, dt_s)

        # -- write back articulation state -------------------------------------
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

        return SimState(root=root, dof_pos=dof_pos, dof_vel=dof_vel,
                        dof_force=dof_force, net_contact_force=ncf,
                        net_contact_torque=nct)

    # ------------------------------------------------------------------
    # contact helpers (vectorized over geom groups)
    # ------------------------------------------------------------------

    def _frames_for_group(self, kind, pos, radius, gpos, gquat, size,
                          per_geom_pos: bool = False) -> C.ContactFrame:
        """Sphere-vs-K-geoms of one kind; vectorized over the group axis.
        ``per_geom_pos=True`` takes a (k,3) sphere position per geom (used by
        the swept-CCD samples, whose relative offsets differ per geom)."""
        ax = 0 if per_geom_pos else None
        if kind == U.GEOM_BOX:
            fn = lambda p, gp, gq, s: C.sphere_box(p, radius, gp, gq, s)
            return jax.vmap(fn, in_axes=(ax, 0, 0, 0))(pos, gpos, gquat, jnp.asarray(size))
        if kind == U.GEOM_CYLINDER:
            fn = lambda p, gp, gq, s: C.sphere_cylinder(p, radius, gp, gq, s[0], s[1])
            return jax.vmap(fn, in_axes=(ax, 0, 0, 0))(pos, gpos, gquat, jnp.asarray(size))
        if kind == U.GEOM_SPHERE:
            fn = lambda p, gp, s: C.sphere_sphere(p, radius, gp, s[0])
            return jax.vmap(fn, in_axes=(ax, 0, 0))(pos, gpos, jnp.asarray(size))
        raise NotImplementedError(kind)

    def _ball_vs_static_group(self, root, grp: _GeomGroup, ball, pos, vel,
                              omega, dt_s):
        roots = root[jnp.asarray(grp.actor_index)]                # (k,13)
        gpos = roots[:, 0:3] + rot.quat_rotate(roots[:, 3:7], jnp.asarray(grp.offset_pos))
        gquat = rot.quat_mul(roots[:, 3:7], jnp.asarray(grp.offset_quat))
        geom_fn = lambda p: self._frames_for_group(grp.kind, p, ball.radius,
                                                   gpos, gquat, grp.size)
        # K=2 suffices for statics: slab/net capture windows (>=45 mm)
        # exceed the per-substep ball motion (<=36 mm at C6 speeds)
        frame, now_dist = C.swept_frame(geom_fn, pos, vel, _ccd_dt(dt_s), samples=2)
        e, mu = C.combine_material(ball.restitution, jnp.asarray(grp.restitution),
                                   ball.friction, jnp.asarray(grp.friction))
        dv, dw, _, active = C.resolve_sphere_impulse_spin(
            vel[None], omega[None], ball.radius, _ball_kappa(ball), frame,
            jnp.zeros_like(gpos), e, mu, self.bounce_threshold)
        dv_tot = dv.sum(axis=0)
        vel = vel + dv_tot
        omega = omega + dw.sum(axis=0)
        push = jnp.where(active[:, None], frame.normal * jnp.maximum(-now_dist, 0.0)[:, None], 0.0)
        # per-geom moment about the ball center (lever = -r n_i), in dv units
        tq_ball = (-ball.radius * jnp.cross(frame.normal, dv)).sum(axis=0)
        return pos + push.sum(axis=0), vel, omega, dv_tot, tq_ball

    def _ball_vs_art_group(self, rt, grp: _GeomGroup, ball, pos, vel, omega,
                           dt_s, dr=None):
        """Ball vs one kind-group of articulated geoms, with joint-space
        two-body impulses and ball spin coupling.
        Returns (pos, vel, omega, Δu, P)."""
        model = rt["slot"].model
        fp, fq = rt["frames"]
        nd = model.tree.n_dof
        pos_ext = jnp.concatenate([fp, rt["base_pos"][None]], axis=0)
        quat_ext = jnp.concatenate([fq, rt["base_quat"][None]], axis=0)
        ref = jnp.asarray(np.where(grp.link < 0, nd, grp.link))
        bp, bq = pos_ext[ref], quat_ext[ref]
        gpos = bp + rot.quat_rotate(bq, jnp.asarray(grp.offset_pos))
        gquat = rot.quat_mul(bq, jnp.asarray(grp.offset_quat))
        geom_fn = lambda p: self._frames_for_group(grp.kind, p, ball.radius,
                                                   gpos, gquat, grp.size)
        frame0 = geom_fn(pos)

        J = D.point_jacobians(model, rt["frames"], rt["base_pos"], grp.link, frame0.point)  # (k,3,nv)
        nv = J.shape[-1]
        k = J.shape[0]
        MinvJT = L.chol_solve(rt["chol"], J.reshape(k * 3, nv).T).T.reshape(k, 3, nv)  # (k,3,nv) rows of M^-1 J^T
        v_point = jnp.einsum("kav,v->ka", J, rt["u"])

        # swept-sample CCD along the ball's motion relative to the (frozen-
        # over-the-substep) geom: the per-geom relative velocity is the mean
        # over geoms of the group... use the per-geom v_rel via a sweep of the
        # BALL position against the static-for-this-substep geom poses with
        # the geom-point velocity folded into the sample offsets per geom.
        v_rel0 = vel[None] - v_point                              # (k,3)
        ccd = _ccd_dt(dt_s)
        if ccd > 0.0:
            K = 4
            frames = [frame0] + [
                self._frames_for_group(
                    grp.kind, pos[None] + v_rel0 * (ccd * s / K), ball.radius,
                    gpos, gquat, grp.size, per_geom_pos=True)
                for s in range(1, K + 1)]
            dists = jnp.stack([f.dist for f in frames])
            normals = jnp.stack([f.normal for f in frames])
            # first penetrating sample = entry-side normal (see swept_frame)
            j = jnp.argmax(dists < 0.0, axis=0)
            frame = C.ContactFrame(
                dist=jnp.take_along_axis(dists, j[None], axis=0)[0],
                normal=jnp.take_along_axis(normals, j[None, :, None], axis=0)[0],
                point=frame0.point)
        else:
            frame = frame0

        n = frame.normal
        v_rel = vel[None] - v_point
        vn = jnp.sum(v_rel * n, axis=-1)
        active = (frame.dist < 0.0) & (vn < 0.0)
        grp_e = jnp.asarray(grp.restitution)
        grp_mu = jnp.asarray(grp.friction)
        if dr is not None:  # humanoid shape-property randomization
            grp_e = grp_e * dr.restitution_scale
            grp_mu = grp_mu * dr.friction_scale
        e, mu = C.combine_material(ball.restitution, grp_e, ball.friction, grp_mu)
        e_eff = jnp.where(jnp.abs(vn) > self.bounce_threshold, e, 0.0)
        inv_m = 1.0 / ball.mass
        kappa = _ball_kappa(ball)
        w_n = inv_m + jnp.einsum("ka,kav,kbv,kb->k", n, J, MinvJT, n)
        Pn = jnp.where(active, -(1.0 + e_eff) * vn / jnp.maximum(w_n, 1e-9), 0.0)
        # tangential slip at the contact point includes the ball's spin; the
        # ball-side tangential effective inverse mass is (1 + kappa)/m
        slip = v_rel - ball.radius * jnp.cross(jnp.broadcast_to(omega, n.shape), n)
        vt = slip - jnp.sum(slip * n, axis=-1)[:, None] * n
        vt_norm = jnp.linalg.norm(vt, axis=-1)
        t_hat = vt / jnp.maximum(vt_norm, 1e-9)[:, None]
        w_t = (1.0 + kappa) * inv_m + jnp.einsum("ka,kav,kbv,kb->k", t_hat, J, MinvJT, t_hat)
        Pt = jnp.where(active, jnp.minimum(mu * Pn, vt_norm / jnp.maximum(w_t, 1e-9)), 0.0)
        P = Pn[:, None] * n - Pt[:, None] * t_hat                 # (k,3)

        vel = vel + P.sum(axis=0) * inv_m
        omega = omega + (kappa * inv_m / ball.radius) * (
            jnp.cross(n, t_hat) * Pt[:, None]).sum(axis=0)
        du = -jnp.einsum("kav,ka->v", MinvJT, P)
        push = jnp.where(active[:, None], n * jnp.maximum(-frame0.dist, 0.0)[:, None], 0.0)
        # contact moments: about the ball center (lever = point - ball pos)
        # and about each geom body's frame origin (impulse units)
        tq_ball = jnp.cross(frame0.point - pos[None], P).sum(axis=0)
        borg = bp + rot.quat_rotate(bq, jnp.asarray(grp.body_off_pos))
        tq_art = jnp.cross(frame0.point - borg, -P)
        return pos + push.sum(axis=0), vel, omega, du, P, tq_art, tq_ball

    def _art_vs_static_group(self, rt, grp: _GeomGroup, sgrp: _GeomGroup,
                             root, dt_s):
        """Articulation geoms (bounding spheres) vs one static geom group
        (table slab, net, ...): Baumgarte-stabilized impulses into the
        generalized velocity — the same machinery as the ground contact,
        extended from {plane} to the scene's static geoms (VERDICT r2
        missing item 1; PhysX gives the reference this for free).

        Returns (du, P_sum_per_art_geom (k,3), torque_sum_per_art_geom
        (k,3) about each geom body's frame origin)."""
        model = rt["slot"].model
        fp, fq = rt["frames"]
        nd = model.tree.n_dof
        pos_ext = jnp.concatenate([fp, rt["base_pos"][None]], axis=0)
        quat_ext = jnp.concatenate([fq, rt["base_quat"][None]], axis=0)
        ref = jnp.asarray(np.where(grp.link < 0, nd, grp.link))
        bp, bq = pos_ext[ref], quat_ext[ref]
        centers = bp + rot.quat_rotate(bq, jnp.asarray(grp.offset_pos))  # (k,3)
        radii = jnp.asarray(grp.radius_bound)                            # (k,)
        k, s = len(grp.link), len(sgrp.actor_index)

        roots = root[jnp.asarray(sgrp.actor_index)]                      # (s,13)
        gpos = roots[:, 0:3] + rot.quat_rotate(roots[:, 3:7],
                                               jnp.asarray(sgrp.offset_pos))
        gquat = rot.quat_mul(roots[:, 3:7], jnp.asarray(sgrp.offset_quat))

        frame = jax.vmap(lambda c, r: self._frames_for_group(
            sgrp.kind, c, r, gpos, gquat, sgrp.size))(centers, radii)
        # flatten the (k, s) pair grid
        dist = frame.dist.reshape(k * s)
        n = frame.normal.reshape(k * s, 3)
        points = frame.point.reshape(k * s, 3)
        kinds = (grp.kinds if grp.kinds is not None
                 else np.full(k, grp.kind))
        if (self.scene.spec.exact_link_support
                and np.any(np.isin(kinds, (U.GEOM_CYLINDER, U.GEOM_BOX)))):
            # SceneSpec.exact_link_support: replace the bounding-sphere
            # radius with the geom's support extent along the per-pair
            # contact normal (exact for face-dominated contacts); sphere
            # geoms in a mixed group keep their radius (support of a sphere
            # is its radius in every direction)
            gq_geom = rot.quat_mul(bq, jnp.asarray(grp.offset_quat))  # (k,4)
            n_k = n.reshape(k, s, 3)
            axis = rot.quat_rotate(gq_geom, jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0]), (k, 3)))                # (k,3)
            na = jnp.abs(jnp.einsum("ksa,ka->ks", n_k, axis))
            sup_cyl = (na * jnp.asarray(grp.size)[:, 1:2]
                       + jnp.sqrt(jnp.maximum(1.0 - na * na, 0.0))
                       * jnp.asarray(grp.size)[:, 0:1])               # (k,s)
            axes = jnp.stack([rot.quat_rotate(gq_geom, jnp.broadcast_to(
                jnp.asarray(e), (k, 3))) for e in
                ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))],
                axis=1)                                               # (k,3ax,3)
            sup_box = sum(jnp.abs(jnp.einsum("ksa,ka->ks", n_k, axes[:, i]))
                          * jnp.asarray(grp.size)[:, i:i + 1] for i in range(3))
            sup = jnp.where(jnp.asarray(kinds == U.GEOM_CYLINDER)[:, None],
                            sup_cyl,
                            jnp.where(jnp.asarray(kinds == U.GEOM_BOX)[:, None],
                                      sup_box, radii[:, None]))
            sup = sup.reshape(k * s)
            dist = dist + jnp.repeat(radii, s) - sup
            points = (jnp.repeat(centers, s, axis=0)
                      - n * sup[:, None])
        links = np.repeat(np.asarray(grp.link), s)

        J = D.point_jacobians(model, rt["frames"], rt["base_pos"], links, points)
        nv = J.shape[-1]
        MinvJT = L.chol_solve(rt["chol"], J.reshape(k * s * 3, nv).T).T.reshape(k * s, 3, nv)
        bias = jnp.minimum(0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                           self.max_depenetration)
        e, mu = C.combine_material(
            jnp.repeat(jnp.asarray(grp.restitution), s),
            jnp.tile(jnp.asarray(sgrp.restitution), k),
            jnp.repeat(jnp.asarray(grp.friction), s),
            jnp.tile(jnp.asarray(sgrp.friction), k))
        w_n = jnp.einsum("ka,kav,kbv,kb->k", n, J, MinvJT, n)

        # SEQUENTIAL (Gauss-Seidel) resolution, matching the fused kernels:
        # each pair sees the velocity already corrected by earlier pairs —
        # simultaneous resolution double-counts when several links land at
        # once (two feet hitting the table bounced the body at full speed)
        u = rt["u"]
        u0 = u
        P_rows = []
        for i in range(k * s):
            v_point = J[i] @ u
            vn_i = jnp.sum(v_point * n[i])
            active = (dist[i] < 0.0) & (vn_i < 0.1)
            e_eff = jnp.where(jnp.abs(vn_i) > self.bounce_threshold, e[i], 0.0)
            Pn = jnp.where(active,
                           (-(1.0 + e_eff) * jnp.minimum(vn_i, 0.0) + bias[i])
                           / jnp.maximum(w_n[i], 1e-9), 0.0)
            vt = v_point - vn_i * n[i]
            vt_norm = jnp.linalg.norm(vt)
            t_hat = vt / jnp.maximum(vt_norm, 1e-9)
            w_t = jnp.einsum("a,av,bv,b->", t_hat, J[i], MinvJT[i], t_hat)
            Pt = jnp.where(active,
                           jnp.minimum(mu[i] * Pn,
                                       vt_norm / jnp.maximum(w_t, 1e-9)), 0.0)
            s_i = _resting_smooth(dist[i], vn_i, self.bounce_threshold)
            P = (Pn * n[i] - Pt * t_hat) * s_i
            u = u + jnp.einsum("av,a->v", MinvJT[i], P)
            P_rows.append(P)
        P_all = jnp.stack(P_rows)                                        # (k*s,3)
        borg = bp + rot.quat_rotate(bq, jnp.asarray(grp.body_off_pos))   # (k,3)
        levers = points - jnp.repeat(borg, s, axis=0)
        tq_all = jnp.cross(levers, P_all)
        return (u - u0, P_all.reshape(k, s, 3).sum(axis=1),
                tq_all.reshape(k, s, 3).sum(axis=1))

    def _build_art_art_pairs(self):
        """Compile-time pair list for the opt-in link-vs-link narrowphase
        (``SceneSpec.link_collision``): bounding sphere of one articulation
        geom vs the exact primitive of another. PhysX-default-like filters
        applied at build time:

        - same-link and adjacent-link (parent/child dof, or base-welded vs a
          chain root) pairs excluded — the standard URDF adjacency filter;
        - pairs overlapping at the build (rest) configuration excluded, both
          directions of the sphere/exact asymmetry checked;
        - cross-articulation pairs provably out of reach excluded (fixed-base
          chain-norm bound, same bound as the art-vs-static pruning);
        - pairs where neither side has any mobility excluded (a fixed-base
          welded geom pair cannot move, so there is nothing to resolve).
        """
        from isaacgym_tpu.ops import pallas_dynamics as PDK
        scene = self.scene
        geoms = []
        for g in scene.art_geoms:
            slot = scene.articulations[g.art_index]
            tree = slot.model.tree
            link = int(tree.body_ref_dof[g.body_index])
            offp, offq = _compose(tree.body_ref_pos[g.body_index],
                                  tree.body_ref_quat[g.body_index],
                                  g.local_pos, g.local_quat)
            rb = (float(g.size[0]) if g.kind == U.GEOM_SPHERE
                  else float(np.max(g.size)))
            geoms.append(dict(art=g.art_index, link=link, off_pos=offp,
                              off_quat=offq, kind=g.kind,
                              size=np.asarray(g.size, np.float32),
                              e=float(g.restitution), mu=float(g.friction),
                              radius_bound=rb,
                              body=slot.body_start + g.body_index,
                              body_off=np.asarray(
                                  tree.body_ref_pos[g.body_index], np.float32)))
        # rest-pose world transforms: numpy FK at the zero joint configuration
        world = []
        for g in geoms:
            slot = scene.articulations[g["art"]]
            init = scene.initial_root[slot.actor_index]
            tree = slot.model.tree
            p, q = np.asarray(init[0:3]), np.asarray(init[3:7])
            chain = []
            d = g["link"]
            while d >= 0:
                chain.append(d)
                d = int(tree.dof_parent[d])
            for d in reversed(chain):
                p, q = _compose(p, q, tree.dof_pre_pos[d], tree.dof_pre_quat[d])
            p, q = _compose(p, q, g["off_pos"], g["off_quat"])
            world.append((p, q))

        def adjacent(tree, la, lb):
            if la == lb:
                return True
            if la >= 0 and int(tree.dof_parent[la]) == lb:
                return True
            if lb >= 0 and int(tree.dof_parent[lb]) == la:
                return True
            if la < 0 and lb >= 0 and int(tree.dof_parent[lb]) < 0:
                return True
            if lb < 0 and la >= 0 and int(tree.dof_parent[la]) < 0:
                return True
            return False

        def rest_dist(i, j):
            pi, _qi = world[i]
            pj, qj = world[j]
            sg = dict(kind=geoms[j]["kind"], pos=pj, quat=qj,
                      size=geoms[j]["size"])
            return PDK._point_geom_dist_np(pi, sg) - geoms[i]["radius_bound"]

        pairs = []
        for i in range(len(geoms)):
            for j in range(i + 1, len(geoms)):
                a, b = geoms[i], geoms[j]
                sa = scene.articulations[a["art"]]
                sb = scene.articulations[b["art"]]
                if a["art"] == b["art"]:
                    if adjacent(sa.model.tree, a["link"], b["link"]):
                        continue
                elif not sa.model.floating and not sb.model.floating:
                    ia = np.asarray(scene.initial_root[sa.actor_index][0:3])
                    ib = np.asarray(scene.initial_root[sb.actor_index][0:3])
                    gap = float(np.linalg.norm(ia - ib))
                    if gap > (PDK._art_geom_reach_np(sa.model, a)
                              + PDK._art_geom_reach_np(sb.model, b) + 0.03):
                        continue
                a_mobile = a["link"] >= 0 or sa.model.floating
                b_mobile = b["link"] >= 0 or sb.model.floating
                if not (a_mobile or b_mobile):
                    continue
                if min(rest_dist(i, j), rest_dist(j, i)) < 0.005:
                    continue
                # sphere side = smaller bounding radius (tighter approximation)
                if a["radius_bound"] <= b["radius_bound"]:
                    pairs.append((a, b))
                else:
                    pairs.append((b, a))
        return pairs

    def _art_vs_art_pair(self, a, b, art_runtime, ncf, nct, dt_s):
        """One link-link contact of the opt-in narrowphase: bounding sphere
        of geom ``a`` vs the exact primitive of geom ``b``. The impulse lands
        on BOTH articulations' generalized velocities (same-articulation
        pairs use the relative Jacobian through the shared mass matrix);
        resolution is sequential Gauss-Seidel across pairs, like
        :meth:`_art_vs_static_group`. Mutates ``rt["u"]`` in the runtime
        dicts and returns the updated ``(ncf, nct)``."""
        rta, rtb = art_runtime[a["art"]], art_runtime[b["art"]]

        def geom_frame(rt, g):
            fp, fq = rt["frames"]
            if g["link"] < 0:
                bp, bq = rt["base_pos"], rt["base_quat"]
            else:
                bp, bq = fp[g["link"]], fq[g["link"]]
            return (bp + rot.quat_rotate(bq, jnp.asarray(g["off_pos"])),
                    rot.quat_mul(bq, jnp.asarray(g["off_quat"])))

        ca, _qa = geom_frame(rta, a)
        gp, gq = geom_frame(rtb, b)
        frame = self._frames_for_group(int(b["kind"]), ca,
                                       float(a["radius_bound"]),
                                       gp[None], gq[None], b["size"][None])
        dist = frame.dist[0]
        n = frame.normal[0]          # away from b's surface, toward a
        point = frame.point[0]

        Ja = D.point_jacobians(rta["slot"].model, rta["frames"],
                               rta["base_pos"], np.asarray([a["link"]]),
                               point[None])[0]                       # (3,nva)
        Jb = D.point_jacobians(rtb["slot"].model, rtb["frames"],
                               rtb["base_pos"], np.asarray([b["link"]]),
                               point[None])[0]                       # (3,nvb)
        same = a["art"] == b["art"]
        if same:
            Jrel = Ja - Jb
            Za = L.chol_solve(rta["chol"], Jrel.T)                   # (nv,3)
            K = Jrel @ Za
            v_rel = Jrel @ rta["u"]
        else:
            Za = L.chol_solve(rta["chol"], Ja.T)
            Zb = L.chol_solve(rtb["chol"], Jb.T)
            K = Ja @ Za + Jb @ Zb
            v_rel = Ja @ rta["u"] - Jb @ rtb["u"]

        vn = jnp.sum(v_rel * n)
        active = (dist < 0.0) & (vn < 0.1)
        bias = jnp.minimum(0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                           self.max_depenetration)
        e, mu = C.combine_material(a["e"], b["e"], a["mu"], b["mu"])
        e_eff = jnp.where(jnp.abs(vn) > self.bounce_threshold, e, 0.0)
        w_n = n @ K @ n
        Pn = jnp.where(active,
                       (-(1.0 + e_eff) * jnp.minimum(vn, 0.0) + bias)
                       / jnp.maximum(w_n, 1e-9), 0.0)
        vt = v_rel - vn * n
        vt_norm = jnp.linalg.norm(vt)
        t_hat = vt / jnp.maximum(vt_norm, 1e-9)
        w_t = t_hat @ K @ t_hat
        Pt = jnp.where(active,
                       jnp.minimum(mu * Pn, vt_norm / jnp.maximum(w_t, 1e-9)),
                       0.0)
        P = Pn * n - Pt * t_hat
        if same:
            rta["u"] = rta["u"] + Za @ P
        else:
            rta["u"] = rta["u"] + Za @ P
            rtb["u"] = rtb["u"] - Zb @ P
        ncf = ncf.at[a["body"]].add(P / self.dt)
        ncf = ncf.at[b["body"]].add(-P / self.dt)

        def borg_of(rt, g):
            fp, fq = rt["frames"]
            if g["link"] < 0:
                bp_, bq_ = rt["base_pos"], rt["base_quat"]
            else:
                bp_, bq_ = fp[g["link"]], fq[g["link"]]
            return bp_ + rot.quat_rotate(bq_, jnp.asarray(g["body_off"]))
        nct = nct.at[a["body"]].add(
            jnp.cross(point - borg_of(rta, a), P) / self.dt)
        nct = nct.at[b["body"]].add(
            jnp.cross(point - borg_of(rtb, b), -P) / self.dt)
        return ncf, nct

    def _art_vs_ground_group(self, rt, grp: _GeomGroup, dt_s):
        """Articulation geoms (bounding spheres) vs ground plane; Baumgarte-
        stabilized impulses into the generalized velocity (feet contact)."""
        model = rt["slot"].model
        fp, fq = rt["frames"]
        nd = model.tree.n_dof
        pos_ext = jnp.concatenate([fp, rt["base_pos"][None]], axis=0)
        quat_ext = jnp.concatenate([fq, rt["base_quat"][None]], axis=0)
        ref = jnp.asarray(np.where(grp.link < 0, nd, grp.link))
        bp, bq = pos_ext[ref], quat_ext[ref]
        centers = bp + rot.quat_rotate(bq, jnp.asarray(grp.offset_pos))
        radius = jnp.asarray(grp.radius_bound)
        if self.scene.spec.terrain is not None:
            terr = self.scene.spec.terrain
            h = terr.sample(centers[:, :2])
            n = terr.normal(centers[:, :2])
            dist = (centers[:, 2] - h) * n[:, 2] - radius
        else:
            dist = centers[:, 2] - radius
            n = jnp.zeros_like(centers).at[:, 2].set(1.0)
        points = centers - n * radius[:, None]

        J = D.point_jacobians(model, rt["frames"], rt["base_pos"], grp.link, points)
        nv = J.shape[-1]
        k = J.shape[0]
        MinvJT = L.chol_solve(rt["chol"], J.reshape(k * 3, nv).T).T.reshape(k, 3, nv)
        # bias capped at max_depenetration_velocity (PhysX sim param): deep
        # ragdoll penetration must not translate into unbounded push velocity
        bias = jnp.minimum(0.2 / dt_s * jnp.maximum(-dist - 0.005, 0.0),
                           self.max_depenetration)
        plane = self.scene.spec.plane
        e, mu = C.combine_material(0.0, plane.restitution, 0.8, plane.dynamic_friction)
        w_n = jnp.einsum("ka,kav,kbv,kb->k", n, J, MinvJT, n)
        # sequential (Gauss-Seidel) per-geom resolution — see
        # _art_vs_static_group; simultaneous impulses double-count when
        # several links touch down in the same substep
        u = rt["u"]
        u0 = u
        for i in range(k):
            v_point = J[i] @ u
            vn_i = jnp.sum(v_point * n[i])
            active = (dist[i] < 0.0) & (vn_i < 0.1)
            Pn = jnp.where(active,
                           (-(1.0 + e) * jnp.minimum(vn_i, 0.0) + bias[i])
                           / jnp.maximum(w_n[i], 1e-9), 0.0)
            vt = v_point - vn_i * n[i]
            vt_norm = jnp.linalg.norm(vt)
            t_hat = vt / jnp.maximum(vt_norm, 1e-9)
            w_t = jnp.einsum("a,av,bv,b->", t_hat, J[i], MinvJT[i], t_hat)
            Pt = jnp.where(active,
                           jnp.minimum(mu * Pn,
                                       vt_norm / jnp.maximum(w_t, 1e-9)), 0.0)
            s_i = _resting_smooth(dist[i], vn_i, self.bounce_threshold)
            P = (Pn * n[i] - Pt * t_hat) * s_i
            u = u + jnp.einsum("av,a->v", MinvJT[i], P)
        return u - u0

    # ------------------------------------------------------------------
    # state reporting (tensor-API parity, N2)
    # ------------------------------------------------------------------

    def make_body_state_fn(self, body_ids):
        """Compile a vmapped ``state -> (B, len(body_ids), 13)`` computing only
        the requested env-level body indices (tasks touch ~10 of 42 bodies;
        computing just those saves most of the FK reporting cost)."""
        scene = self.scene
        body_ids = np.asarray(body_ids)
        art_by_actor = {s.actor_index: s for s in scene.articulations}
        pieces = []
        cursor = 0
        for ai, actor in enumerate(scene.spec.actors):
            nb = actor.tree.n_bodies
            sel = np.nonzero((body_ids >= cursor) & (body_ids < cursor + nb))[0]
            if len(sel):
                pieces.append((ai, art_by_actor.get(ai), body_ids[sel] - cursor, sel))
            cursor += nb
        order = np.concatenate([p[3] for p in pieces])
        inv_perm = np.argsort(order)
        identity_order = bool(np.all(inv_perm == np.arange(len(inv_perm))))

        def single(state: SimState) -> jnp.ndarray:
            parts = []
            for ai, slot, local_ids, _ in pieces:
                ra = state.root[ai]
                if slot is not None:
                    q = state.dof_pos[slot.dof_start:slot.dof_end]
                    qd = state.dof_vel[slot.dof_start:slot.dof_end]
                    kw = (dict(base_linvel=ra[7:10], base_angvel=ra[10:13])
                          if slot.model.floating else {})
                    parts.append(fk_body_states(slot.model.tree, ra[0:3], ra[3:7],
                                                q, qd, body_ids=local_ids, **kw))
                else:
                    parts.append(jnp.broadcast_to(ra, (len(local_ids), 13)))
            out = jnp.concatenate(parts, axis=0)
            if not identity_order:
                out = out[jnp.asarray(inv_perm)]
            return out

        return jax.vmap(single)

    def _rigid_body_states_single(self, state: SimState) -> jnp.ndarray:
        """(num_bodies, 13) rigid-body state tensor in reference layout."""
        scene = self.scene
        art_by_actor = {s.actor_index: s for s in scene.articulations}
        parts = []
        for ai, actor in enumerate(scene.spec.actors):
            nb = actor.tree.n_bodies
            ra = state.root[ai]
            slot = art_by_actor.get(ai)
            if slot is not None:
                q = state.dof_pos[slot.dof_start:slot.dof_end]
                qd = state.dof_vel[slot.dof_start:slot.dof_end]
                if slot.model.floating:
                    states = fk_body_states(actor.tree, ra[0:3], ra[3:7], q, qd,
                                            base_linvel=ra[7:10], base_angvel=ra[10:13])
                else:
                    states = fk_body_states(actor.tree, ra[0:3], ra[3:7], q, qd)
                parts.append(states)
            else:
                parts.append(jnp.broadcast_to(ra, (nb, 13)))
        return jnp.concatenate(parts, axis=0)
