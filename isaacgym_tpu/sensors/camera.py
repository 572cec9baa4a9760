"""Batched raycast camera sensor — the ``enableCameraSensors`` capability.

The reference task yamls all carry ``enableCameraSensors: false``
(cfg/task/HumanoidPingpongG1.yaml and siblings); the IsaacGym product
behind them exposes per-env cameras (``create_camera_sensor`` /
``get_camera_image``). TPU-native equivalent: a pinhole camera raytraced
against the scene's ANALYTIC collision geoms (sphere/box/cylinder/ground
plane) as one fused jnp computation — no rasterizer, no host round trip,
batched over envs with ``vmap`` and jittable alongside the env step.

Returns depth (meters along the ray), RGB (lambertian shading with a
per-actor palette) and per-pixel segmentation (actor index, -1 = sky/miss),
matching the reference's IMAGE_DEPTH / IMAGE_COLOR / IMAGE_SEGMENTATION
camera-image types.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.utils import rotations as rot

_BIG = 1e9


class _GeomTable(NamedTuple):
    """Static per-geom arrays; world poses come from body states at render."""
    kind: np.ndarray        # (G,) GEOM_*
    body: np.ndarray        # (G,) env-level body index carrying the geom
    local_pos: np.ndarray   # (G, 3)
    local_quat: np.ndarray  # (G, 4)
    size: np.ndarray        # (G, 3)
    actor: np.ndarray       # (G,) owning actor index (segmentation id)


def _build_geom_table(scene) -> _GeomTable:
    kinds, bodies, lpos, lquat, sizes, actors = [], [], [], [], [], []
    for g in scene.static_geoms:
        kinds.append(g.kind); bodies.append(g.body_start)
        lpos.append(g.local_pos); lquat.append(g.local_quat)
        sizes.append(g.size); actors.append(g.actor_index)
    for g in scene.art_geoms:
        slot = scene.articulations[g.art_index]
        kinds.append(g.kind); bodies.append(slot.body_start + g.body_index)
        lpos.append(g.local_pos); lquat.append(g.local_quat)
        sizes.append(g.size); actors.append(slot.actor_index)
    for fb in scene.free_bodies:
        kinds.append(U.GEOM_SPHERE); bodies.append(fb.body_start)
        lpos.append(np.zeros(3)); lquat.append(np.asarray([0, 0, 0, 1.0]))
        sizes.append(np.asarray([fb.radius, 0.0, 0.0])); actors.append(fb.actor_index)
    return _GeomTable(
        kind=np.asarray(kinds), body=np.asarray(bodies),
        local_pos=np.stack(lpos).astype(np.float32),
        local_quat=np.stack(lquat).astype(np.float32),
        size=np.stack(sizes).astype(np.float32),
        actor=np.asarray(actors))


def _ray_sphere(o, d, center, radius):
    """(P,3) rays vs one sphere -> (t (P,), world normal (P,3))."""
    oc = o - center
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where((disc >= 0.0) & (t > 1e-4), t, _BIG)
    n = (oc + t[:, None] * d) / radius
    return t, n


def _ray_box(o, d, pos, quat, half):
    """Slab test in the box frame -> (t, world face normal)."""
    qi = rot.quat_conjugate(quat)
    ol = rot.quat_rotate(qi, o - pos)
    dl = rot.quat_rotate(qi, d)
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-9, jnp.where(dl >= 0, 1e-9, -1e-9), dl)
    t1 = (-half - ol) * inv
    t2 = (half - ol) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin > 1e-4)
    t = jnp.where(hit, tmin, _BIG)
    h_local = ol + tmin[:, None] * dl
    rel = jnp.abs(h_local) / jnp.asarray(half)[None]
    face = jnp.argmax(rel, axis=-1)
    n_local = (jax.nn.one_hot(face, 3) * jnp.sign(h_local))
    return t, rot.quat_rotate(quat, n_local)


def _ray_cylinder(o, d, pos, quat, radius, half_len):
    """Quadratic on the lateral wall + the two caps, in the local frame."""
    qi = rot.quat_conjugate(quat)
    ol = rot.quat_rotate(qi, o - pos)
    dl = rot.quat_rotate(qi, d)
    a = dl[..., 0] ** 2 + dl[..., 1] ** 2
    b = ol[..., 0] * dl[..., 0] + ol[..., 1] * dl[..., 1]
    c = ol[..., 0] ** 2 + ol[..., 1] ** 2 - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) / jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    z_side = ol[..., 2] + t_side * dl[..., 2]
    side_ok = (disc >= 0.0) & (t_side > 1e-4) & (jnp.abs(z_side) <= half_len)
    t_side = jnp.where(side_ok, t_side, _BIG)
    # caps at z = +/- half_len
    dz = jnp.where(jnp.abs(dl[..., 2]) < 1e-9,
                   jnp.where(dl[..., 2] >= 0, 1e-9, -1e-9), dl[..., 2])
    t_caps = []
    for zc in (half_len, -half_len):
        t = (zc - ol[..., 2]) / dz
        x = ol[..., 0] + t * dl[..., 0]
        y = ol[..., 1] + t * dl[..., 1]
        ok = (t > 1e-4) & (x * x + y * y <= radius * radius)
        t_caps.append(jnp.where(ok, t, _BIG))
    t_cap = jnp.minimum(*t_caps)
    t = jnp.minimum(t_side, t_cap)
    h = ol + t[:, None] * dl
    n_side = jnp.stack([h[:, 0] / radius, h[:, 1] / radius,
                        jnp.zeros_like(h[:, 0])], axis=-1)
    n_cap = jnp.stack([jnp.zeros_like(h[:, 0]), jnp.zeros_like(h[:, 0]),
                       jnp.sign(h[:, 2])], axis=-1)
    n_local = jnp.where((t_side <= t_cap)[:, None], n_side, n_cap)
    return t, rot.quat_rotate(quat, n_local)


def _look_at_rays(pos, target, up, fov_deg, width, height):
    """Static (H*W, 3) unit ray directions + camera origin."""
    pos = np.asarray(pos, np.float64)
    fwd = np.asarray(target, np.float64) - pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    dn = np.cross(right, fwd)  # image down = -true up
    half_w = np.tan(np.radians(fov_deg) / 2.0)
    half_h = half_w * height / width
    xs = np.linspace(-half_w, half_w, width)
    ys = np.linspace(-half_h, half_h, height)
    px, py = np.meshgrid(xs, ys)  # (H, W)
    dirs = (fwd[None, None] + px[..., None] * right[None, None]
            - py[..., None] * dn[None, None])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return pos.astype(np.float32), dirs.reshape(-1, 3).astype(np.float32)


# deterministic per-actor palette (sky handled separately)
_PALETTE = np.asarray([
    [0.80, 0.45, 0.25], [0.30, 0.55, 0.85], [0.20, 0.65, 0.35],
    [0.90, 0.80, 0.25], [0.70, 0.35, 0.70], [0.45, 0.75, 0.75],
], np.float32)
_SKY = np.asarray([0.55, 0.70, 0.90], np.float32)
_GROUND = np.asarray([0.42, 0.42, 0.40], np.float32)
_LIGHT = np.asarray([0.35, 0.25, 0.90], np.float32) / np.linalg.norm([0.35, 0.25, 0.90])


class Camera:
    """Fixed pinhole camera over a compiled scene.

    ``render(sim, state)`` -> dict(depth (B,H,W), rgb (B,H,W,3) in [0,1],
    seg (B,H,W) int32 actor index, -2 = ground plane, -1 = sky).
    """

    def __init__(self, scene, pos=(4.2, -2.6, 2.2), target=(1.4, 0.0, 0.9),
                 up=(0.0, 0.0, 1.0), fov_deg=70.0, width=96, height=72):
        self.scene = scene
        self.width, self.height = int(width), int(height)
        self.table = _build_geom_table(scene)
        self.origin, self.rays = _look_at_rays(pos, target, up, fov_deg,
                                               self.width, self.height)
        self.has_plane = scene.spec.plane is not None
        self._render_batched = jax.jit(jax.vmap(self._render_single))

    # ------------------------------------------------------------------

    def _render_single(self, rb_states):
        T = self.table
        o = jnp.asarray(self.origin)
        d = jnp.asarray(self.rays)                      # (P, 3)
        P = d.shape[0]
        ts, ns = [], []

        for gi in range(len(T.kind)):
            body = rb_states[int(T.body[gi])]
            gpos = body[0:3] + rot.quat_rotate(body[3:7], jnp.asarray(T.local_pos[gi]))
            gquat = rot.quat_mul(body[3:7], jnp.asarray(T.local_quat[gi]))
            kind = int(T.kind[gi])
            size = T.size[gi]
            if kind == U.GEOM_SPHERE:
                t, n = _ray_sphere(o, d, gpos, float(size[0]))
            elif kind == U.GEOM_BOX:
                t, n = _ray_box(o, d, gpos, gquat, jnp.asarray(size))
            else:
                t, n = _ray_cylinder(o, d, gpos, gquat, float(size[0]), float(size[1]))
            ts.append(t); ns.append(n)
        if self.has_plane:
            dz = jnp.where(jnp.abs(d[:, 2]) < 1e-9, -1e-9, d[:, 2])
            t_pl = -o[2] / dz
            ts.append(jnp.where(t_pl > 1e-4, t_pl, _BIG))
            ns.append(jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), d.shape))

        tmat = jnp.stack(ts, axis=0)                    # (G[+1], P)
        best = jnp.argmin(tmat, axis=0)
        depth = jnp.min(tmat, axis=0)
        hit = depth < _BIG * 0.5
        nrm = jnp.take_along_axis(jnp.stack(ns, axis=0),
                                  best[None, :, None], axis=0)[0]  # (P, 3)

        seg_ids = list(T.actor) + ([-2] if self.has_plane else [])
        seg = jnp.where(hit, jnp.asarray(np.asarray(seg_ids))[best], -1)

        # lambert shading from the analytic surface normals
        colors = np.concatenate(
            [_PALETTE[T.actor % len(_PALETTE)],
             _GROUND[None]] if self.has_plane else
            [_PALETTE[T.actor % len(_PALETTE)]], axis=0)  # (G[+1], 3)
        base = jnp.asarray(colors)[best]                 # (P, 3)
        diff = jnp.clip(jnp.sum(nrm * jnp.asarray(_LIGHT), axis=-1), 0.0, 1.0)
        shade = 0.35 + 0.65 * diff
        rgb = jnp.where(hit[:, None], base * shade[:, None], jnp.asarray(_SKY))

        H, W = self.height, self.width
        return dict(depth=jnp.where(hit, depth, jnp.inf).reshape(H, W),
                    rgb=rgb.reshape(H, W, 3),
                    seg=seg.astype(jnp.int32).reshape(H, W))

    def render(self, sim, state):
        """Render every env: sim is the Simulator (FK provider), state the
        batched SimState. One jitted call; the FK body states are shared
        with the tensor API (`acquire_rigid_body_state_tensor`)."""
        rb = sim.rigid_body_states(state)
        return self._render_batched(rb)
