"""Terrain: heightfield -> trimesh conversion + heightfield collision/obs
(SURVEY.md §2 N5).

The reference builds triangle-mesh terrain from a heightmap npy via
``isaacgym.terrain_utils.convert_heightfield_to_trimesh`` and adds it with
``add_triangle_mesh`` (/root/reference/tasks/
humanoid_pingpong_3_actor_tilt_no_earlystop.py:359-377); observation code
samples the heightmap on a heading-local grid (:1905-1937). TPU-native
design: the heightfield IS the collision representation — contacts sample a
bilinear height + finite-difference normal (no mesh broadphase needed), and
the trimesh conversion is kept for export/visualization parity.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from isaacgym_tpu.utils import rotations as rot


def convert_heightfield_to_trimesh(height_field_raw: np.ndarray,
                                   horizontal_scale: float,
                                   vertical_scale: float,
                                   slope_threshold: float = None
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Heightfield grid -> (vertices (N,3) float32, triangles (M,3) uint32).

    Port of the capability of ``isaacgym.terrain_utils.convert_heightfield_to_trimesh``
    including the slope-threshold vertex correction that turns steep slopes
    into near-vertical walls.
    """
    hf = np.asarray(height_field_raw, dtype=np.float64)
    num_rows, num_cols = hf.shape
    y = np.linspace(0, (num_cols - 1) * horizontal_scale, num_cols)
    x = np.linspace(0, (num_rows - 1) * horizontal_scale, num_rows)
    yy, xx = np.meshgrid(y, x)

    if slope_threshold is not None:
        slope_threshold_scaled = slope_threshold * horizontal_scale / vertical_scale
        move_x = np.zeros((num_rows, num_cols))
        move_y = np.zeros((num_rows, num_cols))
        move_corners = np.zeros((num_rows, num_cols))
        move_x[: num_rows - 1, :] += hf[1:, :] - hf[: num_rows - 1, :] > slope_threshold_scaled
        move_x[1:, :] -= hf[: num_rows - 1, :] - hf[1:, :] > slope_threshold_scaled
        move_y[:, : num_cols - 1] += hf[:, 1:] - hf[:, : num_cols - 1] > slope_threshold_scaled
        move_y[:, 1:] -= hf[:, : num_cols - 1] - hf[:, 1:] > slope_threshold_scaled
        move_corners[: num_rows - 1, : num_cols - 1] += (
            hf[1:, 1:] - hf[: num_rows - 1, : num_cols - 1] > slope_threshold_scaled)
        move_corners[1:, 1:] -= (
            hf[: num_rows - 1, : num_cols - 1] - hf[1:, 1:] > slope_threshold_scaled)
        xx += (move_x + move_corners * (move_x == 0)) * horizontal_scale
        yy += (move_y + move_corners * (move_y == 0)) * horizontal_scale

    vertices = np.zeros((num_rows * num_cols, 3), dtype=np.float32)
    vertices[:, 0] = xx.flatten()
    vertices[:, 1] = yy.flatten()
    vertices[:, 2] = hf.flatten() * vertical_scale

    triangles = np.zeros((2 * (num_rows - 1) * (num_cols - 1), 3), dtype=np.uint32)
    for i in range(num_rows - 1):
        ind0 = np.arange(0, num_cols - 1) + i * num_cols
        ind1 = ind0 + 1
        ind2 = ind0 + num_cols
        ind3 = ind2 + 1
        start = 2 * i * (num_cols - 1)
        stop = start + 2 * (num_cols - 1)
        triangles[start:stop:2, 0] = ind0
        triangles[start:stop:2, 1] = ind3
        triangles[start:stop:2, 2] = ind1
        triangles[start + 1:stop:2, 0] = ind0
        triangles[start + 1:stop:2, 1] = ind2
        triangles[start + 1:stop:2, 2] = ind3
    return vertices, triangles


class Heightfield(NamedTuple):
    """Static heightfield for contact + observation sampling.

    heights: (R, C) float32 world-z values;
    origin: (2,) world x,y of grid cell (0,0);
    scale: horizontal cell size in meters.
    """
    heights: np.ndarray
    origin: np.ndarray
    scale: float

    @staticmethod
    def from_raw(raw: np.ndarray, horizontal_scale: float, vertical_scale: float,
                 transform_x: float = 0.0, transform_y: float = 0.0) -> "Heightfield":
        """From a reference-format npy heightmap (transposed load + transform
        offsets, reference _create_trimesh :359-377)."""
        return Heightfield(
            heights=(np.asarray(raw, np.float32) * vertical_scale),
            origin=np.asarray([transform_x, transform_y], np.float32),
            scale=float(horizontal_scale),
        )

    def sample(self, xy):
        """Bilinear height at world (…, 2) positions (pure jnp)."""
        H = jnp.asarray(self.heights)
        R, Ccols = self.heights.shape
        g = (xy - jnp.asarray(self.origin)) / self.scale
        gx = jnp.clip(g[..., 0], 0.0, R - 1.001)
        gy = jnp.clip(g[..., 1], 0.0, Ccols - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx, fy = gx - x0, gy - y0
        h00 = H[x0, y0]
        h10 = H[x0 + 1, y0]
        h01 = H[x0, y0 + 1]
        h11 = H[x0 + 1, y0 + 1]
        return (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                + h01 * (1 - fx) * fy + h11 * fx * fy)

    def normal(self, xy, eps: float = None):
        """Finite-difference surface normal at world (…, 2) positions."""
        e = eps or self.scale
        ex = jnp.asarray([e, 0.0])
        ey = jnp.asarray([0.0, e])
        dzdx = (self.sample(xy + ex) - self.sample(xy - ex)) / (2 * e)
        dzdy = (self.sample(xy + ey) - self.sample(xy - ey)) / (2 * e)
        n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def compute_heightmap_observations(body_states, body_ids, meshgrid, field: Heightfield,
                                   height_offset: float = 0.9):
    """Heading-local terrain height grid around the root (single env;
    reference compute_heightmap_observations :1905-1937)."""
    if body_ids is not None:
        body_states = body_states[body_ids]
    root_pos = body_states[0, 0:3]
    root_rot = body_states[0, 3:7]
    heading = rot.calc_heading_quat(root_rot)
    pts = rot.quat_rotate(heading, meshgrid) + root_pos
    heights = field.sample(pts[..., :2])
    return heights - root_pos[2] + height_offset


def make_meshgrid(x_range: float = 0.6, y_range: float = 0.6,
                  x_split: int = 15, y_split: int = 15) -> jnp.ndarray:
    """The (x_split*y_split, 3) sample grid (reference _get_meshgrid :379-390)."""
    xs = np.linspace(-x_range, x_range, x_split)
    ys = np.linspace(-y_range, y_range, y_split)
    x, y = np.meshgrid(xs, ys, indexing="xy")
    return jnp.asarray(np.stack([x.flatten(), y.flatten(), np.zeros_like(x.flatten())], axis=1),
                       dtype=jnp.float32)
