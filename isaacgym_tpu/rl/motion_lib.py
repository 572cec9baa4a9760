"""Motion library + skeleton tree (SURVEY.md §2 N13).

Capability equivalents of ``isaacgymenvs.tasks.interos.motion_lib.MotionLib``
and ``poselib...SkeletonTree`` as imported by the reference tasks
(/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:42-43;
all call sites are commented out there, but the surface —
``sample_motions`` / ``sample_time`` / ``get_motion_state`` /
``SkeletonTree.from_mjcf`` — is part of the capability inventory).

Motion clips are ``.npz`` files with arrays (all float32):
  fps ()            — frames per second
  root_pos (T,3), root_rot (T,4 xyzw)
  dof_pos (T,D), dof_vel (T,D)
  body_pos (T,J,3), body_rot (T,J,4)            [optional]
  body_vel (T,J,3), body_ang_vel (T,J,3)        [optional]
``get_motion_state`` linearly interpolates (slerp for rotations) at arbitrary
times, vectorized over query batches — pure jnp, jit/vmap-safe.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.utils import rotations as rot


class SkeletonTree:
    """Node-name/parent/offset view of an articulated asset (poselib parity)."""

    def __init__(self, node_names, parent_indices, local_translations):
        self.node_names = list(node_names)
        self.parent_indices = np.asarray(parent_indices)
        self.local_translation = np.asarray(local_translations)

    @staticmethod
    def from_urdf(path: str) -> "SkeletonTree":
        from isaacgym_tpu.models.kinematics import load_asset
        tree = load_asset(path)
        return SkeletonTree(tree.body_names, tree.parent, tree.joint_pos)

    # the reference calls from_mjcf on URDF files too (the G1 asset lives in
    # an 'mjcf' directory); accept either format by extension
    @staticmethod
    def from_mjcf(path: str) -> "SkeletonTree":
        return SkeletonTree.from_urdf(path)

    @property
    def num_nodes(self) -> int:
        return len(self.node_names)


class MotionLib:
    """Batched reference-motion sampler."""

    def __init__(self, motion_file: str, num_dofs: int, device=None,
                 key_body_ids=None, dof_body_ids=None, dof_offsets=None,
                 is_train: bool = True):
        if os.path.isdir(motion_file):
            files = sorted(glob.glob(os.path.join(motion_file, "*.npz")))
        else:
            files = [motion_file]
        if not files:
            raise FileNotFoundError(f"no motion clips under {motion_file}")
        self.num_dofs = num_dofs
        self._clips = [dict(np.load(f)) for f in files]
        for c in self._clips:
            T = c["dof_pos"].shape[0]
            assert c["dof_pos"].shape[1] == num_dofs, "dof count mismatch"
        self._fps = np.asarray([float(c["fps"]) for c in self._clips])
        self._lengths_frames = np.asarray([c["dof_pos"].shape[0] for c in self._clips])
        self._motion_lengths = (self._lengths_frames - 1) / self._fps

        # pad clips to a common length so state lookup is one gather
        Tm = int(self._lengths_frames.max())

        def pad(key, dim, fill=0.0):
            out = []
            for c in self._clips:
                a = c.get(key)
                if a is None:
                    a = np.full((c["dof_pos"].shape[0],) + dim, fill, np.float32)
                    if key.endswith("rot"):   # identity quats, not zeros
                        a[..., :] = [0.0, 0.0, 0.0, 1.0]
                pad_n = Tm - a.shape[0]
                out.append(np.concatenate([a, np.repeat(a[-1:], pad_n, 0)]) if pad_n else a)
            return jnp.asarray(np.stack(out))

        self.root_pos = pad("root_pos", (3,))
        self.root_rot = pad("root_rot", (4,))
        self.dof_pos = pad("dof_pos", (num_dofs,))
        self.dof_vel = pad("dof_vel", (num_dofs,))
        # per-body kinematics (key-body obs for imitation/AMP; reference
        # MotionLib.get_motion_state key_pos surface, dead call sites at
        # …no_earlystop.py:883-975)
        jb = next((c["body_pos"].shape[1] for c in self._clips if "body_pos" in c),
                  None)
        self.num_bodies = jb
        if jb is not None:
            self.body_pos = pad("body_pos", (jb, 3))
            self.body_rot = pad("body_rot", (jb, 4))
        else:
            self.body_pos = self.body_rot = None
        self._key_body_ids = (np.asarray(key_body_ids)
                              if key_body_ids is not None else None)
        self.num_motions = len(self._clips)

    @property
    def motion_lengths(self):
        return jnp.asarray(self._motion_lengths)

    # API parity: _motion_lengths indexable like the reference
    @property
    def _motion_lengths_attr(self):
        return self._motion_lengths

    def sample_motions(self, key, n: int):
        return jax.random.randint(key, (n,), 0, self.num_motions)

    def sample_time(self, key, motion_ids):
        lens = self.motion_lengths[motion_ids]
        return jax.random.uniform(key, motion_ids.shape) * lens

    def get_motion_state(self, motion_ids, motion_times) -> Dict[str, jnp.ndarray]:
        """Interpolated state at (ids (N,), times (N,)) — lerp/slerp."""
        fps = jnp.asarray(self._fps)[motion_ids]
        lens = self.motion_lengths[motion_ids]
        t = jnp.clip(motion_times, 0.0, lens)
        f = t * fps
        f0 = jnp.floor(f).astype(jnp.int32)
        max_f = jnp.asarray(self._lengths_frames)[motion_ids] - 1
        f0 = jnp.clip(f0, 0, max_f - 1)
        f1 = jnp.clip(f0 + 1, 0, max_f)
        w = jnp.clip(f - f0, 0.0, 1.0)[:, None]

        def lerp(tab):
            a = tab[motion_ids, f0]
            b = tab[motion_ids, f1]
            return a + (b - a) * w

        root_pos = lerp(self.root_pos)
        dof_pos = lerp(self.dof_pos)
        dof_vel = lerp(self.dof_vel)
        q0 = self.root_rot[motion_ids, f0]
        q1 = self.root_rot[motion_ids, f1]
        root_rot = rot.slerp(q0, q1, w)
        out = {
            "root_pos": root_pos, "root_rot": root_rot,
            "dof_pos": dof_pos, "dof_vel": dof_vel,
        }
        if self.body_pos is not None:
            a = self.body_pos[motion_ids, f0]
            b = self.body_pos[motion_ids, f1]
            body_pos = a + (b - a) * w[:, :, None]
            J = a.shape[1]
            qb0 = self.body_rot[motion_ids, f0].reshape(-1, 4)
            qb1 = self.body_rot[motion_ids, f1].reshape(-1, 4)
            wb = jnp.repeat(w, J, axis=0)
            body_rot = rot.slerp(qb0, qb1, wb).reshape(-1, J, 4)
            out["body_pos"] = body_pos
            out["body_rot"] = body_rot
            if self._key_body_ids is not None:
                out["key_body_pos"] = body_pos[:, jnp.asarray(self._key_body_ids)]
        return out


def save_motion_clip(path: str, fps: float, root_pos, root_rot, dof_pos, dof_vel,
                     **extra) -> str:
    """Write a clip in the MotionLib format (tooling for dataset authors)."""
    np.savez_compressed(path, fps=np.float32(fps),
                        root_pos=np.asarray(root_pos, np.float32),
                        root_rot=np.asarray(root_rot, np.float32),
                        dof_pos=np.asarray(dof_pos, np.float32),
                        dof_vel=np.asarray(dof_vel, np.float32), **extra)
    return path
