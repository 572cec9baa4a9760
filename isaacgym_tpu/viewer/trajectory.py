"""Trajectory recorder — headless replacement for the native viewer (N6).

The reference renders interactively (``create_viewer``/``draw_viewer``,
/root/reference/tasks/joint_monkey2_new.py:221-224,696-701). On a headless
TPU pod the equivalent capability is recording exact rigid-body trajectories
to ``.npz`` for offline rendering/inspection, plus debug-line primitives
(``add_lines``/``WireframeSphereGeometry`` parity as exportable marker
streams).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp


class TrajectoryRecorder:
    """Records per-step body states (and optional markers) for env 0..k-1."""

    def __init__(self, body_names, max_envs: int = 1, scene=None):
        self.body_names = list(body_names)
        self.max_envs = max_envs
        self.frames: List[np.ndarray] = []
        self.markers: List[np.ndarray] = []
        self.extras: Dict[str, List[np.ndarray]] = {}
        # geom table for the offline renderer (viewer.render)
        self.geoms: Optional[np.ndarray] = None
        if scene is not None:
            from isaacgym_tpu.viewer.render import scene_geom_table
            self.geoms = scene_geom_table(scene)

    def record(self, rb_states, markers: Optional[np.ndarray] = None, **extras) -> None:
        """rb_states: (B, num_bodies, 13) device or host array."""
        self.frames.append(np.asarray(rb_states[: self.max_envs]))
        if markers is not None:
            self.markers.append(np.asarray(markers))
        for k, v in extras.items():
            self.extras.setdefault(k, []).append(np.asarray(v[: self.max_envs]))

    def stacked(self) -> np.ndarray:
        return np.stack(self.frames)  # (T, k, nb, 13)

    def save(self, path: str) -> str:
        data = {
            "body_states": self.stacked(),
            "body_names": np.asarray(self.body_names),
        }
        if self.geoms is not None:
            data["geoms"] = self.geoms
        if self.markers:
            data["markers"] = np.stack(self.markers)
        for k, v in self.extras.items():
            data[f"extra_{k}"] = np.stack(v)
        np.savez_compressed(path, **data)
        return path


def record_env_rollout(env, policy=None, steps: int = 120, envs: int = 1,
                       out_path: Optional[str] = None):
    """Roll an env with a policy (default: zero actions) and record bodies."""
    import jax

    state, obs = env.reset()
    rec = TrajectoryRecorder(env.scene.body_names, max_envs=envs,
                             scene=env.scene)
    B = env.num_envs
    rng = jax.random.PRNGKey(0)
    for _ in range(steps):
        if policy is None:
            actions = jnp.zeros((B, env.num_actions))
        else:
            actions = policy(obs)
        rb = env.sim.rigid_body_states(state.sim)
        rec.record(rb, ball=state.sim.root[:, env.ball_actor, :])
        state, obs, rew, done, info = env.step(state, actions)
    if out_path:
        rec.save(out_path)
    return rec
