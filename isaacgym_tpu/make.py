"""Environment factory — capability equivalent of ``isaacgymenvs.make``
(reference /root/reference/__init__.py:14-55).

Composes the task config from the packaged config tree, applies overrides,
and instantiates the vectorized environment for the named task.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional


def make(
    seed: int,
    task: str,
    num_envs: Optional[int] = None,
    sim_device: str = "tpu",
    headless: bool = True,
    cfg: Optional[Mapping[str, Any]] = None,
    **overrides,
):
    """Create a vectorized pingpong environment by registered task name."""
    from isaacgym_tpu.utils.config import load_task_config
    from isaacgym_tpu.tasks import task_registry

    if task not in task_registry():
        raise KeyError(f"unknown task {task!r}; known: {sorted(task_registry())}")
    task_cfg = dict(cfg) if cfg is not None else load_task_config(task)
    if num_envs is not None:
        task_cfg["env"]["numEnvs"] = int(num_envs)
    for key, val in overrides.items():
        task_cfg["env"][key] = val
    task_cls = task_registry()[task]
    return task_cls(task_cfg, seed=seed)
