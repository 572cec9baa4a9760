"""Observers / telemetry (SURVEY.md §2 N11, §5.5).

Capability equivalents of the rl_games observer stack the reference wires in
/root/reference/train.py:80,88-92,172-183: episode-stat aggregation
(``RLGPUAlgoObserver``), multi-observer fan-out, W&B logging gated to rank 0
(``WandbAlgoObserver``), and the PBT observer hook. Observers consume plain
metric dicts emitted once per train epoch.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Any, Dict, List

import numpy as np


class AlgoObserver:
    """Base observer interface (after_init / process_infos / after_print_stats)."""

    def after_init(self, run_dir: str, cfg: Dict[str, Any]) -> None:
        pass

    def process_infos(self, infos: Dict[str, Any]) -> None:
        """Called with per-step env infos (numpy arrays)."""

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        pass

    def close(self) -> None:
        pass


class EpisodeStatsObserver(AlgoObserver):
    """Aggregates completed-episode returns/lengths (RLGPUAlgoObserver parity):
    keeps a sliding window like rl_games' ``games_to_track``."""

    def __init__(self, games_to_track: int = 100):
        self.returns = deque(maxlen=games_to_track)
        self.lengths = deque(maxlen=games_to_track)

    def process_infos(self, infos: Dict[str, Any]) -> None:
        done = np.asarray(infos.get("episode_done", ()))
        if done.size and done.any():
            self.returns.extend(np.asarray(infos["episode_return"])[done].tolist())
            self.lengths.extend(np.asarray(infos["episode_length"])[done].tolist())

    def stats(self) -> Dict[str, float]:
        if not self.returns:
            return {}
        return {
            "episode_return_mean": float(np.mean(self.returns)),
            "episode_return_std": float(np.std(self.returns)),
            "episode_length_mean": float(np.mean(self.lengths)),
            "episodes_tracked": float(len(self.returns)),
        }

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        metrics.update(self.stats())


class ConsoleObserver(AlgoObserver):
    def __init__(self, interval: int = 10):
        self.interval = interval

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        if epoch % self.interval:
            return
        parts = "  ".join(f"{k} {v:.4g}" for k, v in sorted(metrics.items()))
        print(f"epoch {epoch:6d}  {parts}", flush=True)


class JsonlObserver(AlgoObserver):
    """Writes one JSON line per epoch to <run_dir>/metrics.jsonl."""

    def __init__(self):
        self._fh = None

    def after_init(self, run_dir: str, cfg: Dict[str, Any]) -> None:
        os.makedirs(run_dir, exist_ok=True)
        self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        if self._fh is None:
            return
        self._fh.write(json.dumps({"epoch": epoch, "time": time.time(), **metrics}) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()


class WandbObserver(AlgoObserver):
    """W&B logging, active only when wandb is importable and rank == 0
    (reference gating at /root/reference/train.py:179-183). In this
    zero-egress environment it degrades to a no-op with a notice."""

    def __init__(self, project: str, name: str, entity: str = "", group: str = "",
                 rank: int = 0):
        self._run = None
        if rank != 0:
            return
        try:
            import wandb  # noqa: F401
            self._wandb = wandb
            self._init_args = dict(project=project, name=name,
                                   entity=entity or None, group=group or None)
        except ImportError:
            self._wandb = None

    def after_init(self, run_dir: str, cfg: Dict[str, Any]) -> None:
        if getattr(self, "_wandb", None) is None:
            return
        try:
            self._run = self._wandb.init(config=cfg, **self._init_args)
        except Exception as exc:  # offline/zero-egress: degrade gracefully
            print(f"[wandb] disabled: {exc}")
            self._run = None

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        if self._run is not None:
            self._run.log(metrics, step=epoch)

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()


class PbtObserver(AlgoObserver):
    """Population-based-training hook (reference PbtAlgoObserver surface,
    /root/reference/train.py:88-89): checkpoints objective/params per epoch
    interval so an external PBT scheduler can exploit/explore."""

    def __init__(self, interval: int = 100, objective_key: str = "episode_return_mean"):
        self.interval = interval
        self.objective_key = objective_key
        self.run_dir = ""

    def after_init(self, run_dir: str, cfg: Dict[str, Any]) -> None:
        self.run_dir = run_dir

    def after_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        if epoch % self.interval or not self.run_dir:
            return
        with open(os.path.join(self.run_dir, "pbt_objective.json"), "w") as f:
            json.dump({"epoch": epoch,
                       "objective": metrics.get(self.objective_key, float("nan"))}, f)


class MultiObserver(AlgoObserver):
    """Fan-out (reference MultiObserver, /root/reference/train.py:172-183)."""

    def __init__(self, observers: List[AlgoObserver]):
        self.observers = observers

    def after_init(self, run_dir, cfg):
        for o in self.observers:
            o.after_init(run_dir, cfg)

    def process_infos(self, infos):
        for o in self.observers:
            o.process_infos(infos)

    def after_epoch(self, epoch, metrics):
        for o in self.observers:
            o.after_epoch(epoch, metrics)

    def close(self):
        for o in self.observers:
            o.close()
