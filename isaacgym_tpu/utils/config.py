"""Config tree + resolver system (SURVEY.md §5.6, L6).

The reference composes Hydra/OmegaConf YAML with custom resolvers
``eq / contains / if / resolve_default`` (/root/reference/__init__.py:8-11)
and a root ``config.yaml`` that is missing from the snapshot. This module
restores that capability without the Hydra dependency: packaged YAML files,
the same resolver names, ``${a.b.c}`` interpolation, and dotlist CLI
overrides (``task.env.numEnvs=512``).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cfg")

_RESOLVER_RE = re.compile(r"\$\{([^{}]+)\}")


def _parse_scalar(text: str) -> Any:
    return yaml.safe_load(text)


def _lookup(root: Dict[str, Any], path: str, node_path: List[str]) -> Any:
    """Resolve a dotted reference. Leading dots climb relative to the node
    (OmegaConf semantics: ``${..x}`` = parent scope)."""
    if path.startswith("."):
        # OmegaConf semantics: one dot = the containing dict, each extra dot
        # climbs a level. node_path includes the value's own key, so strip it.
        ups = len(path) - len(path.lstrip("."))
        rel = path.lstrip(".")
        base = node_path[: max(0, len(node_path) - ups)]
        parts = base + (rel.split(".") if rel else [])
    else:
        parts = path.split(".")
    node: Any = root
    for p in parts:
        if not isinstance(node, dict) or p not in node:
            raise KeyError(f"config interpolation ${{{path}}} not found")
        node = node[p]
    return node, parts


def _split_args(body: str) -> List[str]:
    """Split resolver args on commas not inside ${...}."""
    args, depth, cur = [], 0, []
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur))
    return [a.strip() for a in args]


def _resolve_value(value: Any, root: Dict[str, Any], node_path: List[str]) -> Any:
    if isinstance(value, str):
        m = _RESOLVER_RE.fullmatch(value.strip())
        if m:
            return _resolve_expr(m.group(1), root, node_path)
        # embedded interpolation inside a longer string
        def sub(match):
            out = _resolve_expr(match.group(1), root, node_path)
            return str(out)
        if _RESOLVER_RE.search(value):
            return _RESOLVER_RE.sub(sub, value)
    return value


def _resolve_expr(expr: str, root: Dict[str, Any], node_path: List[str]) -> Any:
    if ":" in expr:
        name, _, body = expr.partition(":")
        args = [_resolve_value(a if not a.startswith("${") else a, root, node_path)
                for a in _split_args(body)]
        args = [_resolve_value(a, root, node_path) if isinstance(a, str) else a for a in args]
        args = [_parse_scalar(a) if isinstance(a, str) and not a.startswith("$") else a for a in args]
        if name == "resolve_default":
            default, alt = args[0], args[1]
            return default if alt in (None, "", "None") else alt
        if name == "eq":
            return str(args[0]).lower() == str(args[1]).lower()
        if name == "contains":
            return str(args[0]).lower() in str(args[1]).lower()
        if name == "if":
            return args[1] if args[0] else args[2]
        raise KeyError(f"unknown resolver {name!r}")
    out, target_path = _lookup(root, expr, node_path)
    if isinstance(out, str):
        # chained interpolation: resolve relative to the TARGET's location
        return _resolve_value(out, root, target_path)
    return out


def resolve(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively resolve every ``${...}`` in the tree (in place on a copy)."""
    root = copy.deepcopy(cfg)

    def walk(node: Any, path: List[str]) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        return _resolve_value(node, root, path)

    # two passes so chained interpolations settle
    out = walk(root, [])
    root = out
    return walk(root, [])


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` dotlist overrides (Hydra CLI parity)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, val = ov.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_scalar(val)
    return cfg


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def compose(task: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    """Compose root config + task + train YAMLs, apply overrides, resolve."""
    cfg = load_yaml(os.path.join(CFG_DIR, "config.yaml"))
    cfg["task"] = load_yaml(os.path.join(CFG_DIR, "task", f"{task}.yaml"))
    train_path = os.path.join(CFG_DIR, "train", f"{task}PPO.yaml")
    if os.path.exists(train_path):
        cfg["train"] = load_yaml(train_path)
    cfg["task_name"] = task
    if overrides:
        apply_overrides(cfg, list(overrides))
    return resolve(cfg)


def load_task_config(task: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    """Resolved task sub-config (the dict handed to the task class)."""
    return compose(task, overrides)["task"]


def preprocess_train_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Inject launcher-level fields into the rl_games-style train config and
    apply the PBT ``model_size_multiplier`` network mutation — capability of
    the reference ``preprocess_train_config`` (/root/reference/train.py:38-68).

    Mutates and returns ``cfg['train']``. Tolerates missing keys the same way
    the reference's ``try/except KeyError`` does.
    """
    train = cfg.get("train") or {}
    params = train.setdefault("params", {})
    train_cfg = params.setdefault("config", {})
    train_cfg["device"] = cfg.get("rl_device", "tpu")
    pbt = cfg.get("pbt") or {}
    train_cfg["population_based_training"] = bool(pbt.get("enabled", False))
    train_cfg["pbt_idx"] = pbt.get("policy_idx") if pbt.get("enabled") else None
    train_cfg["full_experiment_name"] = cfg.get("full_experiment_name")
    try:
        mlp = params["network"]["mlp"]
        multiplier = mlp["model_size_multiplier"]
        if multiplier != 1:
            mlp["units"] = [u * multiplier for u in mlp["units"]]
            print(f"Modified MLP units by x{multiplier} to {mlp['units']}")
    except KeyError:
        pass
    cfg["train"] = train
    return train
