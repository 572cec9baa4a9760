"""Device mesh + sharding layer (SURVEY.md §2 N10, §5.8).

The reference scales by torchrun data-parallel ranks with NCCL allreduce
(/root/reference/train.py:116-120, pingpong_note.txt:163). The TPU-native
equivalent is ONE program over a ``jax.sharding.Mesh``: env-batch arrays are
sharded over the ``dp`` axis (each chip simulates its env shard entirely
locally — physics needs zero cross-chip communication), params are replicated
(or tensor-sharded over ``mdl``), and XLA inserts the gradient/normalizer
collectives over ICI automatically.

Multi-host: call :func:`init_distributed` first (``jax.distributed``), then
the same code runs unchanged — ``jax.devices()`` spans the pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host bring-up (no-op on a single host)."""
    try:
        if jax.process_count() > 1:
            return
    except RuntimeError:
        pass
    # jax.distributed.initialize() is required only under multi-host launch
    # environments (it reads coordinator env vars); guard for single host.
    import os
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              axis_names: Tuple[str, str] = ("dp", "mdl")) -> Mesh:
    """Mesh over the first ``n_devices`` devices, shaped (dp, mdl)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (env-batch) axis sharded over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(tree, mesh: Mesh):
    """Place every leaf of a batched env pytree with its leading axis sharded
    over dp (the reference's env-batch parallelism as a sharding annotation)."""
    sh = env_sharding(mesh)

    def place(x):
        return jax.device_put(x, sh)

    return jax.tree.map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_params_tp(params, mesh: Mesh, layers: Sequence[str] = ("actor_mlp", "critic_mlp")):
    """Tensor-parallel placement for the MLP trunks: alternate sharding of
    Dense kernels over the ``mdl`` axis (output dim, then input dim), so the
    activation collective pattern is all-gather/reduce-scatter over ICI.

    The reference has no TP (SURVEY.md §2: model is a ~12M-param MLP) — this
    keeps the door open per §5.7: a sharding-rule change, not an architecture
    change.
    """
    if mesh.shape["mdl"] == 1:
        return replicate_tree(params, mesh)

    def place(path, x):
        keys = [getattr(p, "key", str(p)) for p in path]
        in_trunk = any(l in keys for l in layers)
        if in_trunk and keys[-1] == "kernel" and x.ndim == 2:
            # alternate: even Dense layers shard columns, odd shard rows
            dense_idx = 0
            for k in keys:
                if k.startswith("Dense_"):
                    dense_idx = int(k.split("_")[1])
            spec = P(None, "mdl") if dense_idx % 2 == 0 else P("mdl", None)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
