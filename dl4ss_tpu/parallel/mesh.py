"""Device mesh and sharding policy.

The reference has no distributed support at all (SURVEY.md §2.2 — one GPU,
`torch.cuda.set_device(0)`); scaling here is TPU-native: a
(data, model) `jax.sharding.Mesh`, batches sharded over `data`, parameters
replicated (the models are ~10 MB — far below the point where tensor
parallelism pays off for this workload), with the speaker-embedding table and
the wide classifier projections shardable over `model` if a speaker inventory
ever outgrows HBM. Gradient all-reduce is inserted by XLA (the loss is a
mean over the global batch) and rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // mp
    use = np.array(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(use, axis_names=("data", "model"))


def mesh_for_cfg(cfg) -> Optional[Mesh]:
    """Validated (data, model) mesh from cfg.dp_size/mp_size — None on a
    1x1 layout. The shared gate every trainer (joint/adversarial/classifier
    AND memory/query) uses, so `--dp` is never a silently-inert flag."""
    if cfg.dp_size * cfg.mp_size <= 1:
        return None
    n_dev = len(jax.devices())
    if cfg.dp_size * cfg.mp_size > n_dev:
        raise ValueError(
            f"dp_size*mp_size = {cfg.dp_size}*{cfg.mp_size} exceeds the "
            f"{n_dev} available device(s)")
    if cfg.batch_size % cfg.dp_size:
        raise ValueError(
            f"dp_size={cfg.dp_size} must divide batch_size="
            f"{cfg.batch_size} for even batch sharding")
    return make_mesh(dp=cfg.dp_size, mp=cfg.mp_size)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over the data axis; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params):
    """Sharding pytree for params: embedding table row-sharded over `model`
    (when the mesh has one), everything else replicated."""
    rep = replicated(mesh)
    emb = NamedSharding(mesh, P("model", None))

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "embedding" in keys and "table" in keys and \
                mesh.shape["model"] > 1 and \
                leaf.shape[0] % mesh.shape["model"] == 0:
            return emb
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params per `param_sharding` (embedding
    row-sharded over `model` when possible), everything else — optimizer
    state, rng, step, memory — replicated."""
    state = jax.device_put(state, replicated(mesh))
    params = jax.tree_util.tree_map(
        jax.device_put, state.params, param_sharding(mesh, state.params))
    return state._replace(params=params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of arrays with the batch axis over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
