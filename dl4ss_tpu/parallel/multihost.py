"""Multi-host input sharding over DCN.

On a multi-host TPU pod slice, each host process feeds only its addressable
shard of the global batch; gradient reduction rides ICI inside XLA, and the
only DCN traffic is each host reading its own slice of the dataset
(SURVEY §2.2's consequence table — the reference itself has no distributed
support at all). These helpers partition work by `jax.process_index()` and
assemble globally-sharded arrays from per-host shards.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_shard_range(total: int, process_index: int = None,
                     process_count: int = None) -> Tuple[int, int]:
    """[start, end) of this host's contiguous share of `total` items."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(total, pc)
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)


def host_shard_list(items: Sequence, process_index: int = None,
                    process_count: int = None) -> List:
    """This host's slice of a dataset list (entries, paths, ...)."""
    start, end = host_shard_range(len(items), process_index, process_count)
    return list(items[start:end])


def global_batch_from_host_shards(local_batch, mesh: Mesh):
    """Assemble a globally-sharded array from each host's local numpy batch.

    local_batch leaves are (local_B, ...); the result is a jax.Array whose
    global shape is (global_B, ...) sharded over the mesh's `data` axis,
    built with `make_array_from_process_local_data` (no cross-host copies).
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)
