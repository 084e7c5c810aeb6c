"""Mesh + sharding policy (data parallel over ICI, optional model axis)."""

from dl4ss_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch, shard_state,
    param_sharding)
