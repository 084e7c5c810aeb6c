"""Host->device feeding with prefetch.

The reference rebuilds its Python generator every batch and blocks the GPU on
CPU STFTs (Torch_multi/main_run.py:457-458). Device-resident banks make this
moot for WSJ0-scale data; for streaming corpora, `device_prefetch` overlaps
H2D copies with compute by keeping `depth` batches in flight.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(batches: Iterable, depth: int = 2,
                    sharding: Optional[object] = None) -> Iterator:
    """Yield device-put batches while the next `depth` transfers overlap."""
    queue = collections.deque()
    it = iter(batches)

    def put(b):
        if sharding is not None:
            return jax.device_put(b, sharding)
        return jax.device_put(b)

    for b in itertools.islice(it, depth):
        queue.append(put(b))
    for b in it:
        queue.append(put(b))
        yield queue.popleft()
    while queue:
        yield queue.popleft()
