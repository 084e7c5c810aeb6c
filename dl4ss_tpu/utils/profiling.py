"""Profiling — first-class, unlike the reference's wall-clock prints.

The reference's only performance telemetry is `print` of batch wall times
(Cocktail/.../nnet.py:127-147, predict.py:285-294). Here:

  * `profile_trace(dir)` wraps a block in a `jax.profiler` trace viewable in
    TensorBoard/XProf (device + host timelines, HLO cost breakdowns);
  * `StepTimer` measures steady-state step time the way this backend
    requires — chained dependencies closed by a host fetch, since
    `block_until_ready` does not reliably block under the axon relay
    (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/dl4ss_trace",
                  host_tracer_level: int = 2):
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measure ms/step of `fn(state) -> state`-shaped chains honestly."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup

    def time_chain(self, fn: Callable, init, iters: int = 20,
                   fetch: Optional[Callable] = None) -> float:
        """Returns mean ms per iteration. `fetch(x) -> float` forces the
        chain (defaults to float(sum of first leaf))."""
        def default_fetch(x):
            leaf = jax.tree_util.tree_leaves(x)[0]
            return float(jnp.sum(leaf))

        fetch = fetch or default_fetch
        x = init
        for _ in range(self.warmup):
            x = fn(x)
        fetch(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        fetch(x)
        return (time.perf_counter() - t0) / iters * 1000.0
