"""Determinism helpers.

The reference's reproducibility contract is three global seeds set at the
top of every script (`np.random.seed(1); torch.manual_seed(1);
random.seed(1)`, Torch_multi/main_run.py:21-23) — and it is then broken by
the data module reseeding at import (predata_multiAims.py:17-18). Here all
device-side randomness is threaded `jax.random` keys (inherently
reproducible); this helper covers the host-side python/numpy RNGs used by
list shuffling and synthetic-bank generation.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int = 1) -> jax.Array:
    """Seed host RNGs and return the root device PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
