"""Utterance-level permutation-invariant training (uPIT).

The reference assigns output channels by speaker identity (channel k is
speaker dict_spk2idx[spk], Torch_multi/main_run.py:499-504); PIT is the
idiomatic generalization (Yu et al. 2017; Kolbaek et al. 2017 — PAPERS.md)
and is flag-switchable back to identity assignment for exact parity runs
(cfg.loss_mode).

All K! permutations are enumerated statically (K <= 4 in every reference
config), the per-(pred, target) pair losses are computed once as a (B, K, K)
matrix, and each permutation's score is a gather-sum — one einsum-shaped
reduction, no recomputation of the loss surface per permutation.
"""

from __future__ import annotations

import itertools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pair_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """(B, K, ...) x (B, K, ...) -> (B, K, K) mean-squared-error matrix
    with pairs[b, i, j] = MSE(pred[b, i], target[b, j])."""
    axes = tuple(range(3, pred.ndim + 1))
    diff = pred[:, :, None] - target[:, None, :]
    return jnp.mean(diff ** 2, axis=axes)


def pit_loss(pred: jax.Array, target: jax.Array,
             pair_loss: Callable = _pair_mse
             ) -> Tuple[jax.Array, jax.Array]:
    """Returns (scalar loss, best permutation indices (B, K)).

    loss = mean over batch of min_perm mean_k pair_loss(pred_k, target_perm(k)).
    """
    k = pred.shape[1]
    perms = np.array(list(itertools.permutations(range(k))))  # (P, K)
    pairs = pair_loss(pred, target)                           # (B, K, K)
    # score[b, p] = mean_i pairs[b, i, perms[p, i]]
    gathered = pairs[:, np.arange(k)[None, :], perms]         # (B, P, K)
    scores = jnp.mean(gathered, axis=-1)
    best = jnp.argmin(scores, axis=-1)                        # (B,)
    loss = jnp.mean(jnp.min(scores, axis=-1))
    return loss, jnp.asarray(perms)[best]


def pit_permute(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Apply per-sample channel permutation: x (B, K, ...), perm (B, K)."""
    return jnp.take_along_axis(
        x, perm.reshape(perm.shape + (1,) * (x.ndim - 2)), axis=1)
