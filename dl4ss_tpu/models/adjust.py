"""ADDJUST — TDAA's "self-tune" query adaptation.

Rebuilds ADDJUST (TDAA_beta/main_run_sstune_TestVer.py:370-384): the
time-mean of the encoder hidden sequence is concatenated with each speaker
query and passed through a bias-free Linear(2H+Q -> Q); the result is added
residually to the query (`emb <- emb + ADDJUST(hidden, emb)`, :453-454),
gated by cfg.is_self_tune.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import linear, linear_init


def init_adjust(key, cfg: Config):
    return {"layer": linear_init(key, 2 * cfg.hidden_units + cfg.query_dim,
                                 cfg.query_dim, bias=False)}


def apply_adjust(params, hidden: jax.Array, queries: jax.Array) -> jax.Array:
    """hidden (B,T,2H), queries (B,K,Q) -> adjusted queries (B,K,Q)."""
    k = queries.shape[1]
    ctx = jnp.mean(hidden, axis=1)                        # (B, 2H)
    ctx = jnp.broadcast_to(ctx[:, None, :], (ctx.shape[0], k, ctx.shape[-1]))
    delta = linear(params["layer"], jnp.concatenate([ctx, queries], axis=-1))
    return queries + delta
