"""Speaker embedding table.

Rebuilds SPEECH_EMBEDDING: an (num_speakers, E) table — 2E wide for the cRM
dual-query path (TDAA_beta/main_run_sstune_cRM_EvalVer.py:399). Two read
modes mirror the reference's two forks:

  * `apply_embedding` — direct gather by (B, K) indices, the dB/TDAA
    signature (`forward(input, mask_idx)`,
    main_run_multi_selfSS_dB.py:317-320);
  * `apply_embedding_gated` — the canonical main_run.py trick
    (main_run.py:307-327): indices built by `arange * 0/1-mask` so every
    speaker channel exists but absent channels read row 0 and are zeroed —
    jit-friendly static shapes by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config


def init_embedding(key, cfg: Config):
    # torch nn.Embedding default: N(0, 1)
    return {"table": jax.random.normal(
        key, (cfg.num_speakers, cfg.query_dim), jnp.float32)}


def apply_embedding(params, spk_idx: jax.Array) -> jax.Array:
    """(B, K) int32 -> (B, K, Q)."""
    return jnp.take(params["table"], spk_idx, axis=0)


def apply_embedding_gated(params, channel_gate: jax.Array) -> jax.Array:
    """channel_gate (B, S) in {0,1} -> (B, S, Q), zeroed where gate is 0."""
    s = params["table"].shape[0]
    idx = jnp.arange(s)[None, :] * channel_gate.astype(jnp.int32)
    emb = jnp.take(params["table"], idx, axis=0)
    return emb * channel_gate[..., None].astype(emb.dtype)
