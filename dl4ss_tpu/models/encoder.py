"""Mixture encoder: (B, T, F) magnitude features -> 3-D embedding map.

Rebuilds MIX_SPEECH (Torch_multi/main_run.py:258-282): a multi-layer
bidirectional GRU (LSTM in the TDAA fork, which is 4 layers deep and also
returns the raw hidden sequence for ADDJUST,
TDAA_beta/main_run_sstune_TestVer.py:284-310) followed by a Dense(2H -> F*E)
with tanh, reshaped to the (B, T, F, E) time-frequency embedding grid the
mask heads attend over.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import linear, linear_init
from dl4ss_tpu.ops.rnn import bidirectional_rnn, rnn_init


def init_encoder(key, cfg: Config):
    k_rnn, k_proj = jax.random.split(key)
    return {
        "rnn": rnn_init(k_rnn, cfg.encoder_rnn, cfg.freq_bins,
                        cfg.hidden_units, cfg.encoder_layers,
                        bidirectional=True),
        "proj": linear_init(k_proj, 2 * cfg.hidden_units,
                            cfg.freq_bins * cfg.embedding_size),
    }


def encoder_hidden(params, feat: jax.Array, cfg: Config) -> jax.Array:
    """feat (B, T, F) -> recurrent hidden (B, T, 2H) — the RNN half alone,
    so the fused Pallas mask head (ops/pallas_maskhead.py) can consume the
    hidden directly without materializing the embedding grid."""
    return bidirectional_rnn(params["rnn"], feat, cfg.encoder_rnn,
                             remat=cfg.remat, use_pallas=cfg.use_pallas_rnn)


def embedding_map(params, hidden: jax.Array, cfg: Config) -> jax.Array:
    """hidden (B, T, 2H) -> (B, T, F, E) tanh embedding grid (the
    Dense(2H -> F*E) + tanh of MIX_SPEECH, main_run.py:258-282)."""
    b, t, _ = hidden.shape
    emb = jnp.tanh(linear(params["proj"], hidden))
    return emb.reshape(b, t, cfg.freq_bins, cfg.embedding_size)


def apply_encoder(params, feat: jax.Array, cfg: Config
                  ) -> Tuple[jax.Array, jax.Array]:
    """feat (B, T, F) -> (emb_map (B, T, F, E), hidden (B, T, 2H))."""
    hidden = encoder_hidden(params, feat, cfg)
    return embedding_map(params, hidden, cfg), hidden
