"""Multi-label "who is in the mixture" speaker classifier.

Rebuilds MIX_SPEECH_classifier (Torch_multi/main_run.py:284-305): BiLSTM over
the magnitude features, mean over time, sigmoid(Linear -> num_speakers).
The dB/TDAA forks double the recurrent width
(TDAA_beta/main_run_sstune_TestVer.py:324-332) — `classifier_hidden_mult`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import linear, linear_init
from dl4ss_tpu.ops.rnn import bidirectional_rnn, rnn_init


def init_classifier(key, cfg: Config):
    k_rnn, k_out = jax.random.split(key)
    width = cfg.hidden_units * cfg.classifier_hidden_mult
    return {
        "rnn": rnn_init(k_rnn, cfg.classifier_rnn, cfg.freq_bins, width,
                        cfg.classifier_layers, bidirectional=True),
        "out": linear_init(k_out, 2 * width, cfg.num_speakers),
    }


def apply_classifier(params, feat: jax.Array, cfg: Config,
                     logits: bool = False) -> jax.Array:
    """feat (B, T, F) -> per-speaker presence probabilities (B, S)."""
    hidden = bidirectional_rnn(params["rnn"], feat, cfg.classifier_rnn,
                               remat=cfg.remat, use_pallas=cfg.use_pallas_rnn)
    pooled = jnp.mean(hidden, axis=1)
    out = linear(params["out"], pooled)
    return out if logits else jax.nn.sigmoid(out)
