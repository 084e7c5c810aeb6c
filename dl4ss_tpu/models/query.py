"""Query encoders — the pluggable conditioning modalities.

The four reference generations differ mainly in where the mask-head query
comes from; each becomes one encoder here:

  * speech voiceprint: BiLSTM(E/2) stack over clean-speech features + masked
    mean-pool (Cocktail/.../nnet.py:66-71, MeanPool extend_layers.py:105-129);
  * image: 3 x [Conv+ReLU+MaxPool] -> Dense(E) over MNIST digits
    (Multi_modal/.../nnet.py:70-90);
  * video: per-frame CNN trunk -> BiLSTM -> last hidden -> Dense(E)
    (VIDEO_QUERY, Torch_multi/main_run.py:226-256 — the reference freezes a
    torchvision Inception-v3 there (myNet.py); the trunk is pluggable here
    and defaults to a small conv stack, with logits head for the speaker-
    classification auxiliary output).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import conv2d, conv_init, linear, linear_init
from dl4ss_tpu.ops.rnn import bidirectional_rnn, rnn_init


def masked_mean_pool(x: jax.Array, mask: Optional[jax.Array] = None
                     ) -> jax.Array:
    """(B, T, D) [+ (B, T) validity mask] -> (B, D) mean over valid steps."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


# ---- speech voiceprint ----------------------------------------------------


def init_speech_query(key, cfg: Config):
    half = max(cfg.embedding_size // 2, 1)
    return {"rnn": rnn_init(key, "lstm", cfg.freq_bins, half,
                            cfg.num_layers, bidirectional=True)}


def apply_speech_query(params, clean_feat: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """clean features (B, T, F) -> voiceprint (B, E)."""
    h = bidirectional_rnn(params["rnn"], clean_feat, "lstm")
    return masked_mean_pool(h, mask)


# ---- image query ----------------------------------------------------------


def init_image_query(key, cfg: Config, image_hw: Tuple[int, int] = (28, 28),
                     channels: int = 1):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, w = image_hw
    for _ in range(3):
        h, w = h // 2, w // 2  # three 2x2 max-pools (SAME conv)
    return {
        "conv0": conv_init(k1, channels, 32, 3, 3),
        "conv1": conv_init(k2, 32, 32, 3, 3),
        "conv2": conv_init(k3, 32, 32, 3, 3),
        "out": linear_init(k4, h * w * 32, cfg.embedding_size),
    }


def apply_image_query(params, images: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, E)."""
    x = images
    for name in ("conv0", "conv1", "conv2"):
        x = jax.nn.relu(conv2d(params[name], x, stride=(1, 1), padding="SAME"))
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = x.reshape(x.shape[0], -1)
    return linear(params["out"], x)


# ---- video query ----------------------------------------------------------


def init_video_query(key, cfg: Config, num_speakers: Optional[int] = None,
                     frame_hw: Tuple[int, int] = (299, 299),
                     trunk: str = "conv", trunk_dim: int = 256):
    """trunk='inception' reproduces the reference exactly (frozen
    Inception-v3 penultimate 2048-d per frame, main_run.py:226-243);
    trunk='conv' is a lightweight strided-conv stand-in."""
    s = num_speakers if num_speakers is not None else cfg.num_speakers
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    if trunk == "inception":
        from dl4ss_tpu.models.inception import init_inception_v3
        trunk_params = {"inception": init_inception_v3(k1)}
        feat_dim = 2048  # size_hidden_image (main_run.py:237)
    else:
        trunk_params = {
            "conv0": conv_init(k1, 3, 32, 5, 5),
            "conv1": conv_init(k2, 32, 64, 3, 3),
            "conv2": conv_init(k3, 64, trunk_dim, 3, 3),
        }
        feat_dim = trunk_dim
    return {
        **trunk_params,
        "rnn": rnn_init(k4, "lstm", feat_dim, cfg.hidden_units,
                        cfg.num_layers, bidirectional=True),
        "dense": linear_init(k5, 2 * cfg.hidden_units, cfg.embedding_size),
        "logits": linear_init(k6, cfg.embedding_size, s),
    }


def apply_video_query(params, frames: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """frames (B, T, H, W, 3) -> (speaker logits (B, S), query (B, E)).

    Mirrors VIDEO_QUERY.forward: frame features -> BiLSTM -> last timestep
    -> Dense(E) -> (logits, hidden query) (main_run.py:246-256). The
    Inception trunk is FROZEN, exactly as the reference keeps its
    pretrained Inception-v3 fixed (main_run.py:232-243): its params are
    stop-gradiented here, so only the BiLSTM/Dense head trains.
    """
    b, t = frames.shape[:2]
    x = frames.reshape((b * t,) + frames.shape[2:])
    if "inception" in params:
        from dl4ss_tpu.models.inception import apply_inception_v3
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                        params["inception"])
        _, _, x = apply_inception_v3(frozen, x)
    else:
        # SAME padding keeps small lip crops (16x16 up) from collapsing to
        # zero spatial size before the global pool
        x = jax.nn.relu(conv2d(params["conv0"], x, stride=(4, 4),
                               padding="SAME"))
        x = jax.nn.relu(conv2d(params["conv1"], x, stride=(3, 3),
                               padding="SAME"))
        x = jax.nn.relu(conv2d(params["conv2"], x, stride=(2, 2),
                               padding="SAME"))
        x = jnp.mean(x, axis=(1, 2))                 # global average pool
    x = x.reshape(b, t, -1)
    h = bidirectional_rnn(params["rnn"], x, "lstm")
    query = linear(params["dense"], h[:, -1])
    return linear(params["logits"], query), query
