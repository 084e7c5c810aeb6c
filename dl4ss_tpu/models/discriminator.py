"""Spectrogram realness discriminator (TDAA adversarial refinement).

Rebuilds Discriminator (TDAA_beta/main_run_sstune_TestVer.py:335-353):
3 x [Conv 3x3 stride 2 VALID, 64ch, ReLU] over (T, F) spectrograms viewed as
one-channel images, then Linear(flatten -> 1) + sigmoid realness score.
For the reference shape (313, 129) the flatten is 38*15*64 = 36480, matching
its hard-coded Linear(36480, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import conv2d, conv_init, linear, linear_init


def _out_hw(t: int, f: int):
    for _ in range(3):
        t = (t - 3) // 2 + 1
        f = (f - 3) // 2 + 1
    return t, f


def init_discriminator(key, cfg: Config, num_frames: int = None):
    t = num_frames if num_frames is not None else cfg.num_frames
    th, fw = _out_hw(t, cfg.freq_bins)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv0": conv_init(k1, 1, 64, 3, 3),
        "conv1": conv_init(k2, 64, 64, 3, 3),
        "conv2": conv_init(k3, 64, 64, 3, 3),
        "out": linear_init(k4, th * fw * 64, 1),
    }


def apply_discriminator(params, specs: jax.Array, cfg: Config) -> jax.Array:
    """specs (B, K, T, F) -> realness scores (B*K, 1) in (0, 1)."""
    b, k, t, f = specs.shape
    x = specs.reshape(b * k, t, f, 1)
    for name in ("conv0", "conv1", "conv2"):
        x = jax.nn.relu(conv2d(params[name], x, stride=(2, 2)))
    x = x.reshape(b * k, -1)
    return jax.nn.sigmoid(linear(params["out"], x))
