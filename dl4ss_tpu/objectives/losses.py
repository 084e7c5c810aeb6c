"""Training objectives.

The reference's loss surface, in one place:
  * mask MSE vs per-speaker clean magnitudes (Torch_multi/main_run.py:493-506)
  * the (disabled by default) 0.5 * sum-to-one channel loss (:508-513)
  * complex MSE = MSE(real) + MSE(imag) for the cRM path
    (TDAA_beta/main_run_sstune_cRM_EvalVer.py:566-568)
  * MultiLabelSoftMarginLoss for the classifier
    (Torch_multi/test_multi_labels_speech.py:397)
  * the MSE-GAN discriminator/generator losses
    (TDAA_beta/main_run_sstune_dis.py:615-632, 683-700)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mask_mse_loss(pred_specs: jax.Array, target_specs: jax.Array,
                  channel_weights: Optional[jax.Array] = None) -> jax.Array:
    """MSE over (B, K, T, F) masked spectrograms.

    With `channel_weights` (B, K) the mean still normalizes over ALL
    elements — reproducing the reference's all-channel MSE where inactive
    channels contribute exact zeros (pred and target both zero,
    main_run.py:488-506).
    """
    se = (pred_specs - target_specs) ** 2
    if channel_weights is not None:
        se = se * channel_weights[..., None, None].astype(se.dtype)
    return jnp.mean(se)


def sum_to_one_loss(pred_specs: jax.Array) -> jax.Array:
    """MSE(sum_k pred, 1) — channels should tile the mixture (:508-513)."""
    total = jnp.sum(pred_specs, axis=1)
    return jnp.mean((total - 1.0) ** 2)


def complex_mse_loss(pred_ri: jax.Array, target_ri: jax.Array,
                     channel_weights: Optional[jax.Array] = None) -> jax.Array:
    """MSE(real) + MSE(imag) on (..., 2)-packed complex spectrograms."""
    se = (pred_ri - target_ri) ** 2
    if channel_weights is not None:
        se = se * channel_weights[..., None, None, None].astype(se.dtype)
    return jnp.mean(se[..., 0]) + jnp.mean(se[..., 1])


def multilabel_softmargin_loss(logits: jax.Array, targets: jax.Array
                               ) -> jax.Array:
    """torch.nn.MultiLabelSoftMarginLoss: mean over classes of
    -[y*log sigmoid(x) + (1-y)*log sigmoid(-x)], then mean over batch."""
    pos = jax.nn.log_sigmoid(logits)
    neg = jax.nn.log_sigmoid(-logits)
    per_class = -(targets * pos + (1.0 - targets) * neg)
    return jnp.mean(jnp.mean(per_class, axis=-1))


def gan_d_loss(score_real: jax.Array, score_fake: jax.Array) -> jax.Array:
    """loss_dis = MSE(D(real), 1) + MSE(D(fake), 0)."""
    return jnp.mean((score_real - 1.0) ** 2) + jnp.mean(score_fake ** 2)


def gan_g_loss(score_fake: jax.Array) -> jax.Array:
    """Generator adversarial term: MSE(D(fake), 1)."""
    return jnp.mean((score_fake - 1.0) ** 2)
