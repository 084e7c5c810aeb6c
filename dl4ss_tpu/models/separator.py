"""The composed speaker-conditioned separation model.

One model generalizing all four reference generations (SURVEY.md §7 design
stance): encoder -> query source (speaker embedding | life-long memory |
image CNN | video encoder) -> optional ADDJUST -> mask head -> mask apply.
Mirrors the forward pass of Torch_multi/main_run.py:461-506 and
TDAA_beta/main_run_sstune_TestVer.py:427-476, and the recursive
peel-and-subtract loop of main_run_multi_selfSS_recu.py:313-400.

Two channel layouts:
  * top-k (static K = cfg.top_k) — queries gathered for K selected speakers;
    the TPU-native formulation (`separate`);
  * dense (all S speakers, 0/1-gated) — the exact main_run.py layout where
    every speaker owns a loss channel (`separate_dense`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.adjust import apply_adjust, init_adjust
from dl4ss_tpu.models.attention import apply_mask_head, init_mask_head
from dl4ss_tpu.models.classifier import apply_classifier, init_classifier
from dl4ss_tpu.models.discriminator import apply_discriminator, init_discriminator
from dl4ss_tpu.models.embedding import (apply_embedding,
                                        apply_embedding_gated, init_embedding)
from dl4ss_tpu.models.encoder import apply_encoder, init_encoder
from dl4ss_tpu.objectives.select import top_k_indices, top_k_mask
from dl4ss_tpu.ops.crm import complex_mask_apply, crm_uncompress


class SeparatorOutput(NamedTuple):
    masks: jax.Array        # (B,K,T,F) or compressed cRM (B,K,T,F,2)
    pred: jax.Array         # masked magnitudes (B,K,T,F) or complex RI (...,2)
    probs: jax.Array        # classifier probabilities (B,S)
    hidden: jax.Array       # encoder hidden (B,T,2H)
    queries: jax.Array      # final (post-adjust) queries (B,K,Q)


def init_separator(key, cfg: Config, num_frames: Optional[int] = None):
    keys = jax.random.split(key, 6)
    params = {
        "encoder": init_encoder(keys[0], cfg),
        "classifier": init_classifier(keys[1], cfg),
        "embedding": init_embedding(keys[2], cfg),
        "mask_head": init_mask_head(keys[3], cfg),
    }
    if cfg.is_self_tune:
        params["adjust"] = init_adjust(keys[4], cfg)
    if cfg.use_discriminator:
        params["discriminator"] = init_discriminator(keys[5], cfg, num_frames)
    return params


def classify_speakers(params, feat: jax.Array, cfg: Config,
                      logits: bool = False) -> jax.Array:
    return apply_classifier(params["classifier"], feat, cfg, logits=logits)


def _use_fused_maskhead(cfg: Config) -> bool:
    """The fused Pallas proj+dot+sigmoid kernel replaces the XLA
    embedding-grid materialization (ops/pallas_maskhead.py); magnitude
    dot-head configs only — align heads and cRM keep the XLA path.

    Size guard: the kernel keeps the bf16 projection W (2H, F*E) VMEM-
    resident for the whole grid alongside the (TILE_T, F*E) f32 accumulator
    and the block-sum matrix; past ~10 MB of W the working set exceeds the
    16 MB/core VMEM budget (H=600 puts W alone at 15.5 MB), so scaled-up
    configs silently take the XLA path instead of failing to compile."""
    fe = cfg.freq_bins * cfg.embedding_size
    w_bytes = (2 * cfg.hidden_units) * fe * 2        # bf16 resident W
    return (cfg.use_pallas_maskhead and cfg.mask_head == "dot"
            and not cfg.is_complex_mask and w_bytes <= 10 * 2 ** 20)


def _finish(params, cfg, emb_map, hidden, queries, feat, mix_ri, probs):
    if cfg.is_self_tune:
        queries = apply_adjust(params["adjust"], hidden, queries)
    if emb_map is None:
        # fused path: the (B,T,F,E) grid never exists in HBM
        from dl4ss_tpu.ops.pallas_maskhead import _TILE_T_BWD, fused_dot_masks
        proj = params["encoder"]["proj"]
        # si_sdr training programs inflate Mosaic's scoped stack for the
        # backward kernel at the same block shapes (measured at B=128:
        # 18.9 MB with ADDJUST, 17.5 MB without — both > the 16 MB limit;
        # identical MSE/pit programs compile fine); a half time-tile keeps
        # the kernel viable there — still faster than the XLA fallback
        bwd_tile = (32 if cfg.loss_mode == "si_sdr" else _TILE_T_BWD)
        masks = fused_dot_masks(hidden, proj["w"], proj["b"],
                                queries.astype(hidden.dtype),
                                cfg.freq_bins, cfg.embedding_size,
                                bwd_tile)
    else:
        masks = apply_mask_head(params["mask_head"], emb_map, queries, cfg)
    if cfg.is_complex_mask:
        # uncompress the K*tanh-bounded head output, then complex-multiply
        # with the mixture spectrum (main_run_sstune_cRM_EvalVer.py:512,552-553)
        full_masks = crm_uncompress(masks, cfg.crm_k, cfg.crm_c)
        pred = complex_mask_apply(full_masks, mix_ri[:, None])
    elif cfg.log_spectral:
        # log features drive the mask, but the mask multiplies (and the
        # loss/resynthesis compare) the LINEAR spectrum — output =
        # mask (.) mix_spectrum (Cocktail nnet.py:95, predict.py:241-245)
        if mix_ri is None:
            raise ValueError(
                "log_spectral separation needs mix_ri (the packed complex "
                "mixture) to recover the linear magnitude the masks apply to")
        from dl4ss_tpu.ops.crm import unpack_ri
        mag = jnp.abs(unpack_ri(mix_ri)).astype(masks.dtype)
        pred = masks * mag[:, None]
    else:
        pred = masks * feat[:, None]
    return SeparatorOutput(masks, pred, probs, hidden, queries)


def separate(params, feat: jax.Array, cfg: Config,
             spk_idx: Optional[jax.Array] = None,
             queries: Optional[jax.Array] = None,
             mix_ri: Optional[jax.Array] = None,
             need_probs: bool = False) -> SeparatorOutput:
    """Top-k path. feat (B,T,F) magnitude features.

    spk_idx (B,K): the speakers to extract — teacher-forced at training
    (cfg.ground_truth) or classifier top-k at inference; if None, the
    classifier's top-k is used. `queries` (B,K,Q) overrides the embedding
    lookup for image/video/memory conditioning. `mix_ri` (B,T,F,2) is the
    packed complex mixture, required for the cRM path.

    The classifier (a BiLSTM as large as the encoder) only runs when its
    output is needed — when selecting speakers, or when `need_probs` asks
    for it. Teacher-forced training therefore skips it entirely; the
    reference runs it and discards the result (main_run.py:465-471).
    """
    if _use_fused_maskhead(cfg):
        from dl4ss_tpu.models.encoder import encoder_hidden
        emb_map, hidden = None, encoder_hidden(params["encoder"], feat, cfg)
    else:
        emb_map, hidden = apply_encoder(params["encoder"], feat, cfg)
    run_classifier = need_probs or (queries is None and spk_idx is None)
    if run_classifier:
        probs = apply_classifier(params["classifier"], feat, cfg)
    else:
        probs = jnp.zeros((feat.shape[0], cfg.num_speakers), feat.dtype)
    if queries is None:
        if spk_idx is None:
            spk_idx, _ = top_k_indices(probs, cfg.top_k)
        queries = apply_embedding(params["embedding"], spk_idx)
    return _finish(params, cfg, emb_map, hidden, queries, feat, mix_ri, probs)


def separate_dense(params, feat: jax.Array, cfg: Config,
                   channel_gate: jax.Array,
                   mix_ri: Optional[jax.Array] = None) -> SeparatorOutput:
    """All-speaker channel layout (main_run.py:473-489): channel_gate (B,S)
    in {0,1}; masks for gated-off speakers are forced to zero exactly as the
    reference multiplies by the expanded top_k_mask (:488-489)."""
    emb_map, hidden = apply_encoder(params["encoder"], feat, cfg)
    probs = jnp.zeros((feat.shape[0], cfg.num_speakers), feat.dtype)
    queries = apply_embedding_gated(params["embedding"], channel_gate)
    out = _finish(params, cfg, emb_map, hidden, queries, feat, mix_ri, probs)
    gate = channel_gate[..., None, None]
    masks = out.masks * (gate[..., None] if cfg.is_complex_mask else gate)
    pred = out.pred * (gate[..., None] if cfg.is_complex_mask else gate)
    return out._replace(masks=masks, pred=pred)


def recursive_separate(params, feat: jax.Array, cfg: Config,
                       allowed: Optional[jax.Array] = None
                       ) -> tuple[jax.Array, jax.Array]:
    """TDAA's signature recursive extraction (§3.4 of SURVEY.md).

    Peel one speaker per step: classify the residual, take the most probable
    speaker not yet extracted, mask it out, and feed `(1-mask) * residual`
    back in (main_run_multi_selfSS_recu.py:341-400). Static `cfg.
    recursive_max_steps` iterations (the reference stops after 2).

    `allowed` ((B, S) bool, optional) restricts every peel step's classifier
    choice to a per-sample candidate roster — the aim_pro protocol
    (predata_multiSpeechTest.py:89-115) composed with the peel loop's own
    already-extracted exclusion.

    Returns (extracted (B, steps, T, F), speaker indices (B, steps)).
    """
    if cfg.is_complex_mask:
        raise ValueError(
            "recursive extraction operates on magnitude residuals; the "
            "reference's recursive drivers are magnitude-only too "
            "(main_run_multi_selfSS_recu.py:398-400). Use top-k mode for "
            "cRM models.")
    if cfg.log_spectral:
        raise ValueError(
            "recursive extraction peels (1-mask)*residual in the LINEAR "
            "magnitude domain; log-spectral features cannot be peeled "
            "(the reference's recursive drivers are linear-only)")
    b, t, f = feat.shape
    s = cfg.num_speakers

    def step(carry, _):
        residual, seen = carry                       # (B,T,F), (B,S) bool
        emb_map, hidden = apply_encoder(params["encoder"], residual, cfg)
        probs = apply_classifier(params["classifier"], residual, cfg)
        blocked = seen if allowed is None else seen | ~allowed.astype(bool)
        probs = jnp.where(blocked, -jnp.inf, probs)
        spk = jnp.argmax(probs, axis=-1)             # (B,)
        queries = apply_embedding(params["embedding"], spk[:, None])
        if cfg.is_self_tune:
            queries = apply_adjust(params["adjust"], hidden, queries)
        mask = apply_mask_head(params["mask_head"], emb_map, queries, cfg)
        mask = mask[:, 0]                            # (B,T,F)
        extracted = mask * residual
        residual = (1.0 - mask) * residual
        seen = seen | jax.nn.one_hot(spk, s, dtype=bool)
        return (residual, seen), (extracted, spk)

    init = (feat, jnp.zeros((b, s), bool))
    _, (extracted, spks) = jax.lax.scan(
        step, init, None, length=cfg.recursive_max_steps)
    return (jnp.moveaxis(extracted, 0, 1), jnp.moveaxis(spks, 0, 1))
