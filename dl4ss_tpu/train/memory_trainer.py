"""Target-speaker extraction with the life-long speaker memory.

Rebuilds the Cocktail/Multi_modal Keras stack (SURVEY.md C4-C8, D2-D5):

  * the query is a voiceprint — a BiLSTM+mean-pool over the target's clean
    speech (nnet.py:66-71) — or an image-CNN embedding for the MNIST variant
    (Multi_modal nnet.py:70-90), selectable via `query_source`;
  * the voiceprint is written into the life-long memory INSIDE the graph
    (differentiably, SpkLifeLongMemory's inc_subtensor) and the mask-head
    query is the freshly-written row (SelectSpkMemory), so gradients flow
    through the write (extend_layers.py:132-216);
  * the persistent memory state is then updated OUTSIDE the gradient step,
    reproducing the Keras `update_memory` set_weights call after every
    train_on_batch (nnet.py:130-135, extend_layers.py:220-228);
  * at eval the clean input is zeroed (predict.py:231-233) and the memory
    row alone drives the mask; unknown speakers are handled by first
    `enroll`-ing seconds of their audio (predict.py:160-180);
  * training runs with per-epoch dev-loss early stopping, patience 10,
    restoring the best parameters (nnet.py:149-172).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.attention import apply_mask_head, init_mask_head
from dl4ss_tpu.models.encoder import apply_encoder, init_encoder
from dl4ss_tpu.models.memory import (MemorySlots, SLOT_IMAGE, SLOT_SPEECH,
                                     SLOT_VIDEO, init_memory, memory_read,
                                     memory_rows, memory_write_slot)
from dl4ss_tpu.models.query import (apply_image_query, apply_speech_query,
                                    apply_video_query, init_image_query,
                                    init_speech_query, init_video_query,
                                    masked_mean_pool)
from dl4ss_tpu.train.state import make_optimizer


class MemoryTrainState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: object
    memory: MemorySlots
    rng: jax.Array


def init_memory_model(key, cfg: Config, query_source: str = "speech",
                      frame_hw: Tuple[int, int] = (48, 48),
                      video_trunk: str = "conv"):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "encoder": init_encoder(k1, cfg),
        "mask_head": init_mask_head(k2, cfg.replace(mask_head="align")),
    }
    if query_source == "speech":
        params["speech_query"] = init_speech_query(k3, cfg)
    elif query_source == "image":
        params["image_query"] = init_image_query(k3, cfg)
    elif query_source == "video":
        # lip-frame query into the memory's video slot: the write path the
        # reference defines (MEMORY.add_video, Torch_multi/main_run.py:
        # 142-171) but never reaches (its consuming phase is dead code
        # after `1/0`, main_run.py:539-599) — wired live here
        params["video_query"] = init_video_query(k3, cfg, frame_hw=frame_hw,
                                                 trunk=video_trunk)
    else:
        raise ValueError(query_source)
    return params


def _valid_frames(clean: jax.Array, cfg: Config) -> jax.Array:
    """Non-silent frame mask: Masking(mask_value=0) for linear features,
    MaskingGt(log(spacing(1)*2)) for log-spectral ones (nnet.py:43-47,
    extend_layers.py:231-251)."""
    if cfg.log_spectral:
        import numpy as _np
        floor = float(_np.log(_np.spacing(1) * 2))
        return jnp.any(clean > floor, axis=-1)
    return jnp.any(clean != 0.0, axis=-1)


def _voiceprint(params, feats, cfg: Config, query_source: str):
    if query_source == "speech":
        clean = feats["clean_feas"]
        return apply_speech_query(params["speech_query"], clean,
                                  _valid_frames(clean, cfg))
    if query_source == "video":
        # (B, T, H, W, 3) lip frames -> (B, E) query (logits unused here;
        # the memory write IS the supervision path)
        return apply_video_query(params["video_query"],
                                 feats["query_video"])[1]
    return apply_image_query(params["image_query"], feats["query_image"])


def _slot(query_source: str) -> int:
    return {"speech": SLOT_SPEECH, "image": SLOT_IMAGE,
            "video": SLOT_VIDEO}[query_source]


def _memory_loss(pred, masks, feats, cfg: Config):
    """Loss of the memory-driven single-target extraction.

    Default: the Keras stack's spectral mask MSE (nnet.py:113, MSE-only —
    the reference never trains Cocktail on the eval metric). With
    cfg.loss_mode='si_sdr' the chain continues differentiably through the
    mixture-phase iSTFT to negative time-domain SI-SDR of the designated
    target — the same fine-tune lever measured at +0.43..+0.85 dB on every
    separator variant (docs/BENCHMARKS.md), applied here to the Cocktail /
    Multi_modal generation. mask (.) |X| (.) e^{j angle X} == mask (.) X, so
    the resynthesis is phasor-free. No PIT: the protocol designates the
    target (first-speaker-is-target, prepare_data.py:104-155)."""
    if cfg.loss_mode == "si_sdr":
        from dl4ss_tpu.eval.sisdr import si_sdr
        from dl4ss_tpu.ops.crm import unpack_ri
        from dl4ss_tpu.ops.stft import istft_cfg
        pred_spec = masks[:, 0].astype(jnp.complex64) * \
            unpack_ri(feats["mix_ri"])
        wav = istft_cfg(pred_spec, cfg, length=cfg.max_len)
        return -jnp.mean(si_sdr(wav, feats["target_wav"]))
    return jnp.mean((pred - feats["target_mag"]) ** 2)


def make_memory_train_step(cfg: Config, query_source: str = "speech",
                           steps_per_epoch: int = 1) -> Callable:
    opt = make_optimizer(cfg, steps_per_epoch)
    align_cfg = cfg.replace(mask_head="align")
    slot = _slot(query_source)

    @jax.jit
    def step(state: MemoryTrainState, feats) -> Tuple[MemoryTrainState, dict]:
        spk_id = feats["spk_id"]                           # (B,)

        def loss_fn(params):
            emb_map, _ = apply_encoder(params["encoder"], feats["mix_feas"],
                                       cfg)
            vp = _voiceprint(params, feats, cfg, query_source)
            # differentiable in-graph write + select (the Keras graph path)
            mem = memory_write_slot(
                jax.tree_util.tree_map(jax.lax.stop_gradient, state.memory),
                spk_id, vp, slot)
            query = memory_read(mem, spk_id, slot)         # (B, E)
            masks = apply_mask_head(params["mask_head"], emb_map,
                                    query[:, None, :], align_cfg)
            pred = masks[:, 0] * feats["mix_mag"]
            return _memory_loss(pred, masks, feats, cfg), vp

        (loss, vp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # out-of-graph persistent memory update (update_memory semantics)
        memory = memory_write_slot(state.memory, spk_id,
                                   jax.lax.stop_gradient(vp), slot)
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state, memory=memory), \
            {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def make_memory_eval_step(cfg: Config, query_source: str = "speech"
                          ) -> Callable:
    """Inference: clean/query input zeroed, the memory row drives the mask
    (predict.py:231-245). Returns (pred_mag, mask, dev loss vs target —
    MSE, or negative SI-SDR under loss_mode='si_sdr' so early stopping
    selects on the trained objective)."""
    align_cfg = cfg.replace(mask_head="align")
    slot = _slot(query_source)

    @jax.jit
    def step(params, memory: MemorySlots, feats):
        emb_map, _ = apply_encoder(params["encoder"], feats["mix_feas"], cfg)
        query = memory_read(memory, feats["spk_id"], slot)
        masks = apply_mask_head(params["mask_head"], emb_map,
                                query[:, None, :], align_cfg)
        pred = masks[:, 0] * feats["mix_mag"]
        loss = _memory_loss(pred, masks, feats, cfg)
        return {"pred_mag": pred, "mask": masks[:, 0], "loss": loss}

    return step


def enroll(params, memory: MemorySlots, cfg: Config, spk_id: jax.Array,
           enroll_feats: jax.Array, query_source: str = "speech"
           ) -> MemorySlots:
    """Unknown-speaker enrollment (predict.py:160-180): run `supp_time`
    seconds of the speaker's clean audio through the voiceprint branch and
    write the result into their memory row."""
    if query_source == "speech":
        vp = apply_speech_query(params["speech_query"], enroll_feats,
                                _valid_frames(enroll_feats, cfg))
    elif query_source == "video":
        vp = apply_video_query(params["video_query"], enroll_feats)[1]
    else:
        vp = apply_image_query(params["image_query"], enroll_feats)
    return memory_write_slot(memory, spk_id, vp, _slot(query_source))


def unk_row(cfg: Config) -> int:
    """The reserved unknown-speaker memory row (only exists when
    cfg.unk_spk — the reference reserves index 0 and starts known speakers
    at 1, predict.py:141-142; here the extra row is appended at the end so
    known-speaker indices stay 0-based)."""
    if not cfg.unk_spk:
        raise ValueError("cfg.unk_spk is False: no unk row is reserved")
    return cfg.num_speakers


# memory_rows is re-exported from models/memory.py (imported above) — the
# single source of truth shared with create_train_state


def create_memory_state(key, cfg: Config, query_source: str = "speech",
                        steps_per_epoch: int = 1,
                        frame_hw: Tuple[int, int] = (48, 48),
                        video_trunk: str = "conv") -> MemoryTrainState:
    k_model, k_rng = jax.random.split(key)
    params = init_memory_model(k_model, cfg, query_source,
                               frame_hw=frame_hw, video_trunk=video_trunk)
    opt = make_optimizer(cfg, steps_per_epoch)
    # voiceprint dim = 2 * (E // 2) from the BiLSTM concat; image and
    # video queries both emit E-dim vectors
    dim = 2 * max(cfg.embedding_size // 2, 1) if query_source == "speech" \
        else cfg.embedding_size
    return MemoryTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt.init(params),
        memory=init_memory(memory_rows(cfg), dim), rng=k_rng)


def memory_train_loop(cfg: Config, make_batch: Callable, seed: int = 1,
                      max_epochs: Optional[int] = None,
                      epoch_size: Optional[int] = None,
                      query_source: str = "speech",
                      patience: int = 10,
                      dev_batch: Optional[dict] = None,
                      init_state=None,
                      frame_hw: Tuple[int, int] = (48, 48),
                      video_trunk: str = "conv",
                      metrics_path: Optional[str] = None):
    """Early-stopped training (nnet.py:149-172): per-epoch dev loss, stop
    after `patience` epochs without improvement, return the best params.

    make_batch(key) -> feats dict (mix_feas, mix_mag, spk_id, clean_feas or
    query_image, target_mag). `init_state` resumes from a restored
    TrainState instead of a fresh init."""
    import contextlib

    from dl4ss_tpu.parallel.mesh import mesh_for_cfg, shard_batch, shard_state

    epochs = max_epochs if max_epochs is not None else cfg.max_epoch
    esize = epoch_size if epoch_size is not None else cfg.epoch_size
    # the lr-schedule horizon (cosine/halving) must see the ACTUAL epoch
    # budget, not the preset default (same convention as train_loop)
    cfg = cfg.replace(max_epoch=epochs)
    state = (init_state if init_state is not None else
             create_memory_state(jax.random.PRNGKey(seed), cfg, query_source,
                                 esize, frame_hw=frame_hw,
                                 video_trunk=video_trunk))
    # DP mesh (same contract as train_loop, loop.py): batches shard over
    # `data`, params/memory replicate, XLA all-reduces the grads over ICI
    mesh = mesh_for_cfg(cfg)
    if mesh is not None:
        state = shard_state(state, mesh)
        if dev_batch is not None:
            dev_batch = shard_batch(dev_batch, mesh)
    train_step = make_memory_train_step(cfg, query_source, esize)
    eval_step = make_memory_eval_step(cfg, query_source)
    from dl4ss_tpu.train.metrics import MetricsWriter
    writer = MetricsWriter(metrics_path, echo=False)
    best = (float("inf"), state.params, state.memory)
    bad_epochs = 0
    history = []
    # resume accounting: a restored state's step counts toward the epoch
    # budget (same convention as train_loop, loop.py)
    start_epoch = int(state.step) // max(esize, 1)
    mesh_ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
                else contextlib.nullcontext())
    with mesh_ctx:
        m = {"loss": float("nan")}
        for epoch in range(start_epoch, epochs):
            for _ in range(esize):
                rng, sub = jax.random.split(state.rng)
                feats = make_batch(sub)
                if mesh is not None:
                    feats = shard_batch(feats, mesh)
                state, m = train_step(state._replace(rng=rng), feats)
            if dev_batch is not None:
                dev = float(eval_step(state.params, state.memory,
                                      dev_batch)["loss"])
                history.append(dev)
                writer.write("epoch", int(state.step), epoch=epoch,
                             dev_loss=dev,
                             train_loss=float(m["loss"]))
                if dev < best[0]:
                    best = (dev, state.params, state.memory)
                    bad_epochs = 0
                else:
                    bad_epochs += 1
                    if bad_epochs >= patience:
                        break
    writer.close()
    if dev_batch is not None and best[0] < float("inf"):
        state = state._replace(params=best[1], memory=best[2])
    return state, history
