"""Query-conditioned separation training (audio-visual / image variants).

The reference conditions the mask head on modality queries in two places:
VIDEO_QUERY's lip-frame encoder feeding the attention query
(Torch_multi/main_run.py:226-256 — the GRID audio-visual configuration) and
the MNIST image encoder of the Multi_modal stack. This trainer runs the
separator with `queries` produced by the video/image encoder per extraction
channel, trained jointly with the encoder/mask-head on the mask MSE plus the
reference's auxiliary speaker-classification loss on the query logits
(CrossEntropyLoss at main_run.py:451).

Batch contract (feats):
  mix_feas (B,T,F), src_feas (B,K,T,F), channel_live (B,K), spk_idx (B,K),
  query_video (B,K,Tf,H,W,3)  or  query_image (B,K,28,28,1)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.query import (apply_image_query, apply_video_query,
                                    init_image_query, init_video_query)
from dl4ss_tpu.models.separator import init_separator, separate
from dl4ss_tpu.objectives.losses import mask_mse_loss
from dl4ss_tpu.objectives.pit import pit_loss
from dl4ss_tpu.train.state import TrainState, make_optimizer


def init_query_separator(key, cfg: Config, query_source: str = "video",
                         video_trunk: str = "conv",
                         frame_hw=(48, 48)):
    k1, k2 = jax.random.split(key)
    params = init_separator(k1, cfg)
    if query_source == "video":
        params["video_query"] = init_video_query(
            k2, cfg, frame_hw=frame_hw, trunk=video_trunk)
    else:
        params["image_query"] = init_image_query(k2, cfg)
    return params


def _queries_and_logits(params, feats, cfg: Config, query_source: str):
    if query_source == "video":
        qv = feats["query_video"]                       # (B,K,Tf,H,W,3)
        b, k = qv.shape[:2]
        logits, q = apply_video_query(params["video_query"],
                                      qv.reshape((b * k,) + qv.shape[2:]))
        return (q.reshape(b, k, -1),
                logits.reshape(b, k, -1))
    qi = feats["query_image"]                           # (B,K,H,W,C)
    b, k = qi.shape[:2]
    q = apply_image_query(params["image_query"],
                          qi.reshape((b * k,) + qi.shape[2:]))
    return q.reshape(b, k, -1), None


def make_query_train_step(cfg: Config, query_source: str = "video",
                          steps_per_epoch: int = 1,
                          aux_class_weight: float = 1.0) -> Callable:
    opt = make_optimizer(cfg, steps_per_epoch)

    @jax.jit
    def step(state: TrainState, feats):
        live = feats["channel_live"].astype(jnp.float32)

        def loss_fn(params):
            queries, logits = _queries_and_logits(params, feats, cfg,
                                                  query_source)
            out = separate(params, feats["mix_feas"], cfg, queries=queries,
                           mix_ri=feats.get("mix_ri"))
            pred = out.pred * live[..., None, None]
            if cfg.loss_mode == "si_sdr":
                # time-domain fine-tune through the mixture-phase iSTFT —
                # the separator's +0.43..+0.85 dB lever (docs/BENCHMARKS.md)
                # applied to the query-conditioned generation; channels are
                # query-designated, so the assignment is identity (each
                # channel's query IS its speaker), not PIT
                from dl4ss_tpu.eval.sisdr import si_sdr
                from dl4ss_tpu.ops.crm import unpack_ri
                from dl4ss_tpu.ops.stft import istft_cfg
                mix = unpack_ri(feats["mix_ri"])
                phasor = mix / jnp.maximum(jnp.abs(mix),
                                           1e-8).astype(mix.dtype)
                wavs = istft_cfg(pred.astype(jnp.float32) * phasor[:, None],
                                 cfg, length=cfg.max_len)
                scores = si_sdr(wavs, feats["source_wavs"])
                denom = jnp.maximum(jnp.sum(live), 1.0)
                mask_l = -jnp.sum(scores * live) / denom
            elif cfg.loss_mode == "pit":
                mask_l, _ = pit_loss(pred, feats["src_feas"])
            else:
                mask_l = mask_mse_loss(pred, feats["src_feas"], live)
            total = mask_l
            aux = {"mask_loss": mask_l}
            if logits is not None and aux_class_weight > 0:
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, feats["spk_idx"])
                ce = jnp.mean(ce * live) if live is not None else jnp.mean(ce)
                total = total + aux_class_weight * ce
                aux["query_ce"] = ce
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), metrics

    return step


def create_query_state(key, cfg: Config, query_source: str = "video",
                       steps_per_epoch: int = 1, video_trunk: str = "conv",
                       frame_hw=(48, 48)) -> TrainState:
    k_model, k_rng = jax.random.split(key)
    params = init_query_separator(k_model, cfg, query_source, video_trunk,
                                  frame_hw)
    opt = make_optimizer(cfg, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params), memory=None, rng=k_rng)


def make_query_eval_step(cfg: Config, query_source: str = "video") -> Callable:
    """Query-conditioned inference + resynthesis + SI-SDR: the separation is
    driven by the modality query alone (no classifier / speaker-id path),
    scored like make_eval_step (mix-phase iSTFT, live-channel PIT SI-SDR)."""
    from dl4ss_tpu.eval.sisdr import si_sdr_pit
    from dl4ss_tpu.ops.crm import unpack_ri
    from dl4ss_tpu.ops.stft import istft_cfg

    @jax.jit
    def step(params, feats):
        queries, _ = _queries_and_logits(params, feats, cfg, query_source)
        out = separate(params, feats["mix_feas"], cfg, queries=queries,
                       mix_ri=feats.get("mix_ri"))
        mix = unpack_ri(feats["mix_ri"])
        mag = jnp.abs(mix)
        phasor = mix / jnp.maximum(mag, 1e-8).astype(mix.dtype)
        wavs = istft_cfg(out.pred * phasor[:, None], cfg,
                         length=cfg.max_len)
        scores, perm = si_sdr_pit(wavs, feats["source_wavs"],
                                  live=feats.get("channel_live"))
        return {"pred_wavs": wavs, "si_sdr": scores, "perm": perm}

    return step


def query_train_loop(cfg: Config, make_batch: Callable, seed: int = 1,
                     max_epochs=None, epoch_size=None,
                     query_source: str = "video", video_trunk: str = "conv",
                     frame_hw=(48, 48), metrics_path=None,
                     checkpoint_dir=None, resume: bool = False,
                     dev_batch=None, eval_every: int = 1,
                     init_from=None):
    """Epoch driver for the audio-visual / image-query configurations
    (Torch_multi/main_run.py:226-256 video phase; Multi_modal nnet.py).

    make_batch(key) -> feats with mix_feas/src_feas/channel_live/spk_idx/
    mix_ri/source_wavs plus query_video or query_image. Returns
    (state, per-epoch dev SI-SDR list)."""
    import os

    from dl4ss_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from dl4ss_tpu.train.metrics import MetricsWriter

    import contextlib

    from dl4ss_tpu.parallel.mesh import mesh_for_cfg, shard_batch, shard_state

    epochs = max_epochs if max_epochs is not None else cfg.max_epoch
    esize = epoch_size if epoch_size is not None else cfg.epoch_size
    # the lr-schedule horizon (cosine/halving) must see the ACTUAL epoch
    # budget, not the preset default (same convention as train_loop)
    cfg = cfg.replace(max_epoch=epochs)
    state = create_query_state(jax.random.PRNGKey(seed), cfg, query_source,
                               esize, video_trunk, frame_hw)
    if init_from:
        # warm start into a fresh optimizer (the MSE -> si_sdr fine-tune
        # pattern, same contract as train_loop's init_from)
        from dl4ss_tpu.train.checkpoint import init_params_from
        state = init_params_from(state, init_from)
    elif resume and checkpoint_dir:
        from dl4ss_tpu.train.checkpoint import latest_step
        if latest_step(checkpoint_dir) is not None:
            state = restore_checkpoint(checkpoint_dir, state)
    # DP mesh (same contract as train_loop, loop.py): batches shard over
    # `data`, params replicate, grad all-reduce inserted by XLA
    mesh = mesh_for_cfg(cfg)
    if mesh is not None:
        state = shard_state(state, mesh)
        if dev_batch is not None:
            dev_batch = shard_batch(dev_batch, mesh)
    train_step = make_query_train_step(cfg, query_source, esize)
    eval_step = make_query_eval_step(cfg, query_source)
    writer = MetricsWriter(metrics_path)
    sdr_history = []
    start_epoch = int(state.step) // max(esize, 1)
    metrics = {}
    saved_step = -1
    mesh_ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
                else contextlib.nullcontext())
    with mesh_ctx:
        for epoch in range(start_epoch, epochs):
            for _ in range(esize):
                rng, sub = jax.random.split(state.rng)
                feats = make_batch(sub)
                if mesh is not None:
                    feats = shard_batch(feats, mesh)
                state, metrics = train_step(state._replace(rng=rng), feats)
            row = {k: v for k, v in metrics.items()}
            if dev_batch is not None and eval_every \
                    and (epoch + 1) % eval_every == 0:
                ev = eval_step(state.params, dev_batch)
                sdr = float(jnp.mean(ev["si_sdr"]))
                sdr_history.append(sdr)
                row["si_sdr"] = sdr
            writer.write("epoch", int(state.step), epoch=epoch, **row)
            if checkpoint_dir \
                    and (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                saved_step = save_checkpoint(checkpoint_dir, state, cfg=cfg)
    if checkpoint_dir and int(state.step) != saved_step:
        save_checkpoint(checkpoint_dir, state, cfg=cfg)
    writer.close()
    return state, sdr_history
