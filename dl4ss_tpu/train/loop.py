"""The epoch/batch training driver.

Mirrors the reference main loops (MAX_EPOCH x EPOCH_SIZE with periodic
checkpointing and per-epoch SDR tracking, Torch_multi/main_run.py:453-527,
main_run_multi_selfSS.py:458-463) but with the whole step fused on device
and the data source a device-resident utterance bank.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.config import Config
from dl4ss_tpu.data.synth import featurize, make_synthetic_bank, sample_mixtures
from dl4ss_tpu.parallel.mesh import (mesh_for_cfg, replicated, shard_batch,
                                     shard_state)
from dl4ss_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from dl4ss_tpu.train.metrics import MetricsWriter
from dl4ss_tpu.train.state import create_train_state
from dl4ss_tpu.train.steps import (make_adversarial_step, make_classifier_step,
                                   make_dense_train_step, make_eval_step,
                                   make_fused_step, make_train_step)


def train_loop(cfg: Config, bank: Optional[jax.Array] = None,
               max_epochs: Optional[int] = None,
               epoch_size: Optional[int] = None,
               seed: int = 1,
               mode: str = "joint",
               metrics_path: Optional[str] = None,
               checkpoint_dir: Optional[str] = None,
               resume: bool = False,
               eval_every: int = 1,
               noise_bank: Optional[jax.Array] = None,
               dis_sp: bool = False,
               sampler=None,
               eval_batch=None,
               init_from: Optional[str] = None):
    """mode: joint | adversarial | classifier.

    `noise_bank` enables the street-noise augment (A5); `dis_sp` feeds the
    adversarial discriminator different-utterance same-speaker real examples
    (B10) instead of the clean targets (B9).

    `sampler` switches to the official list-driven recipe (a
    `Wsj0MixSampler`): each epoch is one shuffled, epoch-finite pass over
    the mixture lists with floor-division batch count — the reference's
    `yield False` loop (TDAA_beta/predata_fromList.py:80-233 feeding
    main_run_sstune*.py). `eval_batch` is the held-out dev MixtureBatch
    scored each epoch (defaults to the first unshuffled list batch).

    Returns (final state, list of per-epoch mean SI-SDR).
    Seeds follow the reference convention (np/torch/random seed 1,
    main_run.py:21-23): one integer seed drives bank, init, and sampling.
    """
    epochs = max_epochs if max_epochs is not None else cfg.max_epoch
    # horizon-aware schedules (cosine) must see the REAL epoch budget, not
    # the preset default the CLI overrode
    cfg = cfg.replace(max_epoch=epochs)
    if sampler is not None:
        epoch_size = sampler.num_batches(cfg.batch_size)
        if epoch_size == 0:
            raise ValueError(
                f"every mixture-list pool has fewer than batch_size="
                f"{cfg.batch_size} entries ({len(sampler.entries)} total) — "
                f"no full batch can be formed; lower batch_size or extend "
                f"the lists (floor-division batch semantics, "
                f"predata_fromList.py:90)")
    else:
        epoch_size = epoch_size if epoch_size is not None else cfg.epoch_size
    if bank is None and sampler is None:
        bank = jnp.asarray(make_synthetic_bank(
            seed, cfg.num_speakers, 4, cfg.max_len))
    key = jax.random.PRNGKey(seed)
    state = create_train_state(key, cfg, steps_per_epoch=epoch_size)
    if init_from:
        # warm start (fine-tune): donor weights, fresh optimizer/schedule —
        # the objective may have changed, so --resume's exact-tree restore
        # does not apply
        from dl4ss_tpu.train.checkpoint import init_params_from
        state = init_params_from(state, init_from)
    if resume and checkpoint_dir:
        # a pre-created directory (vocab.json/cfg.json sidecars) is not a
        # checkpoint — only resume when a saved step actually exists
        from dl4ss_tpu.train.checkpoint import latest_step
        if latest_step(checkpoint_dir) is not None:
            state = restore_checkpoint(checkpoint_dir, state)

    # ---- device mesh (SURVEY §2.2): batch over `data`, embedding over
    # `model`, gradient all-reduce inserted by XLA and riding ICI ----
    mesh = mesh_for_cfg(cfg)
    if mesh is not None:
        state = shard_state(state, mesh)
        if bank is not None:
            bank = jax.device_put(bank, replicated(mesh))
        if noise_bank is not None:
            noise_bank = jax.device_put(noise_bank, replicated(mesh))

    writer = MetricsWriter(metrics_path)
    if sampler is not None:
        # list-driven training: every step consumes the next list batch
        if dis_sp and mode != "adversarial":
            raise ValueError("--dis-sp only applies to adversarial mode")
        step_fn = {"joint": make_train_step,
                   "dense": make_dense_train_step,
                   "adversarial": make_adversarial_step,
                   "classifier": make_classifier_step}[mode](cfg, epoch_size)
        sp_rows = sp_counts = None
        if dis_sp:
            # same-speaker real pool drawn from the list vocabulary
            # (B10, predata_fromList_dis.py:37-66)
            from dl4ss_tpu.data.listsampler import list_same_speaker_real_specs
            sp_rows = jnp.asarray(sampler.spk_rows)
            sp_counts = jnp.asarray(sampler.spk_counts)

        def run_epoch(state, epoch):
            last = {}
            for i, batch in enumerate(sampler.batches(
                    cfg.batch_size, shuffle=True,
                    seed=seed + 7919 * (epoch + 1),
                    augment=cfg.augment_data)):
                feats = featurize(batch, cfg)
                if dis_sp:
                    # host-side epoch/batch fold — no device sync per batch
                    k_sp = jax.random.fold_in(
                        jax.random.PRNGKey(seed + 104729),
                        epoch * 1_000_003 + i)
                    feats = dict(feats, real_specs=list_same_speaker_real_specs(
                        k_sp, batch, sampler.device_bank(), sp_rows,
                        sp_counts, cfg))
                if mesh is not None:
                    feats = shard_batch(feats, mesh)
                state, last = step_fn(state, feats)
            return state, last

        if eval_batch is None and eval_every:
            # skip the decode when per-epoch eval is off (eval_every=0,
            # e.g. run.classify --list-dir) — it would never be used
            eval_batch = next(sampler.batches(cfg.batch_size, shuffle=False))

        def eval_batch_fn(key):
            return eval_batch
    else:
        if mode == "joint":
            fused = make_fused_step(cfg, epoch_size, noise_bank=noise_bank)

            def run_one(state):
                return fused(state, bank)
        else:
            step_fn = {"dense": make_dense_train_step,
                       "adversarial": make_adversarial_step,
                       "classifier": make_classifier_step}[mode](
                           cfg, epoch_size)

            def run_one(state):
                rng, sub = jax.random.split(state.rng)
                k_mix, k_sp = jax.random.split(sub)
                batch = sample_mixtures(k_mix, bank, cfg,
                                        noise_bank=noise_bank)
                feats = featurize(batch, cfg)
                if dis_sp and mode == "adversarial":
                    from dl4ss_tpu.data.synth import same_speaker_real_specs
                    feats = dict(feats, real_specs=same_speaker_real_specs(
                        k_sp, batch, bank, cfg))
                if mesh is not None:
                    feats = shard_batch(feats, mesh)
                return step_fn(state._replace(rng=rng), feats)

        def run_epoch(state, epoch):
            last = {}
            for _ in range(epoch_size):
                state, last = run_one(state)
            return state, last

        def eval_batch_fn(key):
            return sample_mixtures(key, bank, cfg, train=False)

    eval_step = make_eval_step(cfg)
    sdr_history = []
    start_epoch = int(state.step) // max(epoch_size, 1)
    mesh_ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
                else contextlib.nullcontext())
    with mesh_ctx:
        return _epoch_loop(cfg, state, epochs, start_epoch, run_epoch,
                           eval_batch_fn, eval_step, sdr_history, writer,
                           checkpoint_dir, eval_every)


def _epoch_loop(cfg, state, epochs, start_epoch, run_epoch, eval_batch_fn,
                eval_step, sdr_history, writer, checkpoint_dir, eval_every):
    for epoch in range(start_epoch, epochs):
        state, last_metrics = run_epoch(state, epoch)
        if eval_every and (epoch + 1) % eval_every == 0:
            rng, sub = jax.random.split(state.rng)
            state = state._replace(rng=rng)
            batch = eval_batch_fn(sub)
            feats = featurize(batch, cfg)
            ev = eval_step(state.params, feats)
            sdr = float(jnp.mean(ev["si_sdr"]))
            sdr_history.append(sdr)
            if cfg.out_sep_result:
                # per-epoch separated-wav dump (Out_Sep_Result,
                # main_run.py:515-516) under the batch_output contract
                from dl4ss_tpu.eval.wav_export import export_batch_outputs
                names = [[f"spk{int(s):03d}" for s in row]
                         for row in np.asarray(batch.spk_idx)]
                export_batch_outputs(
                    cfg.output_dir, np.asarray(batch.mix_wav),
                    np.asarray(ev["pred_wavs"]),
                    np.asarray(batch.source_wavs), names, cfg.frame_rate)
            writer.write("epoch", int(state.step), epoch=epoch, si_sdr=sdr,
                         **{k: v for k, v in last_metrics.items()})
        else:
            writer.write("epoch", int(state.step), epoch=epoch,
                         **{k: v for k, v in last_metrics.items()})
        if checkpoint_dir and (epoch + 1) % cfg.checkpoint_every_epochs == 0:
            save_checkpoint(checkpoint_dir, state, cfg=cfg)
    writer.close()
    return state, sdr_history
