"""Jitted training / evaluation steps — one per reference entry-point family.

Each `make_*_step(cfg, ...)` returns a pure function (state, batch) ->
(state, metrics) that is jit-compiled once; the whole reference training
loop body (Torch_multi/main_run.py:455-522 and TDAA's two-phase adversarial
loop, main_run_sstune_dis.py:596-718) becomes a single XLA program, with the
mixture synthesis and STFT featurization optionally fused in
(`make_fused_step`) so no host work happens between optimizer steps.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from dl4ss_tpu.config import Config
from dl4ss_tpu.data.synth import featurize, sample_mixtures
from dl4ss_tpu.models.classifier import apply_classifier
from dl4ss_tpu.models.discriminator import apply_discriminator
from dl4ss_tpu.models.separator import separate, separate_dense
from dl4ss_tpu.objectives.losses import (complex_mse_loss, gan_d_loss,
                                         gan_g_loss, mask_mse_loss,
                                         multilabel_softmargin_loss,
                                         sum_to_one_loss)
from dl4ss_tpu.objectives.pit import pit_loss, pit_permute
from dl4ss_tpu.ops.stft import istft_cfg
from dl4ss_tpu.ops.crm import unpack_ri
from dl4ss_tpu.eval.sisdr import si_sdr_pit
from dl4ss_tpu.train.state import TrainState, make_optimizer


def _gen_params(params):
    return {k: v for k, v in params.items() if k != "discriminator"}


def _compute_cast(params, feats, cfg: Config):
    """Mixed-precision training compute (cfg.compute_dtype='bfloat16'):
    model matmuls/activations run in bf16 on native MXU tiles while the
    differentiated master params, the optimizer state, and the loss math
    stay f32 (gradients flow back through the casts as f32). The cRM path
    is excluded — complex-mask phase math is precision-critical — and the
    DSP matmuls (ops/stft.py) always run f32 HIGHEST regardless."""
    if cfg.compute_dtype != "bfloat16" or cfg.is_complex_mask:
        return params, feats
    bf = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, params)
    feats = dict(feats, mix_feas=feats["mix_feas"].astype(bf))
    return params, feats


def _separation_loss(params, feats, cfg: Config):
    """Mask loss of the top-k path (identity or PIT assignment).

    cfg.ground_truth=True (the reference's default) teacher-forces the
    extraction channels with the true speakers; False selects them from the
    classifier like the reference's non-Ground_truth branch
    (main_run.py:465-474) — selection indices carry no gradient, so the
    classifier itself still trains only via make_classifier_step.
    """
    live = feats["channel_live"].astype(jnp.float32)
    spk_idx = feats["spk_idx"] if cfg.ground_truth else None
    params, cfeats = _compute_cast(params, feats, cfg)
    out = separate(params, cfeats["mix_feas"], cfg, spk_idx=spk_idx,
                   mix_ri=cfeats.get("mix_ri"))
    if cfg.loss_mode == "si_sdr":
        # Time-domain uPIT objective — a framework extension beyond the
        # reference's spectral MSE (which plateaus ~4 dB under the bank's
        # IRM-oracle bound, docs/BENCHMARKS.md): resynthesize in-graph
        # with the mixture phase (exactly make_eval_step's path, so train
        # loss == eval metric) and minimize negative live-weighted SI-SDR.
        # The whole chain (mask -> iSTFT matmuls -> SI-SDR) is one fused
        # differentiable XLA program; assignment is the PIT max, which
        # backprops through the selected permutation.
        pred = out.pred.astype(jnp.float32)
        if cfg.is_complex_mask:
            pred_spec = unpack_ri(pred)
        else:
            mix = unpack_ri(feats["mix_ri"])
            mag = jnp.abs(mix)
            phasor = mix / jnp.maximum(mag, 1e-8).astype(mix.dtype)
            pred_spec = pred * phasor[:, None]
        wavs = istft_cfg(pred_spec, cfg, length=cfg.max_len)
        scores, perm = si_sdr_pit(wavs, feats["source_wavs"], live=live)
        loss = -jnp.mean(scores)
        aux = {"mask_loss": loss, "out": out, "perm": perm}
        if cfg.sum_loss_weight > 0 and not cfg.is_complex_mask:
            sl = sum_to_one_loss(out.masks * live[..., None, None])
            loss = loss + cfg.sum_loss_weight * sl
            aux["sum_loss"] = sl
        return loss, aux
    if cfg.is_complex_mask:
        target = feats["src_ri"]
        pred = out.pred * live[..., None, None, None]
        if cfg.loss_mode == "pit":
            loss, perm = pit_loss(pred, target)
        else:
            loss = complex_mse_loss(pred, target, live)
            perm = None
    else:
        target = feats["src_feas"]
        pred = out.pred * live[..., None, None]
        if cfg.loss_mode == "pit":
            loss, perm = pit_loss(pred, target)
        else:
            loss = mask_mse_loss(pred, target, live)
            perm = None
    aux = {"mask_loss": loss, "out": out, "perm": perm}
    if cfg.sum_loss_weight > 0 and not cfg.is_complex_mask:
        sl = sum_to_one_loss(out.masks * live[..., None, None])
        loss = loss + cfg.sum_loss_weight * sl
        aux["sum_loss"] = sl
    return loss, aux


def make_train_step(cfg: Config, steps_per_epoch: int = 1) -> Callable:
    """The canonical joint trainer (A17/A18/A19; cRM variant B14 when
    cfg.is_complex_mask): teacher-forced speakers, mask MSE (+PIT), Adam."""
    if not cfg.ground_truth and cfg.loss_mode == "identity":
        raise ValueError(
            "ground_truth=False selects channels from the classifier, so "
            "channel k no longer aligns with source k — identity assignment "
            "is ill-posed in the top-k layout; use loss_mode='pit'/'si_sdr' "
            "(or the dense trainer, which assigns channels by speaker id).")
    opt = make_optimizer(cfg, steps_per_epoch)

    @jax.jit
    def step(state: TrainState, feats) -> tuple:
        def loss_fn(gp):
            params = dict(state.params, **gp)
            loss, aux = _separation_loss(params, feats, cfg)
            return loss, aux

        gp = _gen_params(state.params)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(gp)
        updates, opt_state = opt.update(grads, state.opt_state, gp)
        gp = optax.apply_updates(gp, updates)
        params = dict(state.params, **gp)
        metrics = {"loss": loss, "mask_loss": aux["mask_loss"],
                   "grad_norm": optax.global_norm(grads)}
        if "sum_loss" in aux:
            metrics["sum_loss"] = aux["sum_loss"]
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), metrics

    return step


def make_fused_step(cfg: Config, steps_per_epoch: int = 1,
                    noise_bank=None) -> Callable:
    """Synthesis + STFT + train in ONE jit: (state, bank) -> (state, metrics).

    This is the pipeline the reference runs as CPU generator -> numpy STFT ->
    H2D copy -> GPU step (SURVEY.md §3.1), collapsed into a single program.
    `noise_bank` (closure arg) enables the street-noise augment (A5).
    """
    inner = make_train_step(cfg, steps_per_epoch)

    @jax.jit
    def step(state: TrainState, bank) -> tuple:
        rng, sub = jax.random.split(state.rng)
        batch = sample_mixtures(sub, bank, cfg, noise_bank=noise_bank)
        if cfg.dp_size > 1:
            # pin the batch axis to the mesh's data axis so every downstream
            # op partitions over it and the grad psum rides ICI
            from jax.sharding import PartitionSpec as P
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, P("data")),
                batch)
        feats = featurize(batch, cfg)
        state, metrics = inner(state._replace(rng=rng), feats)
        return state, metrics

    return step


def make_dense_train_step(cfg: Config, steps_per_epoch: int = 1) -> Callable:
    """Exact-reference channel layout: every speaker owns a loss channel
    (main_run.py:473-506); targets scattered by speaker id, all-channel MSE,
    plus the sum-to-one term when cfg.sum_loss_weight > 0 (the reference's
    disabled-by-default 0.5-weighted loss, main_run.py:508-513). With
    cfg.is_complex_mask the channels carry the cRM complex-RI layout
    (main_run_sstune_cRM_EvalVer.py:552-568) scattered the same way."""
    opt = make_optimizer(cfg, steps_per_epoch)

    @jax.jit
    def step(state: TrainState, feats) -> tuple:
        b = feats["mix_feas"].shape[0]
        s = cfg.num_speakers
        live = feats["channel_live"].astype(jnp.float32)
        gate = jnp.zeros((b, s), jnp.float32)
        gate = gate.at[jnp.arange(b)[:, None], feats["spk_idx"]].max(live)
        t, f = feats["mix_feas"].shape[1:]
        rows = jnp.arange(b)[:, None]
        if cfg.is_complex_mask:
            target = jnp.zeros((b, s, t, f, 2), jnp.float32)
            target = target.at[rows, feats["spk_idx"]].add(
                feats["src_ri"] * live[..., None, None, None])
        else:
            target = jnp.zeros((b, s, t, f), jnp.float32)
            target = target.at[rows, feats["spk_idx"]].add(
                feats["src_feas"] * live[..., None, None])

        def loss_fn(gp):
            params = dict(state.params, **gp)
            params, cfeats = _compute_cast(params, feats, cfg)
            out = separate_dense(params, cfeats["mix_feas"], cfg, gate,
                                 mix_ri=cfeats.get("mix_ri"))
            if cfg.is_complex_mask:
                mask_l = complex_mse_loss(out.pred, target)
            else:
                mask_l = mask_mse_loss(out.pred, target)
            aux = {"mask_loss": mask_l}
            loss = mask_l
            if cfg.sum_loss_weight > 0 and not cfg.is_complex_mask:
                # masks are already zero-gated by separate_dense, so the
                # channel sum matches the reference's gated sum (:508-513)
                sl = sum_to_one_loss(out.masks)
                loss = loss + cfg.sum_loss_weight * sl
                aux["sum_loss"] = sl
            return loss, aux

        gp = _gen_params(state.params)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(gp)
        updates, opt_state = opt.update(grads, state.opt_state, gp)
        params = dict(state.params, **optax.apply_updates(gp, updates))
        metrics = {"loss": loss, "mask_loss": aux["mask_loss"]}
        if "sum_loss" in aux:
            metrics["sum_loss"] = aux["sum_loss"]
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), metrics

    return step


def make_classifier_step(cfg: Config, steps_per_epoch: int = 1) -> Callable:
    """The standalone classifier trainer (A26/B16):
    MultiLabelSoftMarginLoss on 'who is in the mixture'."""
    opt = make_optimizer(cfg, steps_per_epoch)

    @jax.jit
    def step(state: TrainState, feats) -> tuple:
        b = feats["mix_feas"].shape[0]
        target = jnp.zeros((b, cfg.num_speakers), jnp.float32)
        target = target.at[jnp.arange(b)[:, None], feats["spk_idx"]].max(
            feats["channel_live"].astype(jnp.float32))

        def loss_fn(gp):
            params = dict(state.params, **gp)
            params, cfeats = _compute_cast(params, feats, cfg)
            logits = apply_classifier(params["classifier"],
                                      cfeats["mix_feas"], cfg, logits=True)
            logits = logits.astype(jnp.float32)   # f32 loss math
            return multilabel_softmargin_loss(logits, target), logits

        gp = _gen_params(state.params)
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(gp)
        updates, opt_state = opt.update(grads, state.opt_state, gp)
        params = dict(state.params, **optax.apply_updates(gp, updates))
        probs = jax.nn.sigmoid(logits)
        pred = (probs > cfg.alpha).astype(jnp.float32)
        acc = jnp.mean((pred == target).astype(jnp.float32))
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), \
            {"loss": loss, "element_acc": acc}

    return step


def make_adversarial_step(cfg: Config, steps_per_epoch: int = 1) -> Callable:
    """TDAA's two-phase adversarial trainer (B9 dis-ss / B10 dis-sp):
    phase 1 trains D on real-vs-predicted spectrograms (MSE-GAN), phase 2
    trains the separator with mask MSE + sum-to-one + fooling term
    (main_run_sstune_dis.py:615-700). `real` defaults to the clean target
    spectra (dis-ss); pass feats["real_specs"] with different-utterance
    same-speaker spectra for dis-sp (predata_fromList_dis.py:37-66).
    """
    if not cfg.ground_truth and cfg.loss_mode == "identity":
        raise ValueError(
            "ground_truth=False selects channels from the classifier — "
            "identity assignment is ill-posed in the top-k layout; use "
            "loss_mode='pit'/'si_sdr' (same constraint as make_train_step)")
    g_opt = make_optimizer(cfg, steps_per_epoch)
    d_opt = make_optimizer(cfg, steps_per_epoch)
    # the adversarial generator loss carries its own sum-to-one term
    # (weight 0.5 per the reference, main_run_sstune_dis.py:683-700) —
    # strip it from _separation_loss so a nonzero cfg.sum_loss_weight
    # is not double-counted
    sum_w = cfg.sum_loss_weight if cfg.sum_loss_weight > 0 else 0.5
    sep_cfg = cfg.replace(sum_loss_weight=0.0)

    @jax.jit
    def step(state: TrainState, feats) -> tuple:
        live = feats["channel_live"].astype(jnp.float32)
        real = feats.get("real_specs", feats["src_feas"])

        # ---- phase 1: discriminator ----
        def d_loss_fn(d_params):
            params = dict(state.params, discriminator=d_params)
            # the generator forward here is stop-gradient sample
            # generation — run it in the compute dtype too
            gparams, cfeats = _compute_cast(params, feats, cfg)
            out = separate(dict(gparams, discriminator=d_params),
                           cfeats["mix_feas"], cfg,
                           spk_idx=feats["spk_idx"])
            pred = jax.lax.stop_gradient(
                (out.pred * live[..., None, None]).astype(jnp.float32))
            score_real = apply_discriminator(params["discriminator"], real, cfg)
            score_fake = apply_discriminator(params["discriminator"], pred, cfg)
            return gan_d_loss(score_real, score_fake), (score_real, score_fake)

        (d_loss, (sr, sf)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params["discriminator"])
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                              state.params["discriminator"])
        d_params = optax.apply_updates(state.params["discriminator"],
                                       d_updates)
        params = dict(state.params, discriminator=d_params)

        # ---- phase 2: generator ----
        def g_loss_fn(gp):
            p = dict(params, **gp)
            mask_l, aux = _separation_loss(p, feats, sep_cfg)
            pred = aux["out"].pred * live[..., None, None]
            score = apply_discriminator(
                jax.lax.stop_gradient(p["discriminator"]), pred, cfg)
            sum_l = sum_to_one_loss(aux["out"].masks * live[..., None, None])
            total = mask_l + sum_w * sum_l + gan_g_loss(score)
            return total, (mask_l, sum_l)

        gp = _gen_params(params)
        (g_loss, (mask_l, sum_l)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gp)
        g_updates, opt_state = g_opt.update(g_grads, state.opt_state, gp)
        params = dict(params, **optax.apply_updates(gp, g_updates))
        metrics = {"d_loss": d_loss, "g_loss": g_loss, "mask_loss": mask_l,
                   "sum_loss": sum_l,
                   "d_acc_real": jnp.mean((sr > 0.5).astype(jnp.float32)),
                   "d_acc_fake": jnp.mean((sf < 0.5).astype(jnp.float32))}
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state,
                              d_opt_state=d_opt_state), metrics

    return step


def make_recursive_eval_step(cfg: Config) -> Callable:
    """Recursive-extraction scoring (the RecuVer protocol): peel one speaker
    per step with `recursive_separate`, resynthesize each peeled spectrum
    with the mixture phase, and score permutation-resolved SI-SDR against
    the clean sources — the on-device equivalent of the reference's
    per-epoch `bss_test.cal('batch_output/', 2)` over the step wavs
    (main_run_multi_selfSS_recu.py:341-409).

    Also returns the per-step chosen speakers, from which the driver
    computes the speaker hit rate (how often the peel loop recovered the
    true mixed-speaker set).
    """
    from dl4ss_tpu.models.separator import recursive_separate

    @jax.jit
    def step(params, feats):
        # optional aim_pro roster: every peel step restricted to the
        # per-sample candidate pool (dict-key presence is trace-static)
        extracted, spks = recursive_separate(
            params, feats["mix_feas"], cfg,
            allowed=feats.get("candidates"))
        mix = unpack_ri(feats["mix_ri"])
        mag = jnp.abs(mix)
        phasor = mix / jnp.maximum(mag, 1e-8).astype(mix.dtype)
        wavs = istft_cfg(extracted * phasor[:, None], cfg, length=cfg.max_len)
        refs = feats["source_wavs"]
        live = feats.get("channel_live")
        k_ref, steps = refs.shape[1], wavs.shape[1]
        if steps < k_ref:
            # fewer peel steps than reference channels: pad silent estimate
            # channels (they score against the dead refs under PIT)
            wavs = jnp.pad(wavs, ((0, 0), (0, k_ref - steps), (0, 0)))
        elif steps > k_ref:
            # more steps than refs: pad the refs with dead channels so PIT
            # stays square; live-masking keeps them out of the mean
            refs = jnp.pad(refs, ((0, 0), (0, steps - k_ref), (0, 0)))
            pad_live = jnp.zeros((refs.shape[0], steps - k_ref), bool)
            live = (jnp.concatenate([live.astype(bool), pad_live], axis=1)
                    if live is not None else
                    jnp.concatenate([jnp.ones((refs.shape[0], k_ref), bool),
                                     pad_live], axis=1))
        scores, perm = si_sdr_pit(wavs, refs, live=live)
        return {"pred_wavs": wavs, "si_sdr": scores, "perm": perm,
                "spk_steps": spks}

    return step


def make_eval_step(cfg: Config) -> Callable:
    """Inference + on-device resynthesis + SI-SDR (the in-loop score the
    reference computes by wav files + bss_eval, TestVer:512-513).

    `complement_mask`: when the classifier finds only one speaker above
    alpha in a 2-mix eval, the second channel's mask becomes 1 - mask_1 —
    the reference's complement trick (main_run_sstune_TestVer.py:473-476).
    """

    @functools.partial(jax.jit,
                       static_argnames=("teacher_forced", "complement_mask"))
    def step(params, feats, teacher_forced: bool = True,
             complement_mask: bool = False):
        spk_idx = feats["spk_idx"] if teacher_forced else None
        # compute_dtype also governs inference (same bf16 forward the
        # throughput bench runs); masks are applied / scored in f32
        cparams, cfeats = _compute_cast(params, feats, cfg)
        out = separate(cparams, cfeats["mix_feas"], cfg, spk_idx=spk_idx,
                       mix_ri=cfeats.get("mix_ri"),
                       need_probs=complement_mask)
        out = out._replace(pred=out.pred.astype(jnp.float32),
                           masks=out.masks.astype(jnp.float32),
                           probs=out.probs.astype(jnp.float32))
        if complement_mask and not cfg.is_complex_mask and cfg.top_k == 2:
            one_spk = jnp.sum(out.probs > cfg.alpha, axis=-1) <= 1  # (B,)
            # complement the LINEAR multiplicand (matches _finish's choice)
            base = (jnp.abs(unpack_ri(feats["mix_ri"]))
                    if cfg.log_spectral else feats["mix_feas"])
            comp = (1.0 - out.masks[:, 0]) * base
            pred = out.pred.at[:, 1].set(
                jnp.where(one_spk[:, None, None], comp, out.pred[:, 1]))
            out = out._replace(pred=pred)
        if cfg.is_complex_mask:
            pred_spec = unpack_ri(out.pred)
        else:
            mix = unpack_ri(feats["mix_ri"])
            mag = jnp.abs(mix)
            phasor = mix / jnp.maximum(mag, 1e-8).astype(mix.dtype)
            pred_spec = out.pred * phasor[:, None]
        wavs = istft_cfg(pred_spec, cfg, length=cfg.max_len)
        scores, perm = si_sdr_pit(wavs, feats["source_wavs"],
                                  live=feats.get("channel_live"))
        return {"pred_wavs": wavs, "si_sdr": scores, "perm": perm,
                "probs": out.probs}

    return step
