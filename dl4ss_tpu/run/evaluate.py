"""Evaluation CLI — the rebuild of the *_eval / *_EvalVer / TestVer family.

Scores a split with SI-SDR (jitted, on device) and BSS-Eval SDR/SIR/SAR
(the reference's bss_test.cal protocol), optionally exporting wavs under the
batch_output naming contract.

    python -m dl4ss_tpu.run.evaluate --preset torch_multi \
        --checkpoint-dir ck/ --batches 10 --export-wavs batch_output
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.data.synth import featurize, sample_mixtures
from dl4ss_tpu.eval.bss_eval import bss_eval_sources
from dl4ss_tpu.eval.wav_export import export_batch_outputs
from dl4ss_tpu.run.common import add_common_args, build_cfg, load_bank
from dl4ss_tpu.train.checkpoint import restore_checkpoint
from dl4ss_tpu.train.state import create_train_state
from dl4ss_tpu.train.steps import make_eval_step


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--teacher-forced", action="store_true", default=False,
                   help="use ground-truth speakers (the reference's "
                        "Ground_truth eval); default: classifier top-k")
    p.add_argument("--bss-eval", action="store_true",
                   help="also run full BSS-Eval (SDR/SIR/SAR)")
    p.add_argument("--dedup", action="store_true",
                   help="speaker selection by embedding-cosine dedup "
                        "(the quchong evaluator, "
                        "main_run_multi_selfSS_quchong.py:398-445)")
    p.add_argument("--list-dir", default=None,
                   help="official wsj0-2mix list directory "
                        "(create-speaker-mixtures); evaluates the full "
                        "cv/tt protocol instead of sampled mixtures")
    p.add_argument("--wav-root", default=None,
                   help="root the list wav paths are relative to")
    p.add_argument("--mix-k", default="2",
                   help="mixture speaker count(s), comma-separated for "
                        "mixed-k pools (e.g. 1,2,3 — "
                        "predata_fromList_123.py)")
    p.add_argument("--complement-mask", action="store_true",
                   help="1-speaker complement trick: channel 2 mask becomes "
                        "1 - mask_1 when the classifier sees one speaker "
                        "(TestVer:473-476)")
    p.add_argument("--export-wavs", default=None,
                   help="directory for batch_output-style wav dumps")
    args = p.parse_args(argv)

    cfg = build_cfg(args)
    list_batches = None
    if args.list_dir:
        # the reference's eval protocol: mean SDR over the official cv/tt
        # lists (TDAA_beta/main_run_sstune_TestVer.py:30-31,513)
        from dl4ss_tpu.data.listsampler import Wsj0MixSampler
        mix_ks = tuple(int(x) for x in str(args.mix_k).split(","))
        sampler = Wsj0MixSampler(args.list_dir, args.wav_root or ".", cfg,
                                 args.split, mix_ks=mix_ks)
        cfg = cfg.replace(num_speakers=max(cfg.num_speakers,
                                           sampler.num_speakers))
        idx2spk = sampler.idx2spk
        list_batches = sampler.batches(cfg.batch_size_eval, shuffle=False)
        n_batches = sampler.num_batches(cfg.batch_size_eval)
    else:
        bank, cfg, idx2spk = load_bank(cfg, args)
        n_batches = args.batches
    if args.checkpoint_dir:
        # shapes must come from the TRAINING config, not the eval data:
        # a checkpoint trained with a different speaker inventory would
        # otherwise fail deep inside orbax (or silently mis-evaluate)
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            if args.list_dir and sampler.num_speakers > ck_cfg.num_speakers:
                raise SystemExit(
                    f"the lists reference {sampler.num_speakers} speakers "
                    f"but the checkpoint was trained with "
                    f"{ck_cfg.num_speakers}; evaluate with the training "
                    f"lists' vocabulary or a matching checkpoint")
            cfg = cfg.replace(num_speakers=ck_cfg.num_speakers)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
        print(f"restored step {int(state.step)} from {args.checkpoint_dir}")
    ev = make_eval_step(cfg)

    all_sisdr, all_sdr = [], []
    key = jax.random.PRNGKey(args.seed + 1)
    for b in range(n_batches):
        if list_batches is not None:
            batch = next(list_batches)
        else:
            key, sub = jax.random.split(key)
            batch = sample_mixtures(sub, bank, cfg, train=False)
        feats = featurize(batch, cfg)
        if args.dedup:
            from dl4ss_tpu.models.separator import classify_speakers
            from dl4ss_tpu.objectives.select import cosine_dedup_select
            probs = classify_speakers(state.params, feats["mix_feas"], cfg)
            sel = cosine_dedup_select(probs,
                                      state.params["embedding"]["table"],
                                      cfg.quchong_alpha, cfg.top_k)
            feats = dict(feats, spk_idx=sel)
            out = ev(state.params, feats, teacher_forced=True)
        else:
            out = ev(state.params, feats,
                     teacher_forced=args.teacher_forced,
                     complement_mask=args.complement_mask)
        all_sisdr.append(np.asarray(out["si_sdr"]))
        if args.bss_eval:
            res = bss_eval_sources(feats["source_wavs"],
                                   out["pred_wavs"], flen=512)
            # dead (zero-gain) channels in variable-speaker configs score
            # ~-120 dB against a silent reference — mask them out, mirroring
            # the SI-SDR path's channel_live handling (eval/sisdr.py:41-58)
            live = np.asarray(feats["channel_live"]).astype(bool)
            all_sdr.append(np.asarray(res.sdr)[live])
        if args.export_wavs and b == 0:
            names = [[idx2spk[int(s)] for s in row]
                     for row in np.asarray(batch.spk_idx)]
            n = export_batch_outputs(
                args.export_wavs, np.asarray(batch.mix_wav),
                np.asarray(out["pred_wavs"]),
                np.asarray(batch.source_wavs), names, cfg.frame_rate)
            print(f"exported {n} wavs to {args.export_wavs}/")

    sisdr = float(np.mean(np.concatenate(all_sisdr)))
    print(f"SI-SDR over {n_batches} batches: {sisdr:.2f} dB")
    if all_sdr:
        print(f"BSS-Eval SDR: {float(np.mean(np.concatenate(all_sdr))):.2f} dB")
    return sisdr


if __name__ == "__main__":
    main()
