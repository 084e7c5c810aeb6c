"""Classifier CLI — the rebuild of test_multi_labels_speech(.py/_metrics.py).

Trains the multi-label "who is in the mixture" classifier alone and reports
the reference's metric suite: element/sample accuracy, top-k recall
(the '80% top-3 recall' number), hamming loss, micro/macro P/R/F1.

    python -m dl4ss_tpu.run.classify --preset torch_multi --epochs 5
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from dl4ss_tpu.data.synth import featurize, sample_mixtures
from dl4ss_tpu.eval.classifier_metrics import (multilabel_accuracy,
                                               multilabel_prf, topk_recall)
from dl4ss_tpu.models.classifier import apply_classifier
from dl4ss_tpu.run.common import add_common_args, build_cfg, load_bank
from dl4ss_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from dl4ss_tpu.train.loop import train_loop


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--epoch-size", type=int, default=None)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--list-dir", default=None,
                   help="official wsj0-mix list directory: train from the "
                        "tr lists and report the metric suite over the cv "
                        "(or tt) lists under the TRAIN vocabulary — the "
                        "list-fed classifier fork "
                        "(TDAA_beta/test_multi_labels_speech.py)")
    p.add_argument("--wav-root", default=None,
                   help="root the list wav paths are relative to")
    p.add_argument("--eval-split", default="valid",
                   help="list mode: split scored by the metric report "
                        "(valid | test | train)")
    p.add_argument("--mix-k", default="2",
                   help="mixture speaker count(s), comma-separated")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training: restore --checkpoint-dir and report "
                        "the metric suite on the eval split (the "
                        "test_multi_labels_speech_metrics.py eval fork)")
    args = p.parse_args(argv)
    if args.eval_only and not args.checkpoint_dir:
        raise SystemExit("--eval-only needs --checkpoint-dir")

    cfg = build_cfg(args)
    if args.eval_only:
        # state shapes AND the optimizer-state pytree (lr_schedule changes
        # it) must come from the TRAINING config; CLI overrides win on top
        # — the same ck-config adoption as run.evaluate/run.separate
        from dl4ss_tpu.run.common import apply_overrides
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            cfg = apply_overrides(ck_cfg, args)
    sampler = eval_iter = None
    if args.list_dir:
        import json
        import os
        from dl4ss_tpu.data.listsampler import Wsj0MixSampler
        from dl4ss_tpu.data.wsj0mix import mix_list_name
        root = args.wav_root or "."
        mix_ks = tuple(int(x) for x in str(args.mix_k).split(","))
        # metric split under the TRAIN vocabulary (speaker -> label column
        # is an artifact of the tr lists; unknown cv/tt speakers would
        # otherwise re-number the label space). Eval-only takes it from the
        # vocab.json sidecar run.train records beside the checkpoints —
        # both for correctness (the eval split's lists could re-number a
        # same-size speaker set without any shape error) and to skip
        # decoding the whole train bank just to derive a dict.
        spk2idx = None
        vp = (os.path.join(args.checkpoint_dir, "vocab.json")
              if args.checkpoint_dir else "")
        if args.eval_only and os.path.exists(vp):
            with open(vp) as fh:
                spk2idx = json.load(fh)
            # one source of truth for the classifier shape: the checkpoint's
            # training config. A vocab.json of a different size means the
            # sidecars are mismatched — restoring would fail with a raw
            # shape error, so say what is actually wrong instead.
            if ck_cfg is not None and len(spk2idx) != ck_cfg.num_speakers:
                raise SystemExit(
                    f"vocab.json lists {len(spk2idx)} speakers but the "
                    f"checkpoint config was trained with "
                    f"{ck_cfg.num_speakers}; the checkpoint sidecars are "
                    f"inconsistent — re-run training so run.train rewrites "
                    f"both, or point at the matching checkpoint dir")
            if ck_cfg is None:
                cfg = cfg.replace(num_speakers=len(spk2idx))
        else:
            sampler = Wsj0MixSampler(args.list_dir, root, cfg, args.split,
                                     mix_ks=mix_ks)
            cfg = cfg.replace(num_speakers=sampler.num_speakers)
            spk2idx = sampler.spk2idx
        bank = None
        ev_split = args.eval_split
        if not any(os.path.exists(os.path.join(args.list_dir,
                                               mix_list_name(k, ev_split)))
                   for k in mix_ks):
            ev_split = args.split
        ev_sampler = Wsj0MixSampler(args.list_dir, root, cfg, ev_split,
                                    mix_ks=mix_ks, spk2idx=spk2idx)
        n_ev = min(args.eval_batches,
                   ev_sampler.num_batches(cfg.batch_size_eval))
        if n_ev == 0:
            raise SystemExit(
                f"the {ev_split} lists form no full batch at "
                f"batch_size_eval={cfg.batch_size_eval}")
        eval_iter = ev_sampler.batches(cfg.batch_size_eval, shuffle=False)
        args.eval_batches = n_ev
    else:
        bank, cfg, _ = load_bank(cfg, args)
    if args.eval_only:
        from dl4ss_tpu.train.state import create_train_state
        state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
        state = restore_checkpoint(args.checkpoint_dir, state)
        print(f"restored step {int(state.step)} from {args.checkpoint_dir}")
    else:
        state, _ = train_loop(cfg, bank=bank, max_epochs=args.epochs,
                              epoch_size=args.epoch_size, seed=args.seed,
                              mode="classifier", metrics_path=args.metrics,
                              checkpoint_dir=args.checkpoint_dir,
                              eval_every=0, sampler=sampler)

    # held-out metrics (the test_multi_labels_speech_metrics.py report)
    probs_all, targets_all = [], []
    key = jax.random.PRNGKey(args.seed + 7)
    infer = jax.jit(lambda pr, f: apply_classifier(pr["classifier"], f, cfg))
    for _ in range(args.eval_batches):
        if eval_iter is not None:
            batch = next(eval_iter)
        else:
            key, sub = jax.random.split(key)
            batch = sample_mixtures(sub, bank, cfg, train=False)
        feats = featurize(batch, cfg)
        probs = np.asarray(infer(state.params, feats["mix_feas"]))
        target = np.zeros_like(probs)
        idx = np.asarray(batch.spk_idx)
        live = np.asarray(batch.gains > 0)
        for b in range(idx.shape[0]):
            target[b, idx[b][live[b]]] = 1.0
        probs_all.append(probs)
        targets_all.append(target)
    probs = np.concatenate(probs_all)
    targets = np.concatenate(targets_all)
    report = {**multilabel_accuracy(probs, targets, cfg.alpha),
              **multilabel_prf(probs, targets, cfg.alpha),
              f"top{args.topk}_recall": topk_recall(probs, targets, args.topk)}
    for k, v in report.items():
        print(f"{k}: {v:.4f}")
    return report


if __name__ == "__main__":
    main()
