"""Training CLI — the rebuild of the `main_run*` trainer family.

    python -m dl4ss_tpu.run.train --preset torch_multi --epochs 10
    python -m dl4ss_tpu.run.train --preset tdaa --mode adversarial
    python -m dl4ss_tpu.run.train --preset torch_multi --mode classifier
"""

from __future__ import annotations

import argparse

from dl4ss_tpu.run.common import add_common_args, build_cfg, load_bank
from dl4ss_tpu.train.loop import train_loop


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--mode", default="joint",
                   choices=["joint", "dense", "adversarial", "classifier",
                            "memory", "video", "image-query"],
                   help="dense = exact-reference all-speaker channel layout "
                        "(Torch_multi/main_run.py:473-506); video = GRID "
                        "audio-visual query training (main_run.py:226-256); "
                        "image-query = MNIST-digit-conditioned separation "
                        "(Multi_modal)")
    p.add_argument("--query-source", default="speech",
                   choices=["speech", "image", "video"],
                   help="memory mode: voiceprint (Cocktail), MNIST digit "
                        "(Multi_modal), or lip-frame query written into "
                        "the memory's VIDEO slot (MEMORY.add_video, "
                        "Torch_multi/main_run.py:142-171)")
    p.add_argument("--video-root", default=None,
                   help="video mode: GRID-style speaker tree of lip clips "
                        "(root/<speaker>/<clip dir of frames or video file>); "
                        "synthetic speaker-keyed frames if omitted")
    p.add_argument("--frames", type=int, default=4,
                   help="video mode: frames per clip (static T)")
    p.add_argument("--frame-size", type=int, default=48,
                   help="video mode: square frame edge in pixels")
    p.add_argument("--video-trunk", default="conv",
                   choices=["conv", "inception"],
                   help="video mode: per-frame feature trunk; 'inception' "
                        "reproduces the reference's frozen Inception-v3 "
                        "(needs 299x299 frames)")
    p.add_argument("--patience", type=int, default=10,
                   help="memory mode: dev-loss early-stop patience "
                        "(nnet.py:159-172)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--epoch-size", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from", default=None,
                   help="warm-start fine-tune: load model params from this "
                        "checkpoint dir into a FRESH optimizer (vs --resume, "
                        "which restores the exact state tree) — e.g. "
                        "spectral-MSE pretrain then --set loss_mode=si_sdr")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--dis-sp", action="store_true",
                   help="adversarial 'real' pool = same-speaker different "
                        "utterances (the dis-sp trainer, B10)")
    p.add_argument("--noise-wavs", default=None,
                   help="directory of background-noise wavs (A5 street noise)")
    p.add_argument("--list-dir", default=None,
                   help="official wsj0-mix list directory "
                        "(create-speaker-mixtures): train epoch-finite from "
                        "mix_{k}_spk_tr.txt, the reference's list recipe "
                        "(TDAA_beta/predata_fromList.py:80-233)")
    p.add_argument("--file-lists", default=None, metavar="DIR",
                   help="memory mode: Cocktail wavlist directory "
                        "(generate_file_lists output) — the training bank "
                        "is built from train_wavlist.txt's `wav spk` rows, "
                        "the corpus the reference's generator mixes from "
                        "(prepare_data.py:104-155)")
    p.add_argument("--wav-root", default=None,
                   help="root the list wav paths are relative to")
    p.add_argument("--mix-k", default="2",
                   help="mixture speaker count(s), comma-separated for "
                        "mixed-k per-pool training (e.g. 1,2,3 — "
                        "predata_fromList_123.py:45-110)")
    p.add_argument("--dp", default=None,
                   help="data-parallel mesh extent: an integer or 'auto' "
                        "(all devices / --mp); batches shard over the mesh's "
                        "data axis, gradients all-reduce over ICI")
    p.add_argument("--mp", type=int, default=None,
                   help="model-parallel mesh extent (embedding table "
                        "row-sharded when it divides num_speakers)")
    args = p.parse_args(argv)

    cfg = build_cfg(args)
    ck_cfg = None
    if args.resume and args.checkpoint_dir:
        # resume must rebuild the EXACT state shapes the checkpoint was
        # trained with; runtime overrides (--set, --batch-size) still win
        from dl4ss_tpu.run.common import apply_overrides
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            cfg = apply_overrides(ck_cfg, args)
            print(f"resuming under the checkpoint's config "
                  f"(preset {ck_cfg.name!r})")
    if args.dp is not None or args.mp is not None:
        import jax
        mp = args.mp if args.mp is not None else max(cfg.mp_size, 1)
        dp = (len(jax.devices()) // mp if args.dp in (None, "auto")
              else int(args.dp))
        cfg = cfg.replace(dp_size=max(dp, 1), mp_size=mp)
    # the trainer family fixes the query modality: rebind cfg.mode and
    # re-check the dataset against it (MODE 1-4, Torch_multi/config.py:66-76)
    want_mode = {"video": "video", "image-query": "image"}.get(args.mode)
    if args.mode == "memory":
        want_mode = {"image": "image", "video": "video"}.get(
            args.query_source, "speech")
    if want_mode is not None and cfg.mode != want_mode:
        cfg = cfg.replace(mode=want_mode).validate()
    if args.mode == "adversarial":
        cfg = cfg.replace(use_discriminator=True)
    sampler = eval_batch = None
    if args.list_dir:
        # official list-driven training (the headline wsj0-2mix recipe);
        # the dev batch comes from the cv list under the TRAIN vocabulary
        import os
        from dl4ss_tpu.data.listsampler import Wsj0MixSampler
        from dl4ss_tpu.data.wsj0mix import mix_list_name
        if args.mode in ("memory", "video", "image-query"):
            raise SystemExit(
                f"--list-dir is not supported in {args.mode} mode")
        root = args.wav_root or "."
        mix_ks = tuple(int(x) for x in str(args.mix_k).split(","))
        sampler = Wsj0MixSampler(args.list_dir, root, cfg, args.split,
                                 mix_ks=mix_ks)
        cfg = cfg.replace(num_speakers=sampler.num_speakers)
        if args.checkpoint_dir:
            # record the training vocabulary beside the checkpoints so
            # evaluators index the same embedding rows (speaker -> row is
            # an artifact of the TRAIN lists, not of the eval lists)
            import json
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            with open(os.path.join(args.checkpoint_dir, "vocab.json"),
                      "w") as fh:
                json.dump(sampler.spk2idx, fh)
        if any(os.path.exists(os.path.join(args.list_dir,
                                           mix_list_name(k, "valid")))
               for k in mix_ks):
            dev = Wsj0MixSampler(args.list_dir, root, cfg, "valid",
                                 mix_ks=mix_ks,
                                 spk2idx=sampler.spk2idx)
            if dev.num_batches(cfg.batch_size) >= 1:
                eval_batch = next(dev.batches(cfg.batch_size, shuffle=False))
        bank = None
    elif args.file_lists:
        if args.mode != "memory":
            raise SystemExit("--file-lists is the Cocktail memory-mode "
                             "protocol (run.train --mode memory); separator "
                             "training uses --list-dir / --data-root")
        import json
        import os

        import jax.numpy as jnp
        from dl4ss_tpu.data.wavlist import train_bank_from_wavlist
        bank_np, spk2idx = train_bank_from_wavlist(
            os.path.join(args.file_lists, "train_wavlist.txt"),
            args.wav_root or ".", cfg, utts_per_speaker=args.utts)
        bank = jnp.asarray(bank_np)
        cfg = cfg.replace(num_speakers=len(spk2idx))
        if args.checkpoint_dir:
            # record the training vocabulary beside the checkpoints, same
            # contract as the list-driven separator path — the wavlist
            # evaluator indexes memory rows through it
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            with open(os.path.join(args.checkpoint_dir, "vocab.json"),
                      "w") as fh:
                json.dump(spk2idx, fh)
    else:
        bank, cfg, idx2spk = load_bank(cfg, args)
        if args.mode == "memory" and args.checkpoint_dir:
            # memory-mode evaluators (incl. the wavlist protocol) need the
            # speaker -> memory-row mapping of THIS training bank
            import json
            import os
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            with open(os.path.join(args.checkpoint_dir, "vocab.json"),
                      "w") as fh:
                json.dump({s: i for i, s in idx2spk.items()}, fh)
    noise_bank = None
    if args.noise_wavs:
        if args.list_dir or args.mode in ("memory", "video", "image-query"):
            raise SystemExit(
                "--noise-wavs is the bank-mode street-noise augment "
                "(sample_mixtures, A5) — the list-driven and memory/query "
                "paths do not mix noise; drop the flag or use bank mode")
        from dl4ss_tpu.run.common import load_noise_bank
        noise_bank = load_noise_bank(args.noise_wavs, cfg)
        cfg = cfg.replace(add_bgd_noise=True)
    if (args.resume and args.checkpoint_dir and ck_cfg is not None
            and cfg.num_speakers != ck_cfg.num_speakers):
        raise SystemExit(
            f"--resume: the data source has {cfg.num_speakers} speakers "
            f"but the checkpoint was trained with {ck_cfg.num_speakers}; "
            f"resume with the original data/lists")
    if args.init_from and args.resume:
        raise SystemExit("--init-from (warm start, fresh optimizer) and "
                         "--resume (exact state restore) conflict; "
                         "pick one")
    print(cfg.log_config())
    if args.mode == "memory":
        return _run_memory_mode(cfg, bank, args)
    if args.mode in ("video", "image-query"):
        return _run_query_mode(cfg, bank, args)
    state, sdr = train_loop(
        cfg, bank=bank, max_epochs=args.epochs, epoch_size=args.epoch_size,
        seed=args.seed, mode=args.mode, metrics_path=args.metrics,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        eval_every=args.eval_every, noise_bank=noise_bank,
        dis_sp=args.dis_sp, sampler=sampler, eval_batch=eval_batch,
        init_from=args.init_from)
    if sdr:
        print(f"final SI-SDR: {sdr[-1]:.2f} dB (best {max(sdr):.2f})")
    return state


def _run_query_mode(cfg, bank, args):
    """Query-conditioned separation training: GRID audio-visual lip clips
    (mode=video, Torch_multi/main_run.py:226-256) or MNIST digit queries
    (mode=image-query, Multi_modal nnet.py:70-90), jointly with the
    separator on mask MSE/PIT + the auxiliary speaker CE on the video
    logits (main_run.py:451)."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu.data.synth import featurize, sample_mixtures
    from dl4ss_tpu.train.query_trainer import query_train_loop

    from dl4ss_tpu.run.common import frame_hw, load_frame_bank

    query_source = "video" if args.mode == "video" else "image"
    hw = frame_hw(args)
    if query_source == "video":
        frames = load_frame_bank(cfg, args, hw, args.seed)
        qbank = jnp.asarray(frames)                 # (S, C, T, H, W, 3)
        qkey = "query_video"
    else:
        from dl4ss_tpu.data.mnist import digit_query_bank, load_mnist
        imgs, labels = load_mnist(None)
        qbank = jnp.asarray(digit_query_bank(imgs, labels,
                                             cfg.num_speakers))
        qkey = "query_image"                        # (S, V, 28, 28, 1)

    def make_batch(key):
        k_mix, k_clip = jax.random.split(key)
        b = sample_mixtures(k_mix, bank, cfg)
        feats = featurize(b, cfg)
        ci = jax.random.randint(k_clip, b.spk_idx.shape, 0, qbank.shape[1])
        feats[qkey] = qbank[b.spk_idx, ci]          # (B, K, ...)
        return feats

    dev = make_batch(jax.random.PRNGKey(args.seed + 13))
    state, sdr = query_train_loop(
        cfg, make_batch, seed=args.seed, max_epochs=args.epochs,
        epoch_size=args.epoch_size, query_source=query_source,
        video_trunk=args.video_trunk, frame_hw=hw,
        metrics_path=args.metrics, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume, dev_batch=dev, eval_every=args.eval_every,
        init_from=args.init_from)
    if sdr:
        print(f"final SI-SDR: {sdr[-1]:.2f} dB (best {max(sdr):.2f})")
    return state


def _run_memory_mode(cfg, bank, args):
    """Cocktail/Multi_modal training: life-long-memory target extraction
    with early stopping (train/memory_trainer.py)."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu.data.synth import (featurize, linear_target_mags,
                                      sample_mixtures)
    from dl4ss_tpu.data.mnist import digit_query_bank, load_mnist
    from dl4ss_tpu.train.memory_trainer import memory_train_loop

    from dl4ss_tpu.run.common import frame_hw, load_frame_bank

    qbank = None
    hw = frame_hw(args)
    if args.query_source == "image":
        imgs, labels = load_mnist(None)
        qbank = jnp.asarray(digit_query_bank(imgs, labels, cfg.num_speakers))
        qkey = "query_image"
    elif args.query_source == "video":
        # lip frames drive the memory's VIDEO slot (MEMORY.add_video,
        # main_run.py:142-171): real GRID-style tree or synthetic bank
        frames = load_frame_bank(cfg, args, hw, args.seed)
        qbank = jnp.asarray(frames)                 # (S, C, T, H, W, 3)
        qkey = "query_video"

    def make_batch(key):
        b = sample_mixtures(key, bank, cfg)
        f = featurize(b, cfg)
        mix_mag, target_mag = linear_target_mags(f, b, cfg)
        feats = {"mix_feas": f["mix_feas"], "mix_mag": mix_mag,
                 "spk_id": b.spk_idx[:, 0],          # first speaker = target
                 "clean_feas": f["src_feas"][:, 0],
                 "target_mag": target_mag,
                 # loss_mode='si_sdr' resynthesizes through the mixture
                 # spectrum and scores against the designated target wav
                 "mix_ri": f["mix_ri"],
                 "target_wav": b.source_wavs[:, 0]}
        if qbank is not None:
            vi = jax.random.randint(key, b.spk_idx[:, 0].shape, 0,
                                    qbank.shape[1])
            feats[qkey] = qbank[b.spk_idx[:, 0], vi]
        return feats

    init_state = None
    if args.init_from or (args.resume and args.checkpoint_dir):
        from dl4ss_tpu.train.checkpoint import latest_step, restore_checkpoint
        from dl4ss_tpu.train.memory_trainer import create_memory_state
        template = create_memory_state(
            jax.random.PRNGKey(args.seed), cfg, args.query_source,
            args.epoch_size or cfg.epoch_size, frame_hw=hw,
            video_trunk=args.video_trunk)
        if args.init_from:
            # warm start (fresh optimizer/step): params AND the persistent
            # memory rows come from the donor — the Cocktail memory is model
            # state, not optimizer state (extend_layers.py:144-145) — e.g.
            # spectral-MSE pretrain then --set loss_mode=si_sdr
            donor = restore_checkpoint(args.init_from, template)
            init_state = template._replace(params=donor.params,
                                           memory=donor.memory)
            print(f"warm-started memory-mode params+memory from "
                  f"{args.init_from} (fresh optimizer)")
        elif latest_step(args.checkpoint_dir) is not None:
            init_state = restore_checkpoint(args.checkpoint_dir, template)
            print(f"resumed memory-mode step {int(init_state.step)} "
                  f"from {args.checkpoint_dir}")

    dev = make_batch(jax.random.PRNGKey(args.seed + 13))
    state, history = memory_train_loop(
        cfg, make_batch, seed=args.seed, max_epochs=args.epochs,
        epoch_size=args.epoch_size, query_source=args.query_source,
        patience=args.patience, dev_batch=dev, init_state=init_state,
        frame_hw=hw, video_trunk=args.video_trunk,
        metrics_path=args.metrics)
    if history:
        print(f"dev-loss: first {history[0]:.4f} best {min(history):.4f} "
              f"({len(history)} epochs)")
    if args.checkpoint_dir:
        from dl4ss_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint_dir, state, cfg=cfg)
        print(f"saved memory-mode checkpoint to {args.checkpoint_dir}")
    return state


if __name__ == "__main__":
    main()
