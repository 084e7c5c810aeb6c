"""Shared CLI plumbing: preset selection + overrides + data source."""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from dl4ss_tpu.config import Config, preset, preset_names
from dl4ss_tpu.data.dirtree import DirTreeSampler
from dl4ss_tpu.data.synth import make_synthetic_bank


def add_common_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    p.add_argument("--preset", default="torch_multi", choices=preset_names(),
                   help="named configuration replicating a reference config")
    p.add_argument("--data-root", default=None,
                   help="speaker-tree root (predata_multiAims layout); "
                        "synthetic bank if omitted")
    p.add_argument("--split", default="train")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=1,
                   help="reference convention: seed 1 (main_run.py:21-23)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--metrics", default=None, help="jsonl metrics path")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any Config field, e.g. --set max_mix=3")
    p.add_argument("--utts", type=int, default=None,
                   help="utterances loaded per speaker into the bank "
                        "(--data-root mode; default 8). WSJ0-scale trees "
                        "fit HBM whole — raise this for rehearsal runs")
    p.add_argument("--utts-from", type=int, default=0,
                   help="start each speaker's utterance slice at this "
                        "index (held-out eval banks: rehearsal corpora "
                        "reserve the LAST utterances for cv/tt)")
    return p


def apply_overrides(cfg: Config, args) -> Config:
    """Re-apply the CLI's --batch-size/--set overrides onto `cfg` (also used
    on a checkpoint-recorded config so runtime knobs still win)."""
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    for kv in args.set:
        key, _, value = kv.partition("=")
        current = getattr(cfg, key)  # raises on unknown key
        if isinstance(current, bool):
            parsed = value.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            parsed = int(value)
        elif isinstance(current, float):
            parsed = float(value)
        else:
            parsed = value
        cfg = cfg.replace(**{key: parsed})
    return cfg


def build_cfg(args) -> Config:
    # .validate() enforces the mode <-> dataset contract at every CLI
    # entry (the reference calls valid_mode_dataset at import,
    # Torch_multi/config.py:16-27)
    return apply_overrides(preset(args.preset), args).validate()


def apply_graft(state, graft_arg: str):
    """Parse/validate a --graft value ('component=ckpt_dir[,...]', the
    reference's hand-assembled checkpoint zoo, TestVer:557-579) and load
    the named component subtrees over `state`. Shared by the evaluate and
    separate CLIs so the contract stays in one place."""
    pairs = [kv.split("=", 1) for kv in graft_arg.split(",")]
    if not all(len(kv) == 2 and kv[0] and kv[1] for kv in pairs):
        raise SystemExit("--graft wants component=ckpt_dir pairs, "
                         f"got {graft_arg!r}")
    from dl4ss_tpu.train.checkpoint import load_components
    state = load_components(state, dict(pairs))
    print(f"grafted components: {', '.join(kv[0] for kv in pairs)}")
    return state


def load_noise_bank(noise_dir: str, cfg: Config):
    """Background-noise wavs, loaded RAW (the reference adds 0.3x the
    decoded noise wav, not a peak-normalized one —
    predata_multiAims_noisedB.py:198)."""
    import os
    from dl4ss_tpu.data.dirtree import _load_bank
    paths = sorted(os.path.join(noise_dir, f)
                   for f in os.listdir(noise_dir)
                   if f.lower().endswith(".wav"))
    if not paths:
        raise SystemExit(f"no .wav files under {noise_dir}")
    return jnp.asarray(_load_bank(paths, cfg.frame_rate, cfg.max_len,
                                  normalize=False))


def load_bank(cfg: Config, args, utts_per_speaker: int = 8):
    """Returns (bank array, cfg possibly updated with the real speaker count,
    idx->speaker-name mapping)."""
    utts_per_speaker = getattr(args, "utts", None) or utts_per_speaker
    if args.data_root:
        sampler = DirTreeSampler(args.data_root, cfg, args.split,
                                 utts_per_speaker,
                                 utts_offset=getattr(args, "utts_from", 0))
        cfg = cfg.replace(num_speakers=sampler.num_speakers)
        return jnp.asarray(sampler.bank), cfg, sampler.idx2spk
    bank = make_synthetic_bank(args.seed, cfg.num_speakers,
                               utts_per_speaker, cfg.max_len)
    return jnp.asarray(bank), cfg, {i: f"spk{i:03d}"
                                    for i in range(cfg.num_speakers)}

def frame_hw(args) -> tuple:
    """Frame geometry for the video trunk: Inception-v3 fixes 299x299
    (models/inception.py); the conv trunk uses --frame-size."""
    if getattr(args, "video_trunk", "conv") == "inception":
        return (299, 299)
    return (args.frame_size, args.frame_size)


def load_frame_bank(cfg: Config, args, hw, seed: int):
    """(S, C, T, H, W, 3) lip-frame bank: a real GRID-style tree
    (--video-root, paired speaker-for-speaker with the audio bank,
    Torch_multi/predata.py:161-184) or the synthetic per-speaker bank."""
    if args.video_root:
        from dl4ss_tpu.data.video import speaker_frame_bank
        frames, _ = speaker_frame_bank(args.video_root, args.frames, size=hw)
        if frames.shape[0] != cfg.num_speakers:
            raise SystemExit(
                f"--video-root has {frames.shape[0]} speakers but the audio "
                f"bank has {cfg.num_speakers}; the trees must pair "
                f"speaker-for-speaker (predata.py:161-184)")
        return frames
    from dl4ss_tpu.data.video import synthetic_frame_bank
    return synthetic_frame_bank(cfg.num_speakers, 2, args.frames, hw,
                                seed=seed)
