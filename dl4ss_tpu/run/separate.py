"""Separation CLI — separate mixture wav file(s).

Two extraction drivers, mirroring the reference:
  * top-k: classifier-selected (or --speakers forced) simultaneous masks
    (main_run_multi_selfSS_eval.py);
  * recursive: one-speaker-per-step peel-and-subtract
    (main_run_multi_selfSS_recu.py:313-400, TDAA RecuVer).

    python -m dl4ss_tpu.run.separate mix1.wav mix2.wav --checkpoint-dir ck \
        --mode recursive --out separated/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.data.resample import resample_poly_kaiser
from dl4ss_tpu.data.wavio import read_wav, write_wav
from dl4ss_tpu.models.separator import recursive_separate, separate
from dl4ss_tpu.ops.crm import unpack_ri
from dl4ss_tpu.ops.stft import istft, magnitude_and_phase, stft
from dl4ss_tpu.run.common import add_common_args, build_cfg
from dl4ss_tpu.train.checkpoint import restore_checkpoint
from dl4ss_tpu.train.state import create_train_state


def _load_mix(path, cfg):
    wav, rate = read_wav(path)
    if wav.ndim > 1:
        wav = wav[:, 0]
    wav = resample_poly_kaiser(wav, rate, cfg.frame_rate)
    n = len(wav)
    if n > cfg.max_len:
        wav = wav[:cfg.max_len]
    elif n < cfg.max_len:
        wav = np.pad(wav, (0, cfg.max_len - n))
    return wav.astype(np.float32), min(n, cfg.max_len)


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("wavs", nargs="+", help="mixture wav files")
    p.add_argument("--mode", default="topk", choices=["topk", "recursive"])
    p.add_argument("--out", default="separated")
    p.add_argument("--speakers", default=None,
                   help="comma-separated speaker indices to force (teacher "
                        "mode); default: classifier selection")
    args = p.parse_args(argv)

    cfg = build_cfg(args)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
    os.makedirs(args.out, exist_ok=True)

    wavs, true_lens = zip(*[_load_mix(w, cfg) for w in args.wavs])
    mix = jnp.asarray(np.stack(wavs))
    spec = stft(mix, cfg.frame_length, cfg.frame_shift)
    mag, phasor = magnitude_and_phase(spec)

    if args.mode == "recursive":
        extracted, spk_steps = jax.jit(
            lambda pr, f: recursive_separate(pr, f, cfg))(state.params, mag)
        pred_spec = extracted * phasor[:, None]
        chosen = np.asarray(spk_steps)
    else:
        spk_idx = None
        if args.speakers:
            idx = [int(s) for s in args.speakers.split(",")]
            spk_idx = jnp.tile(jnp.asarray(idx)[None, :], (mix.shape[0], 1))
        out = separate(state.params, mag, cfg, spk_idx=spk_idx,
                       mix_ri=jnp.stack([jnp.real(spec), jnp.imag(spec)], -1))
        if cfg.is_complex_mask:
            pred_spec = unpack_ri(out.pred)
        else:
            pred_spec = out.pred * phasor[:, None]
        chosen = (np.asarray(spk_idx) if spk_idx is not None else
                  np.asarray(jax.lax.top_k(out.probs, cfg.top_k)[1]))

    sep = np.asarray(istft(pred_spec, cfg.frame_length, cfg.frame_shift,
                           length=cfg.max_len))
    for i, src_path in enumerate(args.wavs):
        stem = os.path.splitext(os.path.basename(src_path))[0]
        for k in range(sep.shape[1]):
            out_path = os.path.join(
                args.out, f"{stem}_spk{int(chosen[i, k])}_step{k}.wav")
            write_wav(out_path, sep[i, k, :true_lens[i]], cfg.frame_rate)
            print("wrote", out_path)


if __name__ == "__main__":
    main()
