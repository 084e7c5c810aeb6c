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
from dl4ss_tpu.ops.crm import pack_ri, unpack_ri
from dl4ss_tpu.ops.stft import (istft_cfg, magnitude_and_phase,
                                masked_resynthesis, spectral_feature_cfg)
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


def separate_long(params, wav: np.ndarray, cfg, spk_idx=None,
                  overlap_seconds: float = 1.0):
    """Separate an arbitrarily long mixture — a capability the reference
    lacks (it hard-crops at MAX_LEN, predata_multiAims.py:144).

    The wav is processed in max_len windows overlapping by `overlap_seconds`;
    each chunk runs through the jitted fixed-shape separator, channels are
    aligned to the previous chunk by waveform correlation over the overlap,
    and chunks are cross-faded. Returns (K, len(wav)) float32.
    """
    import jax

    n = len(wav)
    win = cfg.max_len
    if n <= win:
        padded = np.pad(wav.astype(np.float32), (0, win - n))
        out = _separate_chunk(params, padded, cfg, spk_idx)
        return out[:, :n]
    ov = min(int(overlap_seconds * cfg.frame_rate), win // 4)
    hop = win - ov
    starts = list(range(0, n - ov, hop))
    k = cfg.top_k
    out = np.zeros((k, n), np.float32)
    weight = np.zeros(n, np.float32)
    ramp = np.ones(win, np.float32)
    ramp[:ov] = np.linspace(0.0, 1.0, ov, endpoint=False)
    ramp[-ov:] = np.linspace(1.0, 0.0, ov, endpoint=False)
    prev_tail = None
    for si, s in enumerate(starts):
        chunk = wav[s:s + win].astype(np.float32)
        if len(chunk) < win:
            chunk = np.pad(chunk, (0, win - len(chunk)))
        sep = np.asarray(_separate_chunk(params, chunk, cfg, spk_idx))
        # channel alignment is only needed when the classifier picks
        # speakers per chunk; forced speakers already fix the channel order
        # (and a weak chunk's correlation could wrongly swap them)
        if prev_tail is not None and spk_idx is None:
            # align channel order to the previous chunk over the overlap
            cur_head = sep[:, :ov]
            corr = np.abs(prev_tail @ cur_head.T)        # (K, K)
            perm = np.full(k, -1, np.int64)
            used = set()
            for _ in range(k):
                i, j = np.unravel_index(np.argmax(corr), corr.shape)
                perm[i] = j
                corr[i, :] = -1
                corr[:, j] = -1
                used.add(j)
            sep = sep[perm]
        valid = min(win, n - s)
        out[:, s:s + valid] += sep[:, :valid] * ramp[:valid]
        weight[s:s + valid] += ramp[:valid]
        prev_tail = sep[:, win - ov:win] if s + win < n else None
    return out / np.maximum(weight, 1e-8)


def _separate_chunk(params, chunk: np.ndarray, cfg, spk_idx=None):
    import jax.numpy as jnp
    mix = jnp.asarray(chunk)[None]
    # features follow the TRAINING convention (log-spectral configs feed
    # log features; the mask still applies to the linear spectrum)
    feat, spec = spectral_feature_cfg(mix, cfg)
    idx = None if spk_idx is None else jnp.asarray(spk_idx)[None]
    out = separate(params, feat, cfg, spk_idx=idx, mix_ri=pack_ri(spec))
    if cfg.is_complex_mask:
        wavs = istft_cfg(unpack_ri(out.pred), cfg, length=cfg.max_len)
    else:
        # phasor-free: istft(mask (.) X) == istft(mask.|X|.e^{j angle X}),
        # fused on TPU under cfg.use_pallas_stft
        wavs = masked_resynthesis(spec, out.masks, cfg, length=cfg.max_len)
    return np.asarray(wavs[0])


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("wavs", nargs="+", help="mixture wav files")
    p.add_argument("--mode", default="topk", choices=["topk", "recursive"])
    p.add_argument("--out", default="separated")
    p.add_argument("--speakers", default=None,
                   help="comma-separated speaker indices to force (teacher "
                        "mode); default: classifier selection")
    p.add_argument("--long", action="store_true",
                   help="separate the FULL file via overlapped chunking "
                        "with cross-chunk channel alignment (the reference "
                        "hard-crops at MAX_LEN)")
    p.add_argument("--graft", default=None,
                   help="checkpoint-zoo composition: comma-separated "
                        "component=ckpt_dir pairs grafted over "
                        "--checkpoint-dir (the recuReal zoo selection, "
                        "main_run_multi_selfSS_recuReal.py:304-334)")
    args = p.parse_args(argv)

    cfg = build_cfg(args)
    if args.checkpoint_dir:
        # state shapes must come from the TRAINING config (above all
        # num_speakers) or orbax restore fails / silently mis-shapes;
        # CLI runtime overrides still win on top
        from dl4ss_tpu.run.common import apply_overrides
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            cfg = apply_overrides(ck_cfg, args)
    if args.speakers:
        if args.mode == "recursive":
            raise SystemExit(
                "--speakers is the teacher-forced top-k mode; recursive "
                "mode selects speakers itself (one per peel step)")
        idx = [int(x) for x in args.speakers.split(",")]
        if len(idx) != cfg.top_k:
            raise SystemExit(
                f"--speakers lists {len(idx)} speakers but the model "
                f"extracts top_k={cfg.top_k} channels; pass exactly "
                f"{cfg.top_k} (or --set top_k={len(idx)})")
        if min(idx) < 0 or max(idx) >= cfg.num_speakers:
            raise SystemExit(
                f"--speakers indices must be in [0, {cfg.num_speakers}); "
                f"got {idx} (the embedding gather would silently clamp "
                f"out-of-range ids)")
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
    if args.graft:
        from dl4ss_tpu.run.common import apply_graft
        state = apply_graft(state, args.graft)
    os.makedirs(args.out, exist_ok=True)

    if args.long:
        for src_path in args.wavs:
            raw, rate = read_wav(src_path)
            if raw.ndim > 1:
                raw = raw[:, 0]
            raw = resample_poly_kaiser(raw, rate, cfg.frame_rate)
            spk = ([int(s) for s in args.speakers.split(",")]
                   if args.speakers else None)
            sep = separate_long(state.params, raw, cfg, spk_idx=spk)
            stem = os.path.splitext(os.path.basename(src_path))[0]
            for k in range(sep.shape[0]):
                out_path = os.path.join(args.out, f"{stem}_ch{k}_long.wav")
                write_wav(out_path, sep[k], cfg.frame_rate)
                print("wrote", out_path, f"({sep.shape[1]} samples)")
        return

    # process in fixed-size batches (one compiled program regardless of how
    # many files are given; the last batch is padded up to the batch shape)
    bsz = min(cfg.batch_size, len(args.wavs))
    recursive_jit = jax.jit(lambda pr, f: recursive_separate(pr, f, cfg))

    def run_batch(mix):
        feat, spec = spectral_feature_cfg(mix, cfg)
        if args.mode == "recursive":
            # the peel steps resynthesize from masked RESIDUALS, not the
            # original spectrum, so the phasor path stays
            mag, phasor = magnitude_and_phase(spec)
            extracted, spk_steps = recursive_jit(state.params, feat)
            pred_spec = extracted * phasor[:, None]
            chosen = np.asarray(spk_steps)
            sep = np.asarray(istft_cfg(pred_spec, cfg, length=cfg.max_len))
            return sep, chosen
        spk_idx = None
        if args.speakers:
            idx = [int(s) for s in args.speakers.split(",")]
            spk_idx = jnp.tile(jnp.asarray(idx)[None, :],
                               (mix.shape[0], 1))
        out = separate(state.params, feat, cfg, spk_idx=spk_idx,
                       mix_ri=pack_ri(spec))
        chosen = (np.asarray(spk_idx) if spk_idx is not None else
                  np.asarray(jax.lax.top_k(out.probs, cfg.top_k)[1]))
        if cfg.is_complex_mask:
            sep = np.asarray(istft_cfg(unpack_ri(out.pred), cfg,
                                       length=cfg.max_len))
        else:
            sep = np.asarray(masked_resynthesis(spec, out.masks, cfg,
                                                length=cfg.max_len))
        return sep, chosen

    for start in range(0, len(args.wavs), bsz):
        paths = args.wavs[start:start + bsz]
        wavs, true_lens = zip(*[_load_mix(w, cfg) for w in paths])
        stacked = np.stack(wavs)
        n = len(paths)
        if n < bsz:   # pad the tail batch to the compiled shape
            stacked = np.concatenate(
                [stacked, np.zeros((bsz - n, stacked.shape[1]), np.float32)])
        sep, chosen = run_batch(jnp.asarray(stacked))
        for i, src_path in enumerate(paths):
            stem = os.path.splitext(os.path.basename(src_path))[0]
            for k in range(sep.shape[1]):
                out_path = os.path.join(
                    args.out, f"{stem}_spk{int(chosen[i, k])}_step{k}.wav")
                write_wav(out_path, sep[i, k, :true_lens[i]], cfg.frame_rate)
                print("wrote", out_path)


if __name__ == "__main__":
    main()
