"""run.score — the bss_test.cal directory scorer — and the recursive
evaluation step."""

import numpy as np
import pytest

from dl4ss_tpu.data.wavio import read_wav, write_wav
from dl4ss_tpu.eval.bss_eval import bss_eval_sources_numpy
from dl4ss_tpu.run.score import _load, collect_groups, score_dir

RATE = 8000
N = 2000
FLEN = 32


def _sources(rng, k=2, n=N):
    t = np.arange(n) / RATE
    srcs = []
    for i in range(k):
        tone = np.sin(2 * np.pi * (220 + 170 * i) * t)
        srcs.append(0.4 * tone + 0.05 * rng.standard_normal(n))
    return np.stack(srcs)


def _write_group(d, idx, refs, ests, mix=None, names=None):
    names = names or [f"spk{c:02d}" for c in range(max(len(refs), len(ests)))]
    for c, w in enumerate(refs):
        write_wav(d / f"{idx}_{names[c]}_realTrue.wav", w, RATE)
    for c, w in enumerate(ests):
        write_wav(d / f"{idx}_{names[c]}_pre.wav", w, RATE)
    if mix is not None:
        write_wav(d / f"{idx}_True_mix.wav", mix, RATE)


def test_score_dir_matches_numpy_oracle(tmp_path, rng):
    """Mean SDR over the directory == per-group numpy BSS-Eval on the
    round-tripped (PCM16) wavs, with permutation resolution."""
    refs = _sources(rng)
    # estimates: channel-swapped noisy copies — exercises the permutation
    ests = refs[::-1] + 0.02 * rng.standard_normal(refs.shape)
    _write_group(tmp_path, 0, refs, ests, mix=refs.sum(0))
    out = score_dir(str(tmp_path), flen=FLEN, verbose=False)
    assert out["n_mixtures"] == 1 and out["sdr"].shape == (2,)

    groups = collect_groups(str(tmp_path))      # {idx: {kind: [paths]}}
    r = np.stack(_load(groups["0"]["realTrue"])).astype(np.float64)
    e = np.stack(_load(groups["0"]["pre"])).astype(np.float64)
    sdr, _, _, perm = bss_eval_sources_numpy(r, e, flen=FLEN)
    assert list(perm) == [1, 0]          # swap detected
    np.testing.assert_allclose(out["mean_sdr"], sdr.mean(), atol=0.2)
    assert out["mean_sdr"] > 10.0        # near-clean estimates score high


def test_score_repeat_trick(tmp_path, rng):
    """1 estimate vs 2 references: the estimate is scored against both
    (bss_test.py:53-54)."""
    refs = _sources(rng)
    _write_group(tmp_path, 0, refs, refs[:1])
    out = score_dir(str(tmp_path), flen=FLEN, verbose=False)
    assert out["sdr"].shape == (2,)


def test_score_pad_silent_selects_best_estimates(tmp_path, rng):
    """3 estimates vs 2 references with --pad-silent: the two real estimates
    are kept, the junk channel is dropped (bss_test.py:47-51). The estimate
    order [ref1-like, junk, ref0-like] makes the padded-problem assignment a
    3-cycle (perm=[1,2,0]) — treating perm as a source->estimate selector
    (est[perm[:aim]]) would keep the junk channel; the correct selection is
    argsort(perm)[:aim], the estimates ASSIGNED to the real references."""
    refs = _sources(rng)
    junk = 0.3 * rng.standard_normal(N)
    noisy = refs + 0.02 * rng.standard_normal(refs.shape)
    ests = np.stack([noisy[1], junk, noisy[0]])
    _write_group(tmp_path, 0, refs, ests)
    # without the trick the mismatched group is skipped
    out = score_dir(str(tmp_path), flen=FLEN, verbose=False)
    assert out["n_mixtures"] == 0
    out = score_dir(str(tmp_path), flen=FLEN, pad_silent=True, verbose=False)
    assert out["n_mixtures"] == 1
    assert out["mean_sdr"] > 10.0        # junk channel excluded
    assert out["sdr"].min() > 10.0       # BOTH kept channels are real ones


def test_score_nsdr_and_multiple_groups(tmp_path, rng):
    refs = _sources(rng)
    mix = refs.sum(0)
    for idx in range(3):
        ests = refs + 0.02 * rng.standard_normal(refs.shape)
        _write_group(tmp_path, idx, refs, ests, mix=mix)
    out = score_dir(str(tmp_path), flen=FLEN, with_nsdr=True, verbose=False)
    assert out["n_mixtures"] == 3 and out["sdr"].shape == (6,)
    # near-perfect estimates beat the mixture baseline decisively
    assert out["mean_nsdr"] > 5.0


def test_score_chunking_invariant(tmp_path, rng):
    """Chunked batched scoring == one-shot scoring. The chunk loop exists
    because the vmapped Toeplitz solve is (K*flen)^2 floats per mixture and
    a whole tt list (3000 mixtures) overflows HBM in one call."""
    refs = _sources(rng)
    for idx in range(5):
        ests = refs + 0.03 * rng.standard_normal(refs.shape)
        _write_group(tmp_path, idx, refs, ests)
    one = score_dir(str(tmp_path), flen=FLEN, verbose=False, chunk=1000)
    many = score_dir(str(tmp_path), flen=FLEN, verbose=False, chunk=2)
    assert one["n_mixtures"] == many["n_mixtures"] == 5
    np.testing.assert_allclose(one["sdr"], many["sdr"], rtol=1e-6)


def test_score_cli_main(tmp_path, rng, capsys):
    refs = _sources(rng)
    _write_group(tmp_path, 0, refs, refs)
    from dl4ss_tpu.run import score as score_cli
    out = score_cli.main([str(tmp_path), "--flen", str(FLEN)])
    assert np.isfinite(out["mean_sdr"])
    assert "SDR here:" in capsys.readouterr().out


def test_rehearsal_corpus_generator(tmp_path):
    """The dress-rehearsal corpus tool at toy scale: tree layout, official
    list format, train/holdout utterance split, sampler compatibility."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.listsampler import Wsj0MixSampler
    from dl4ss_tpu.data.rehearsal import generate_corpus

    out = str(tmp_path / "corpus")
    stats = generate_corpus(out, n_spk=5, utts=6, seconds=0.4,
                            tr_entries=12, cv_entries=6, tt_entries=4,
                            cv_holdout=2)
    assert stats["speakers"] == 5 and stats["utterances"] == 30
    assert stats["lists"]["mix_2_spk_tr.txt"] == 12
    cfg = preset("synth_tiny").replace(max_len_seconds=0.4)
    tr = Wsj0MixSampler(out + "/lists", out, cfg, "train")
    assert tr.num_speakers == 5
    cv = Wsj0MixSampler(out + "/lists", out, cfg, "valid",
                        spk2idx=tr.spk2idx)
    b = next(cv.batches(2, shuffle=False))
    assert b.mix_wav.shape == (2, cfg.max_len)
    # cv draws only held-out utterance indices (>= utts - cv_holdout)
    tr_paths = {p for e in tr.entries for p in e.paths}
    cv_paths = {p for e in cv.entries for p in e.paths}
    assert not (tr_paths & cv_paths)


def test_oracle_mask_bounds(rng):
    """IAM/IRM oracle SI-SDR: a strong positive bound on synthetic 2-mixes,
    with IAM (the sigmoid-mask family's exact ceiling) >= IRM - eps."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.synth import make_synthetic_bank, sample_mixtures
    from dl4ss_tpu.eval.oracle import oracle_mask_sisdr

    cfg = preset("synth_tiny")
    bank = jnp.asarray(make_synthetic_bank(1, cfg.num_speakers, 2,
                                           cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(2), bank, cfg, train=False)
    live = batch.gains > 0
    iam = np.asarray(oracle_mask_sisdr(batch.mix_wav, batch.source_wavs,
                                       cfg, "iam", live=live))
    irm = np.asarray(oracle_mask_sisdr(batch.mix_wav, batch.source_wavs,
                                       cfg, "irm", live=live))
    assert iam.mean() > 5.0 and irm.mean() > 5.0
    assert iam.mean() >= irm.mean() - 0.5


def test_recursive_eval_step(rng):
    """Peel-and-subtract scoring: shapes, finiteness, and agreement with a
    direct recursive_separate + iSTFT + SI-SDR recomputation."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.synth import (featurize, make_synthetic_bank,
                                      sample_mixtures)
    from dl4ss_tpu.train.state import create_train_state
    from dl4ss_tpu.train.steps import make_recursive_eval_step

    cfg = preset("synth_tiny")
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    bank = jnp.asarray(make_synthetic_bank(1, cfg.num_speakers, 2,
                                           cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(1), bank, cfg, train=False)
    feats = featurize(batch, cfg)
    out = make_recursive_eval_step(cfg)(state.params, feats)
    b = cfg.batch_size
    assert out["pred_wavs"].shape == (b, cfg.recursive_max_steps, cfg.max_len)
    assert out["spk_steps"].shape == (b, cfg.recursive_max_steps)
    assert np.all(np.isfinite(np.asarray(out["si_sdr"])))
    # the peel loop never extracts the same speaker twice
    spks = np.asarray(out["spk_steps"])
    for row in spks:
        assert len(set(row.tolist())) == len(row)
