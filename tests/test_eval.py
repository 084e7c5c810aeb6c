"""Evaluation metrics: SI-SDR properties, BSS-Eval jax-vs-oracle, classifier
metrics vs sklearn, wav export contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import sklearn.metrics

from dl4ss_tpu.eval import (bss_eval_sources, bss_eval_sources_numpy,
                            export_batch_outputs, multilabel_accuracy,
                            multilabel_prf, sdr_simple, si_sdr, si_sdr_pit,
                            topk_recall)


def test_si_sdr_known_snr(rng):
    ref = rng.standard_normal(8000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32)
    ref -= ref.mean()
    noise -= noise.mean()
    # orthogonalize noise against ref so SI-SDR == SNR exactly
    noise -= (noise @ ref) / (ref @ ref) * ref
    for snr_db in [0.0, 10.0, 20.0]:
        scale = np.sqrt((ref @ ref) / (noise @ noise) / 10 ** (snr_db / 10))
        est = ref + scale * noise
        got = float(si_sdr(jnp.asarray(est), jnp.asarray(ref)))
        np.testing.assert_allclose(got, snr_db, atol=0.05)


def test_si_sdr_scale_invariance(rng):
    ref = rng.standard_normal(4000).astype(np.float32)
    est = ref + 0.1 * rng.standard_normal(4000).astype(np.float32)
    a = float(si_sdr(jnp.asarray(est), jnp.asarray(ref)))
    b = float(si_sdr(jnp.asarray(3.7 * est), jnp.asarray(ref)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_si_sdr_pit_resolves_swap(rng):
    ref = rng.standard_normal((2, 2, 4000)).astype(np.float32)
    est = ref[:, ::-1] + 0.01 * rng.standard_normal((2, 2, 4000)).astype(np.float32)
    scores, perm = si_sdr_pit(jnp.asarray(est), jnp.asarray(ref))
    assert float(scores.min()) > 20.0
    np.testing.assert_array_equal(np.asarray(perm), [[1, 0], [1, 0]])


def test_sdr_simple_identity(rng):
    ref = rng.standard_normal(1000).astype(np.float32)
    assert float(sdr_simple(jnp.asarray(ref), jnp.asarray(ref))) > 70.0


def _toy_sources(rng, n=1600):
    t = np.arange(n) / 8000.0
    s1 = np.sin(2 * np.pi * 400 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    s2 = np.sign(np.sin(2 * np.pi * 97 * t)) * 0.7
    s2 = s2 + 0.05 * rng.standard_normal(n)
    return np.stack([s1, s2]).astype(np.float64)


def test_bss_eval_jax_matches_numpy_oracle(rng):
    ref = _toy_sources(rng)
    mix = ref.sum(axis=0)
    # genuine interference AND artifacts so all three metrics are finite
    # (an exact linear combo of refs makes oracle SAR ~300 dB, outside f32)
    art = 0.03 * rng.standard_normal(ref.shape)
    est = np.stack([0.8 * ref[0] + 0.2 * mix, 0.9 * ref[1] + 0.1 * mix]) + art
    flen = 64
    sdr_np, sir_np, sar_np, perm_np = bss_eval_sources_numpy(ref, est, flen)
    res = bss_eval_sources(jnp.asarray(ref), jnp.asarray(est), flen=flen)
    np.testing.assert_array_equal(np.asarray(res.perm), perm_np)
    np.testing.assert_allclose(np.asarray(res.sdr), sdr_np, atol=0.2)
    np.testing.assert_allclose(np.asarray(res.sir), sir_np, atol=0.2)
    np.testing.assert_allclose(np.asarray(res.sar), sar_np, atol=0.2)


def test_bss_eval_permutation(rng):
    ref = _toy_sources(rng)
    est = ref[::-1] + 0.01 * rng.standard_normal(ref.shape)
    res = bss_eval_sources(jnp.asarray(ref), jnp.asarray(est), flen=64)
    np.testing.assert_array_equal(np.asarray(res.perm), [1, 0])
    assert float(np.min(np.asarray(res.sdr))) > 15.0


def test_bss_eval_filtered_estimate_high_sdr(rng):
    """BSS-Eval forgives a short linear filter: a delayed/filtered estimate
    still scores high SDR — the property SI-SDR lacks."""
    ref = _toy_sources(rng)
    est = np.stack([np.convolve(ref[0], [0.6, 0.3, 0.1])[:ref.shape[1]],
                    np.convolve(ref[1], [0.2, 0.7, 0.1])[:ref.shape[1]]])
    res = bss_eval_sources(jnp.asarray(ref), jnp.asarray(est), flen=64)
    assert float(np.min(np.asarray(res.sdr))) > 30.0
    # SI-SDR punishes the same estimate
    assert float(si_sdr(jnp.asarray(est[0]), jnp.asarray(ref[0]))) < 20.0


def test_bss_eval_batched(rng):
    ref = np.stack([_toy_sources(rng), _toy_sources(rng)])
    est = ref + 0.05 * rng.standard_normal(ref.shape)
    res = bss_eval_sources(jnp.asarray(ref), jnp.asarray(est), flen=32)
    assert res.sdr.shape == (2, 2)


def test_bss_gain_decomposition_oracle(rng):
    """bss_decomp_gain oracle properties (BSS_EVAL.m:10-13): components sum
    to the estimate, s_target is the scalar projection, and a pure-gain
    estimate decomposes with zero interference/artifacts."""
    from dl4ss_tpu.eval.bss_eval import bss_crit_numpy, bss_decomp_gain_numpy
    ref = _toy_sources(rng)
    est = 0.7 * ref[1] + 0.3 * ref[0] + 0.02 * rng.standard_normal(
        ref.shape[1])
    st, ei, ea = bss_decomp_gain_numpy(est, 1, ref)
    np.testing.assert_allclose(st + ei + ea, est, atol=1e-10)
    # s_target = <est, s1>/||s1||^2 s1 exactly
    g = (est @ ref[1]) / (ref[1] @ ref[1])
    np.testing.assert_allclose(st, g * ref[1], atol=1e-12)
    # e_artif orthogonal to every source (it is the lstsq residual)
    assert np.abs(ref @ ea).max() < 1e-8
    # pure-gain estimate: everything is target
    st2, ei2, ea2 = bss_decomp_gain_numpy(2.5 * ref[0], 0, ref)
    np.testing.assert_allclose(st2, 2.5 * ref[0], atol=1e-9)
    assert np.sum(ei2 ** 2) < 1e-12 and np.sum(ea2 ** 2) < 1e-12
    sdr, sir, sar = bss_crit_numpy(st, ei, ea)
    assert np.isfinite(sdr) and np.isfinite(sir) and np.isfinite(sar)
    assert sdr <= sir + 1e-9  # adding artifacts can only lower SDR


def test_bss_eval_gain_matches_numpy_oracle(rng):
    from dl4ss_tpu.eval.bss_eval import (bss_crit_numpy,
                                         bss_decomp_gain_numpy,
                                         bss_eval_gain)
    ref = np.stack([_toy_sources(rng), _toy_sources(rng)])     # (B=2, K=2, N)
    est = (0.8 * ref[:, 0] + 0.3 * ref[:, 1]
           + 0.05 * rng.standard_normal(ref[:, 0].shape))
    res = bss_eval_gain(jnp.asarray(ref), jnp.asarray(est), target_index=0)
    for b in range(2):
        st, ei, ea = bss_decomp_gain_numpy(est[b], 0, ref[b])
        sdr, sir, sar = bss_crit_numpy(st, ei, ea)
        np.testing.assert_allclose(float(res.sdr[b]), sdr, atol=0.05)
        np.testing.assert_allclose(float(res.sir[b]), sir, atol=0.05)
        np.testing.assert_allclose(float(res.sar[b]), sar, atol=0.05)


def test_gain_nsdr_contract(rng):
    """NSDR contract (BSS_EVAL.m:14-21): the baseline projects the MIXTURE
    onto the target alone; perfect extraction has positive NSDR, and
    mix-as-prediction has NSDR exactly 0."""
    from dl4ss_tpu.eval.bss_eval import gain_nsdr
    ref = np.stack([_toy_sources(rng)])                        # (1, 2, N)
    mix = ref.sum(axis=1)
    res, ns = gain_nsdr(jnp.asarray(ref[:, 0]), jnp.asarray(mix),
                        jnp.asarray(ref))
    assert float(ns[0]) > 10.0
    res2, ns2 = gain_nsdr(jnp.asarray(mix), jnp.asarray(mix),
                          jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(ns2), 0.0, atol=1e-4)
    # dead padded channel does not perturb the solve
    ref3 = np.concatenate([ref, np.zeros_like(ref[:, :1])], axis=1)
    live = jnp.asarray([[1.0, 1.0, 0.0]])
    res3, ns3 = gain_nsdr(jnp.asarray(ref[:, 0]), jnp.asarray(mix),
                          jnp.asarray(ref3), live=live)
    np.testing.assert_allclose(float(res3.sdr[0]), float(res.sdr[0]),
                               atol=1e-3)


def test_classifier_metrics_vs_sklearn(rng):
    probs = rng.random((20, 6))
    targets = (rng.random((20, 6)) > 0.6).astype(np.int32)
    pred = (probs > 0.5).astype(np.int32)
    ours = multilabel_accuracy(probs, targets)
    np.testing.assert_allclose(
        ours["hamming_loss"],
        sklearn.metrics.hamming_loss(targets, pred), atol=1e-9)
    prf = multilabel_prf(probs, targets)
    p, r, f, _ = sklearn.metrics.precision_recall_fscore_support(
        targets, pred, average="micro", zero_division=0)
    np.testing.assert_allclose(prf["micro_precision"], p, atol=1e-9)
    np.testing.assert_allclose(prf["micro_recall"], r, atol=1e-9)
    np.testing.assert_allclose(prf["micro_f1"], f, atol=1e-9)
    p, r, f, _ = sklearn.metrics.precision_recall_fscore_support(
        targets, pred, average="macro", zero_division=0)
    np.testing.assert_allclose(prf["macro_f1"], f, atol=1e-9)


def test_topk_recall():
    probs = np.array([[0.9, 0.8, 0.1, 0.0],
                      [0.1, 0.2, 0.9, 0.8]])
    targets = np.array([[1, 1, 0, 0], [1, 0, 1, 0]])
    assert topk_recall(probs, targets, k=2) == 3 / 4


def test_wav_export_contract(tmp_path, rng):
    mix = rng.standard_normal((2, 800)).astype(np.float32) * 0.2
    pred = rng.standard_normal((2, 2, 800)).astype(np.float32) * 0.2
    true = pred + 0.01
    names = [["011", "022"], ["033", "044"]]
    n = export_batch_outputs(tmp_path / "out", mix, pred, true, names)
    files = sorted(os.listdir(tmp_path / "out"))
    assert "0_011_pre.wav" in files and "0_011_genTrue.wav" in files
    assert "1_True_mix.wav" in files
    assert n == len(files) == 2 * (2 * 2) + 2


def test_wav_export_more_refs_than_preds(tmp_path, rng):
    """top_k < sampler k: every LIVE reference is exported even when pred
    carries fewer channels, so run.score sees the complete true source set
    (a 2-estimate / 3-reference solve must not silently drop a source)."""
    mix = rng.standard_normal((1, 800)).astype(np.float32) * 0.2
    pred = rng.standard_normal((1, 2, 800)).astype(np.float32) * 0.2
    real = rng.standard_normal((1, 3, 800)).astype(np.float32) * 0.2
    names = [["011", "022", "033"]]
    live = np.array([[True, True, True]])
    export_batch_outputs(tmp_path / "out", mix, pred, None, names,
                         real_wavs=real, live=live)
    files = sorted(os.listdir(tmp_path / "out"))
    assert sum(f.endswith("_pre.wav") for f in files) == 2
    assert "0_033_realTrue.wav" in files          # the extra live reference
    assert sum(f.endswith("_realTrue.wav") for f in files) == 3


def test_wav_export_pred_names_override(tmp_path, rng):
    """Recursive peel steps extract speakers in loop order; pred_names names
    the pre-wavs by the EXTRACTED speaker while refs keep channel order."""
    mix = rng.standard_normal((1, 800)).astype(np.float32) * 0.2
    pred = rng.standard_normal((1, 2, 800)).astype(np.float32) * 0.2
    real = pred + 0.01
    export_batch_outputs(tmp_path / "out", mix, pred, None,
                         [["011", "022"]], real_wavs=real,
                         pred_names=[["022", "011"]])
    files = sorted(os.listdir(tmp_path / "out"))
    assert "0_022_pre.wav" in files and "0_011_pre.wav" in files
    assert "0_011_realTrue.wav" in files and "0_022_realTrue.wav" in files


def test_si_sdr_pit_live_masking(rng):
    """Dead (zero-gain) reference channels must not poison the mean."""
    ref = rng.standard_normal((2, 3, 2000)).astype(np.float32)
    ref[:, 2] = 0.0                              # dead speaker channel
    est = ref + 0.01 * rng.standard_normal(ref.shape).astype(np.float32)
    live = jnp.asarray(np.array([[1, 1, 0], [1, 1, 0]], np.float32))
    masked, _ = si_sdr_pit(jnp.asarray(est), jnp.asarray(ref), live=live)
    unmasked, _ = si_sdr_pit(jnp.asarray(est), jnp.asarray(ref))
    assert float(masked.min()) > 25.0            # near-perfect on live chans
    assert float(unmasked.max()) < 10.0          # poisoned by the dead chan
