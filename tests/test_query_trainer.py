"""Audio-visual / image-query joint training + preset compile sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu import preset, preset_names
from dl4ss_tpu.data import featurize, make_synthetic_bank, sample_mixtures
from dl4ss_tpu.data.mnist import digit_query_bank, synthetic_digits
from dl4ss_tpu.train.query_trainer import (create_query_state,
                                           make_query_train_step)

CFG = preset("synth_tiny")
BANK = jnp.asarray(make_synthetic_bank(0, CFG.num_speakers, 2, CFG.max_len))


def _base_feats(key):
    batch = sample_mixtures(key, BANK, CFG)
    return featurize(batch, CFG), batch


@pytest.mark.slow
def test_video_query_training_learns(rng):
    feats, batch = _base_feats(jax.random.PRNGKey(0))
    # deterministic per-speaker "lip video": speaker-id-keyed patterns
    b, k = batch.spk_idx.shape
    spk = np.asarray(batch.spk_idx).astype(np.float32)
    frames = np.zeros((b, k, 2, 48, 48, 3), np.float32)
    for bi in range(b):
        for ki in range(k):
            frames[bi, ki, :, :, :, :] = spk[bi, ki] / CFG.num_speakers
    feats = dict(feats, query_video=jnp.asarray(frames))
    state = create_query_state(jax.random.PRNGKey(1), CFG, "video")
    step = make_query_train_step(CFG, "video")
    losses = []
    for _ in range(10):
        state, m = step(state, feats)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "query_ce" in m


@pytest.mark.slow
def test_image_query_training(rng):
    feats, batch = _base_feats(jax.random.PRNGKey(2))
    imgs, labels = synthetic_digits(4, seed=0)
    qbank = digit_query_bank(imgs, labels, CFG.num_speakers)
    idx = np.asarray(batch.spk_idx)
    qi = qbank[idx, 0]                                  # (B,K,28,28,1)
    feats = dict(feats, query_image=jnp.asarray(qi))
    state = create_query_state(jax.random.PRNGKey(3), CFG, "image")
    step = make_query_train_step(CFG, "image")
    for _ in range(8):
        state, m = step(state, feats)
    assert np.isfinite(float(m["loss"]))


def test_query_eval_step_scores(rng):
    from dl4ss_tpu.train.query_trainer import make_query_eval_step
    feats, batch = _base_feats(jax.random.PRNGKey(4))
    b, k = batch.spk_idx.shape
    from dl4ss_tpu.data.video import synthetic_frame_bank
    qbank = jnp.asarray(synthetic_frame_bank(CFG.num_speakers, 2, 2,
                                             (16, 16), seed=0))
    feats = dict(feats, query_video=qbank[batch.spk_idx, 0])
    state = create_query_state(jax.random.PRNGKey(5), CFG, "video",
                               frame_hw=(16, 16))
    ev = make_query_eval_step(CFG, "video")
    out = ev(state.params, feats)
    assert out["pred_wavs"].shape == feats["source_wavs"].shape
    assert np.isfinite(np.asarray(out["si_sdr"])).all()


def test_synthetic_frame_bank_speaker_identifiable():
    from dl4ss_tpu.data.video import synthetic_frame_bank
    bank = synthetic_frame_bank(4, 2, 3, (16, 16), seed=1)
    assert bank.shape == (4, 2, 3, 16, 16, 3)
    assert bank.min() >= 0.0 and bank.max() <= 1.0
    # deterministic given the seed
    np.testing.assert_array_equal(
        bank, synthetic_frame_bank(4, 2, 3, (16, 16), seed=1))
    # distinct speakers produce distinct patterns
    assert np.abs(bank[0] - bank[1]).mean() > 0.05


def test_speaker_frame_bank_tree(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    import os
    from dl4ss_tpu.data.video import speaker_frame_bank
    # speaker A: 2 clips, speaker B: 1 clip (cycled to the static count)
    for spk, n_clips in (("alice", 2), ("bob", 1)):
        for c in range(n_clips):
            d = tmp_path / spk / f"clip{c}"
            os.makedirs(d)
            for t in range(3):
                arr = np.full((8, 8, 3), 40 * c + 10 * t, np.uint8)
                PIL.fromarray(arr).save(d / f"{t:03d}.png")
    bank, idx2spk = speaker_frame_bank(str(tmp_path), total_frames=4,
                                       size=(8, 8), clips_per_speaker=2)
    assert bank.shape == (2, 2, 4, 8, 8, 3)
    assert idx2spk == {0: "alice", 1: "bob"}
    # bob's second clip cycles his only clip
    np.testing.assert_array_equal(bank[1, 0], bank[1, 1])
    # short clips repeat the last frame to the static T
    np.testing.assert_array_equal(bank[0, 0, 2], bank[0, 0, 3])


@pytest.mark.parametrize("name", sorted(preset_names()))
def test_every_preset_config_is_consistent(name):
    """Every preset builds a separator and one tiny train step traces.

    Catches config combinations that break shape contracts (the reference's
    equivalent failure mode is editing one of 18 forked scripts)."""
    from dl4ss_tpu.models import init_separator, separate
    cfg = preset(name).replace(
        batch_size=2, hidden_units=8, embedding_size=4, encoder_layers=1,
        classifier_layers=1, num_speakers=6, max_len_seconds=0.25,
        max_mix=min(preset(name).max_mix, 2), top_k=2,
        use_discriminator=False)
    params = init_separator(jax.random.PRNGKey(0), cfg)
    feat = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(1), (2, cfg.num_frames, cfg.freq_bins)))
    mix_ri = jax.random.normal(
        jax.random.PRNGKey(2), (2, cfg.num_frames, cfg.freq_bins, 2))
    out = separate(params, feat, cfg, spk_idx=jnp.array([[0, 1], [2, 3]]),
                   mix_ri=mix_ri)
    assert np.isfinite(np.asarray(out.pred)).all()


def test_query_si_sdr_fine_tune(rng):
    """loss_mode='si_sdr' in the query trainer: the video-conditioned
    separator trains on negative time-domain SI-SDR (identity channel
    assignment — each channel's query designates its speaker), and the
    loss (= -mean live SI-SDR in dB) improves."""
    cfg = CFG.replace(loss_mode="si_sdr")
    feats, batch = _base_feats(jax.random.PRNGKey(2))
    b, k = batch.spk_idx.shape
    spk = np.asarray(batch.spk_idx).astype(np.float32)
    frames = np.zeros((b, k, 2, 48, 48, 3), np.float32)
    for bi in range(b):
        for ki in range(k):
            frames[bi, ki] = spk[bi, ki] / CFG.num_speakers
    feats = dict(feats, query_video=jnp.asarray(frames))
    state = create_query_state(jax.random.PRNGKey(1), cfg, "video")
    step = make_query_train_step(cfg, "video")
    losses = []
    for _ in range(12):
        state, m = step(state, feats)
        losses.append(float(m["mask_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
