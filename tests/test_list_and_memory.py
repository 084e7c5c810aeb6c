"""wsj0-2mix list sampler, noise/dis-sp data, and the memory trainer."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu import preset
from dl4ss_tpu.data import (featurize, make_synthetic_bank, sample_mixtures,
                            write_wav)
from dl4ss_tpu.data.listsampler import Wsj0MixSampler, mix_from_list
from dl4ss_tpu.data.synth import same_speaker_real_specs
from dl4ss_tpu.train.memory_trainer import (create_memory_state, enroll,
                                            make_memory_eval_step,
                                            make_memory_train_step,
                                            memory_train_loop)

CFG = preset("synth_tiny")


def _make_wsj0_layout(tmp_path, rng, n_spk=4, n_utt=2):
    """wav tree + official-format list files."""
    root = tmp_path / "wsj0"
    lines = []
    for s in range(n_spk):
        spk = f"{s:02d}a"
        d = root / "si_tr_s" / spk
        os.makedirs(d, exist_ok=True)
        for u in range(n_utt):
            name = f"{spk}c02{u:02d}"
            write_wav(d / f"{name}.wav",
                      0.4 * rng.standard_normal(3000).astype(np.float32), 8000)
    for i in range(6):
        s1, s2 = i % n_spk, (i + 1) % n_spk
        lines.append(
            f"wsj0/si_tr_s/{s1:02d}a/{s1:02d}ac02{i % n_utt:02d}.wav "
            f"{0.5 - 0.1 * i:.3f} "
            f"wsj0/si_tr_s/{s2:02d}a/{s2:02d}ac02{(i + 1) % n_utt:02d}.wav "
            f"{-0.5 + 0.1 * i:.3f}")
    ldir = tmp_path / "lists"
    os.makedirs(ldir, exist_ok=True)
    (ldir / "mix_2_spk_tr.txt").write_text("\n".join(lines) + "\n")
    # cv list over the SAME speakers (as in the official recipe, where cv
    # is drawn from si_tr_s): reversed pairings of the tr utterances
    (ldir / "mix_2_spk_cv.txt").write_text("\n".join(lines[::-1][:4]) + "\n")
    return str(ldir), str(tmp_path)


def test_wsj0mix_sampler_epoch(tmp_path, rng):
    cfg = CFG.replace(max_len_seconds=0.375)
    ldir, root = _make_wsj0_layout(tmp_path, rng)
    s = Wsj0MixSampler(ldir, root, cfg, "train")
    assert s.k == 2
    assert s.num_speakers == 4
    assert s.num_batches(2) == 3
    batches = list(s.batches(2, shuffle=True, seed=1))
    assert len(batches) == 3  # epoch-finite (the reference's `yield False`)
    b0 = batches[0]
    assert b0.mix_wav.shape == (2, cfg.max_len)
    np.testing.assert_allclose(np.asarray(b0.mix_wav),
                               np.asarray(b0.source_wavs.sum(1)), atol=1e-5)
    # gains follow 10^(dB/20)
    assert np.all(np.asarray(b0.gains) > 0)
    # deterministic order without shuffle
    a1 = [np.asarray(b.spk_idx) for b in s.batches(2, shuffle=False)]
    a2 = [np.asarray(b.spk_idx) for b in s.batches(2, shuffle=False)]
    np.testing.assert_array_equal(np.concatenate(a1), np.concatenate(a2))


def test_wsj0mix_sampler_mixed_k(tmp_path, rng):
    """Mixed 1-2 speaker pools (predata_fromList_123.py:45-110): per-k
    cursors, uniform-k batches padded to the static width, per-k
    floor-division batch counts."""
    cfg = CFG.replace(max_len_seconds=0.375)
    ldir, root = _make_wsj0_layout(tmp_path, rng)
    # add a 1-speaker list (5 entries) next to the 6-entry 2-spk list
    ones = [f"wsj0/si_tr_s/{s % 4:02d}a/{s % 4:02d}ac02{s % 2:02d}.wav "
            f"{0.3 - 0.1 * s:.3f}" for s in range(5)]
    with open(os.path.join(ldir, "mix_1_spk_tr.txt"), "w") as f:
        f.write("\n".join(ones) + "\n")
    s = Wsj0MixSampler(ldir, root, cfg, "train", mix_ks=(1, 2))
    assert s.k == 2                       # static width = max k
    assert s.num_batches(2) == 5 // 2 + 6 // 2   # per-k floor division
    batches = list(s.batches(2, shuffle=True, seed=3))
    assert len(batches) == 5
    k_counts = sorted(int((np.asarray(b.gains) > 0).sum(1).max())
                      for b in batches)
    # every batch is uniform-k; both pools appear
    for b in batches:
        lives = (np.asarray(b.gains) > 0).sum(1)
        assert (lives == lives[0]).all()
    assert k_counts[0] == 1 and k_counts[-1] == 2
    # padded channels contribute nothing: mix == sum(sources)
    for b in batches:
        np.testing.assert_allclose(np.asarray(b.mix_wav),
                                   np.asarray(b.source_wavs.sum(1)),
                                   atol=1e-5)
        dead = np.asarray(b.gains) == 0
        if dead.any():
            assert np.abs(np.asarray(b.source_wavs)[dead]).max() == 0.0


def test_mix_from_list_gains():
    cfg = CFG.replace(max_len_seconds=0.25)
    bank = jnp.asarray(make_synthetic_bank(0, 4, 1, cfg.max_len)[:, 0, :])
    utt = jnp.array([[0, 1]])
    db = jnp.array([[6.0, -6.0]])
    batch = mix_from_list(bank, utt, db, jnp.array([[0, 1]]), cfg)
    g = np.asarray(batch.gains)[0]
    np.testing.assert_allclose(g, [10 ** 0.3, 10 ** -0.3], rtol=1e-5)


def test_mix_from_list_shift_augment():
    """AUGMENT_DATA circular shift (predata_fromList.py:150-152): sources
    become rolls of the unshifted ones (energy-preserving, deterministic by
    key), and the mixture is the sum of the shifted sources."""
    cfg = CFG.replace(max_len_seconds=0.25)
    bank = jnp.asarray(make_synthetic_bank(0, 4, 1, cfg.max_len)[:, 0, :])
    utt = jnp.array([[0, 1], [2, 3]])
    db = jnp.zeros((2, 2))
    spk = jnp.array([[0, 1], [2, 3]])
    plain = mix_from_list(bank, utt, db, spk, cfg)
    key = jax.random.PRNGKey(3)
    aug = mix_from_list(bank, utt, db, spk, cfg, shift_key=key)
    aug2 = mix_from_list(bank, utt, db, spk, cfg, shift_key=key)
    np.testing.assert_allclose(np.asarray(aug.source_wavs),
                               np.asarray(aug2.source_wavs))  # deterministic
    p, a = np.asarray(plain.source_wavs), np.asarray(aug.source_wavs)
    assert not np.allclose(p, a)                 # it actually shifted
    for b in range(2):
        for k in range(2):
            # some roll of the original reproduces the augmented source
            sh = np.argmax(np.correlate(
                np.tile(a[b, k], 2)[:2 * len(p[b, k])], p[b, k], "valid"))
            np.testing.assert_allclose(np.roll(p[b, k], sh), a[b, k],
                                       atol=1e-5)
    np.testing.assert_allclose(np.asarray(aug.mix_wav),
                               a.sum(axis=1), atol=1e-5)


def test_bgd_noise_mixing():
    cfg = CFG.replace(add_bgd_noise=True)
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    noise = jnp.asarray(make_synthetic_bank(7, 2, 1, cfg.max_len)[:, 0, :])
    key = jax.random.PRNGKey(0)
    with_n = sample_mixtures(key, bank, cfg, noise_bank=noise)
    without = sample_mixtures(key, bank, cfg.replace(add_bgd_noise=False))
    # same sources, mixture differs by the 0.3x noise
    np.testing.assert_allclose(np.asarray(with_n.source_wavs),
                               np.asarray(without.source_wavs), atol=1e-6)
    diff = np.asarray(with_n.mix_wav - without.mix_wav)
    assert np.abs(diff).max() > 0.01
    assert np.abs(diff).max() <= 0.3 + 1e-5  # bounded by ratio * peak-norm


def test_same_speaker_real_specs():
    cfg = CFG
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 3, cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(0), bank, cfg)
    real = same_speaker_real_specs(jax.random.PRNGKey(1), batch, bank, cfg)
    assert real.shape == (cfg.batch_size, cfg.max_mix, cfg.num_frames,
                          cfg.freq_bins)
    assert np.isfinite(np.asarray(real)).all()


def test_list_same_speaker_real_specs(tmp_path, rng):
    """dis-sp real pool in LIST mode (B10 at the official recipe): drawn
    rows are valid utterances of the same speaker and differ from the mixed
    utterance whenever the speaker has more than one."""
    from dl4ss_tpu.data.listsampler import (draw_same_speaker_rows,
                                            list_same_speaker_real_specs)
    cfg = CFG.replace(max_len_seconds=0.375)
    ldir, root = _make_wsj0_layout(tmp_path, rng, n_spk=4, n_utt=3)
    s = Wsj0MixSampler(ldir, root, cfg, "train")
    assert int(s.spk_counts.max()) >= 2
    batch = next(s.batches(2, shuffle=False))
    rows = np.asarray(draw_same_speaker_rows(
        jax.random.PRNGKey(5), batch.spk_idx, batch.utt_idx,
        jnp.asarray(s.spk_rows), jnp.asarray(s.spk_counts)))
    spk = np.asarray(batch.spk_idx)
    mixed = np.asarray(batch.utt_idx)
    for b in range(rows.shape[0]):
        for k in range(rows.shape[1]):
            valid = set(s.spk_rows[spk[b, k], :s.spk_counts[spk[b, k]]])
            assert rows[b, k] in valid
            if s.spk_counts[spk[b, k]] > 1:
                assert rows[b, k] != mixed[b, k]
    real = list_same_speaker_real_specs(
        jax.random.PRNGKey(5), batch, s.device_bank(),
        jnp.asarray(s.spk_rows), jnp.asarray(s.spk_counts), cfg)
    assert real.shape == (2, s.k, cfg.num_frames, cfg.freq_bins)
    assert np.isfinite(np.asarray(real)).all()


def test_injected_vocab_with_unlisted_speaker(tmp_path, rng):
    """A cv/tt sampler built under the TRAIN vocabulary must construct even
    when the split's lists miss some train speakers (regression: the dis-sp
    spk_rows table crashed on the empty row set)."""
    cfg = CFG.replace(max_len_seconds=0.375)
    ldir, root = _make_wsj0_layout(tmp_path, rng)
    train = Wsj0MixSampler(ldir, root, cfg, "train")
    vocab = dict(train.spk2idx)
    vocab["zz_unlisted"] = len(vocab)          # train-only speaker
    s = Wsj0MixSampler(ldir, root, cfg, "valid", spk2idx=vocab)
    assert s.num_speakers == len(vocab)
    assert int(s.spk_counts[vocab["zz_unlisted"]]) == 0
    assert len(list(s.batches(2, shuffle=False))) == 2


def test_list_real_specs_gate_dead_channels(tmp_path, rng):
    """Mixed-k dis-sp: the real pool must zero padded channels exactly like
    the fake side, or the discriminator wins on padding alone."""
    from dl4ss_tpu.data.listsampler import list_same_speaker_real_specs
    cfg = CFG.replace(max_len_seconds=0.375)
    ldir, root = _make_wsj0_layout(tmp_path, rng, n_spk=4, n_utt=3)
    ones = [f"wsj0/si_tr_s/{s % 4:02d}a/{s % 4:02d}ac02{s % 3:02d}.wav "
            f"{0.3 - 0.1 * s:.3f}" for s in range(4)]
    (tmp_path / "lists" / "mix_1_spk_tr.txt").write_text(
        "\n".join(ones) + "\n")
    s = Wsj0MixSampler(ldir, root, cfg, "train", mix_ks=(1, 2))
    for batch in s.batches(2, shuffle=False):
        dead = np.asarray(batch.gains) == 0
        if not dead.any():
            continue
        real = np.asarray(list_same_speaker_real_specs(
            jax.random.PRNGKey(5), batch, s.device_bank(),
            jnp.asarray(s.spk_rows), jnp.asarray(s.spk_counts), cfg))
        assert np.abs(real[dead]).max() == 0.0
        assert np.abs(real[~dead]).max() > 0.0
        return
    raise AssertionError("no padded batch produced")


def test_list_dis_sp_train_loop(tmp_path, rng):
    """One adversarial dis-sp epoch end-to-end through train_loop in list
    mode (the round-4 wiring; previously NotImplementedError)."""
    from dl4ss_tpu.train.loop import train_loop
    cfg = CFG.replace(max_len_seconds=0.375, batch_size=2,
                      use_discriminator=True, ground_truth=True)
    ldir, root = _make_wsj0_layout(tmp_path, rng, n_spk=4, n_utt=3)
    s = Wsj0MixSampler(ldir, root, cfg, "train")
    cfg = cfg.replace(num_speakers=s.num_speakers)
    state, sdr = train_loop(cfg, max_epochs=1, seed=0, mode="adversarial",
                            dis_sp=True, sampler=s)
    assert int(state.step) == s.num_batches(2)
    assert len(sdr) == 1 and np.isfinite(sdr[0])


def _memory_feats(cfg, key, bank):
    batch = sample_mixtures(key, bank, cfg)
    feats = featurize(batch, cfg)
    return {
        "mix_feas": feats["mix_feas"],
        "mix_mag": feats["mix_feas"],
        "spk_id": batch.spk_idx[:, 0],          # first speaker = target (C2)
        "clean_feas": feats["src_feas"][:, 0],
        "target_mag": feats["src_feas"][:, 0],
    }


def test_memory_video_slot_write_and_eval():
    """The memory's VIDEO slot is a live write path (MEMORY.add_video,
    Torch_multi/main_run.py:142-171 — dead code in the reference after
    `1/0`, wired live here): a video-query train step writes SLOT_VIDEO
    only, and the eval step reads the video slot."""
    from dl4ss_tpu.models.memory import SLOT_SPEECH, SLOT_VIDEO
    from dl4ss_tpu.train.memory_trainer import make_memory_eval_step
    cfg = CFG
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    state = create_memory_state(jax.random.PRNGKey(0), cfg, "video",
                                frame_hw=(16, 16))
    assert "video_query" in state.params
    step = make_memory_train_step(cfg, "video")
    feats = _memory_feats(cfg, jax.random.PRNGKey(5), bank)
    frames = jax.random.uniform(jax.random.PRNGKey(6),
                                (cfg.batch_size, 2, 16, 16, 3))
    feats = dict(feats, query_video=frames)
    state2, m = step(state, feats)
    assert np.isfinite(float(m["loss"]))
    age = np.asarray(state2.memory.age)
    assert age[:, SLOT_VIDEO].sum() == cfg.batch_size
    assert age[:, SLOT_SPEECH].sum() == 0
    ev = make_memory_eval_step(cfg, "video")
    out = ev(state2.params, state2.memory, feats)
    assert np.isfinite(float(out["loss"]))
    # zeroing the video slot changes the eval output (the slot is read)
    from dl4ss_tpu.models.memory import MemorySlots
    wiped = MemorySlots(
        vectors=state2.memory.vectors.at[:, SLOT_VIDEO, :].set(0.0),
        age=state2.memory.age)
    out2 = ev(state2.params, wiped, feats)
    assert abs(float(out["loss"]) - float(out2["loss"])) > 1e-9


def test_memory_train_step_learns_and_writes():
    cfg = CFG
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    state = create_memory_state(jax.random.PRNGKey(0), cfg)
    step = make_memory_train_step(cfg)
    feats = _memory_feats(cfg, jax.random.PRNGKey(5), bank)
    losses = []
    for _ in range(25):
        state, m = step(state, feats)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # the target speakers' memory rows were written (age, unit norm)
    ages = np.asarray(state.memory.age[:, 0])
    assert ages.sum() == 25 * cfg.batch_size
    written = np.asarray(feats["spk_id"])
    norms = np.linalg.norm(np.asarray(state.memory.vectors[written, 0]),
                           axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_memory_eval_uses_memory_only():
    cfg = CFG
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    state = create_memory_state(jax.random.PRNGKey(0), cfg)
    step = make_memory_train_step(cfg)
    feats = _memory_feats(cfg, jax.random.PRNGKey(5), bank)
    for _ in range(5):
        state, _ = step(state, feats)
    ev = make_memory_eval_step(cfg)
    out = ev(state.params, state.memory, feats)
    assert out["pred_mag"].shape == feats["mix_mag"].shape
    assert np.isfinite(float(out["loss"]))


def test_enrollment_path():
    cfg = CFG
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    state = create_memory_state(jax.random.PRNGKey(0), cfg)
    feats = _memory_feats(cfg, jax.random.PRNGKey(5), bank)
    unk_id = jnp.full((cfg.batch_size,), cfg.num_speakers - 1, jnp.int32)
    mem2 = enroll(state.params, state.memory, cfg, unk_id,
                  feats["clean_feas"])
    assert int(mem2.age[cfg.num_speakers - 1, 0]) > 0
    assert np.abs(np.asarray(mem2.vectors[cfg.num_speakers - 1, 0])).max() > 0


def test_unk_spk_reserves_memory_row():
    """cfg.unk_spk sizes the memory with the reserved unk row
    (SpkLifeLongMemory's unk slot, extend_layers.py:133-136)."""
    from dl4ss_tpu.train.memory_trainer import memory_rows, unk_row
    cfg = CFG.replace(unk_spk=True)
    state = create_memory_state(jax.random.PRNGKey(0), cfg)
    assert state.memory.vectors.shape[0] == cfg.num_speakers + 1
    assert memory_rows(cfg) == cfg.num_speakers + 1
    assert unk_row(cfg) == cfg.num_speakers
    # without unk_spk: exact inventory, and no reserved row to ask for
    state2 = create_memory_state(jax.random.PRNGKey(0), CFG)
    assert state2.memory.vectors.shape[0] == CFG.num_speakers
    import pytest
    with pytest.raises(ValueError):
        unk_row(CFG)


def test_memory_reset_and_extend():
    from dl4ss_tpu.models.memory import (init_memory, memory_extend,
                                         memory_reset_rows,
                                         memory_write_slot)
    mem = init_memory(3, 4)
    mem = memory_write_slot(mem, jnp.array([1]), jnp.ones((1, 4)))
    assert int(mem.age[1, 0]) == 1
    mem = memory_reset_rows(mem, jnp.array([1]))
    assert int(mem.age[1, 0]) == 0
    assert float(jnp.abs(mem.vectors[1]).max()) == 0.0
    big = memory_extend(mem, 2)
    assert big.vectors.shape == (5, 3, 4)
    assert int(big.age[3:].sum()) == 0


def test_memory_train_loop_early_stopping():
    cfg = CFG.replace(max_epoch=50)
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    dev = _memory_feats(cfg, jax.random.PRNGKey(99), bank)

    def make_batch(key):
        return _memory_feats(cfg, key, bank)

    state, history = memory_train_loop(cfg, make_batch, max_epochs=4,
                                       epoch_size=2, patience=2,
                                       dev_batch=dev)
    assert len(history) >= 1
    assert history[-1] <= history[0] * 2  # sane dev-loss trajectory


def test_empty_pool_errors(tmp_path, rng):
    """Pools smaller than batch_size must fail loudly, not StopIteration."""
    import pytest
    from dl4ss_tpu.train.loop import train_loop
    cfg = CFG.replace(max_len_seconds=0.375, batch_size=64)
    ldir, root = _make_wsj0_layout(tmp_path, rng)
    s = Wsj0MixSampler(ldir, root, cfg, "train")
    assert s.num_batches(64) == 0
    with pytest.raises(ValueError, match="fewer than batch_size"):
        train_loop(cfg.replace(num_speakers=s.num_speakers), sampler=s,
                   max_epochs=1)


def test_train_vocab_sidecar_roundtrip(tmp_path, rng):
    """run.train records the TRAIN vocabulary beside the checkpoints and
    run.evaluate indexes the eval lists with it (same embedding rows even
    if the eval split covers a speaker subset)."""
    import json
    ldir, root = _make_wsj0_layout(tmp_path, rng)
    ck = str(tmp_path / "ck")
    from dl4ss_tpu.run.train import main as train_main
    train_main(["--preset", "synth_tiny", "--set", "max_len_seconds=0.375",
                "--set", "batch_size=2", "--list-dir", ldir, "--wav-root",
                root, "--epochs", "1", "--checkpoint-dir", ck,
                "--set", "checkpoint_every_epochs=1"])
    vocab = json.load(open(os.path.join(ck, "vocab.json")))
    assert len(vocab) == 4
    # evaluating the cv lists under the recorded vocabulary
    from dl4ss_tpu.run.evaluate import main as eval_main
    sisdr = eval_main(["--preset", "synth_tiny", "--set",
                       "max_len_seconds=0.375", "--set", "batch_size_eval=2",
                       "--list-dir", ldir, "--wav-root", root, "--split",
                       "valid", "--checkpoint-dir", ck, "--teacher-forced"])
    assert np.isfinite(sisdr)


def test_linear_target_mags_log_spectral():
    """log_spectral configs must still mask/score LINEAR spectra
    (nnet.py:95): the multiplicand may not contain log-domain negatives."""
    from dl4ss_tpu.data.synth import linear_target_mags
    cfg = CFG.replace(log_spectral=True)
    b = sample_mixtures(jax.random.PRNGKey(0), jnp.asarray(
        make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len)), cfg)
    f = featurize(b, cfg)
    assert np.asarray(f["mix_feas"]).min() < 0          # log features
    mix_mag, target_mag = linear_target_mags(f, b, cfg)
    assert np.asarray(mix_mag).min() >= 0               # linear spectrum
    assert np.asarray(target_mag).min() >= 0
    # and the linear path passes features straight through
    cfg_lin = CFG
    f2 = featurize(b, cfg_lin)
    m2, t2 = linear_target_mags(f2, b, cfg_lin)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(f2["mix_feas"]))


def test_memory_si_sdr_fine_tune_improves_metric():
    """loss_mode='si_sdr' in the memory trainer (the separator's measured
    +0.43..+0.85 dB lever applied to the Cocktail generation): the step
    trains on negative time-domain SI-SDR of the designated target through
    the mixture-phase iSTFT, and the metric improves from the MSE warm
    start."""
    cfg = CFG.replace(loss_mode="si_sdr")
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(5), bank, cfg)
    feats = featurize(batch, cfg)
    mfeats = {
        "mix_feas": feats["mix_feas"], "mix_mag": feats["mix_feas"],
        "spk_id": batch.spk_idx[:, 0],
        "clean_feas": feats["src_feas"][:, 0],
        "target_mag": feats["src_feas"][:, 0],
        "mix_ri": feats["mix_ri"],
        "target_wav": batch.source_wavs[:, 0],
    }
    # MSE pre-train a few steps, then switch objective (fresh state reuse:
    # the param tree is identical, only the loss changes)
    state = create_memory_state(jax.random.PRNGKey(0), CFG)
    mse_step = make_memory_train_step(CFG)
    for _ in range(5):
        state, _ = mse_step(state, mfeats)
    ft_step = make_memory_train_step(cfg)
    losses = []
    for _ in range(15):
        state, m = ft_step(state, mfeats)
        losses.append(float(m["loss"]))       # = -mean SI-SDR (dB)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the eval step reports the same objective under si_sdr mode
    ev = make_memory_eval_step(cfg)
    out = ev(state.params, state.memory, mfeats)
    assert np.isfinite(float(out["loss"]))
