"""Data pipeline: wav io, resample, on-device synthesis, lists, dir trees."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from dl4ss_tpu import preset
from dl4ss_tpu.data import (DirTreeSampler, MixtureBatch, featurize,
                            make_synthetic_bank, normalize_utterance,
                            parse_mix_list, read_wav, resample_poly_kaiser,
                            sample_mixtures, scan_speaker_tree, write_wav)
from dl4ss_tpu.data.wsj0mix import mix_list_name, parse_mix_line
from dl4ss_tpu.data.dirtree import split_for_train_dev_test

CFG = preset("synth_tiny")


def test_wav_roundtrip(tmp_path, rng):
    x = (0.8 * np.sin(np.arange(4000) * 0.05)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 8000)
    y, rate = read_wav(p)
    assert rate == 8000
    # PCM16 quantization + the standard 32767-write/32768-read asymmetry
    np.testing.assert_allclose(y, x, atol=6e-5)


def test_read_extensible_wav(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE dispatches on the SubFormat GUID: an
    extensible IEEE-float file must decode as float, not PCM garbage."""
    import struct
    x = np.linspace(-0.5, 0.5, 64).astype(np.float32)
    raw = x.tobytes()
    for code, expect in ((3, x), (1, None)):
        guid = struct.pack("<I", code) + bytes.fromhex(
            "000010800000aa00389b71").rjust(12, b"\x00")
        fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000 * 4, 4, 32)
               + struct.pack("<HHI", 22, 32, 4) + guid)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        p = tmp_path / f"ext{code}.wav"
        p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
        if expect is not None:
            y, rate = read_wav(p)
            assert rate == 8000
            np.testing.assert_allclose(y, expect, atol=1e-7)
        else:  # PCM32 subformat: decodes as ints, not float garbage
            y, _ = read_wav(p)
            assert np.all(np.abs(y) <= 1.0)


def test_resample_tone():
    rate_in, rate_out = 16000, 8000
    t = np.arange(rate_in) / rate_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_poly_kaiser(x, rate_in, rate_out)
    assert len(y) == rate_out
    t2 = np.arange(rate_out) / rate_out
    want = np.sin(2 * np.pi * 440 * t2)
    # ignore filter edges
    np.testing.assert_allclose(y[200:-200], want[200:-200], atol=5e-3)


def test_normalize_utterance():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    y = np.asarray(normalize_utterance(x))
    assert abs(y.mean()) < 1e-6
    assert abs(np.abs(y).max() - 1.0) < 1e-6


def test_synthetic_bank_properties():
    bank = make_synthetic_bank(0, 4, 3, 4000)
    assert bank.shape == (4, 3, 4000)
    assert np.abs(bank).max() <= 1.0 + 1e-6
    # different speakers produce different signals
    assert np.abs(bank[0, 0] - bank[1, 0]).max() > 0.1


def test_synthetic_bank_timbre_identifiability():
    """timbre=True makes speaker identity recoverable from HELD-OUT
    utterances (nearest-neighbor on mean log-spectra beats chance by a wide
    margin); timbre=False leaves only the overlapping f0 cue. The rehearsal
    corpus relies on this for classifier-driven workflows at scale."""
    def nn_accuracy(bank, bands=48):
        s, u, _ = bank.shape
        spec = np.abs(np.fft.rfft(bank, axis=-1))
        nb = spec.shape[-1] // bands * bands      # coarse band energies:
        feat = np.log1p(                          # robust to the +/-4% f0
            spec[..., :nb].reshape(s, u, bands, -1).mean(-1))   # jitter
        feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
        proto = feat[:, :u - 1].mean(1)           # enrollment utterances
        probe = feat[:, -1]                       # held-out utterance
        d = ((probe[:, None] - proto[None]) ** 2).sum(-1)   # (S, S)
        return float((d.argmin(1) == np.arange(s)).mean())

    plain = make_synthetic_bank(3, 24, 4, 8000, timbre=False)
    voiced = make_synthetic_bank(3, 24, 4, 8000, timbre=True)
    acc_plain = nn_accuracy(plain)
    acc_voiced = nn_accuracy(voiced)
    assert acc_voiced >= 0.85, acc_voiced
    assert acc_voiced > acc_plain + 0.2, (acc_voiced, acc_plain)


def test_sample_mixtures_static_and_consistent():
    bank = jnp.asarray(make_synthetic_bank(0, CFG.num_speakers, 2, CFG.max_len))
    key = jax.random.PRNGKey(3)
    batch = sample_mixtures(key, bank, CFG)
    assert batch.mix_wav.shape == (CFG.batch_size, CFG.max_len)
    assert batch.source_wavs.shape == (CFG.batch_size, CFG.max_mix, CFG.max_len)
    # mixture is the sum of the gain-scaled sources
    np.testing.assert_allclose(np.asarray(batch.mix_wav),
                               np.asarray(batch.source_wavs.sum(axis=1)),
                               atol=1e-5)
    # speakers distinct within an item
    idx = np.asarray(batch.spk_idx)
    assert all(len(set(row)) == len(row) for row in idx)
    # deterministic under the same key
    batch2 = sample_mixtures(key, bank, CFG)
    np.testing.assert_array_equal(np.asarray(batch.spk_idx),
                                  np.asarray(batch2.spk_idx))


def test_sample_mixtures_db_augment():
    cfg = CFG.replace(augment_data=True, db_range=5.0)
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(0), bank, cfg)
    g = np.asarray(batch.gains)
    # exactly one channel per row may exceed 1, bounded by 10^(5/20)
    assert g.max() <= 10 ** (5 / 20.0) + 1e-5
    assert (np.sort(g, axis=1)[:, :-1] == 1.0).all()


def test_sample_mixtures_3mix_gain_trio():
    """The 3-mix large/small/normal gains (predata_multiAims_3dB.py:132-145):
    ch0 = 10^(dB/20*0.5) exactly, ch1 in [10^(dB/20*0.5), 10^(dB/20)],
    ch2 in [1, 10^(dB/20*0.5)]."""
    cfg = CFG.replace(min_mix=3, max_mix=3, top_k=3, augment_data=True,
                      db_range=5.0)
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    g = np.concatenate([
        np.asarray(sample_mixtures(jax.random.PRNGKey(s), bank, cfg).gains)
        for s in range(4)])
    half = 10 ** (5 / 20.0 * 0.5)
    full = 10 ** (5 / 20.0)
    np.testing.assert_allclose(g[:, 0], half, rtol=1e-6)      # normal
    assert (g[:, 1] >= half - 1e-6).all() and (g[:, 1] <= full + 1e-6).all()
    assert (g[:, 2] >= 1.0 - 1e-6).all() and (g[:, 2] <= half + 1e-6).all()
    assert g[:, 1].std() > 0 and g[:, 2].std() > 0            # random draws
    # mixed live counts: k=2 items follow the 2-mix one-channel rule
    cfg23 = cfg.replace(min_mix=2)
    g = np.concatenate([
        np.asarray(sample_mixtures(jax.random.PRNGKey(s), bank, cfg23).gains)
        for s in range(4)])
    two = g[(g > 0).sum(axis=1) == 2]
    assert len(two)
    assert (two[:, 2] == 0).all()
    assert (np.sort(two[:, :2], axis=1)[:, 0] == 1.0).all()
    assert (two[:, :2].max(axis=1) <= full + 1e-6).all()


def test_sample_mixtures_variable_k():
    cfg = CFG.replace(min_mix=1, max_mix=3, top_k=3)
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2, cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(1), bank, cfg)
    live = np.asarray(batch.gains > 0).sum(axis=1)
    assert live.min() >= 1 and live.max() <= 3


def test_featurize_shapes():
    bank = jnp.asarray(make_synthetic_bank(0, CFG.num_speakers, 2, CFG.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(0), bank, CFG)
    feats = featurize(batch, CFG)
    t, f = CFG.num_frames, CFG.freq_bins
    assert feats["mix_feas"].shape == (CFG.batch_size, t, f)
    assert feats["mix_ri"].shape == (CFG.batch_size, t, f, 2)
    assert feats["src_feas"].shape == (CFG.batch_size, CFG.max_mix, t, f)
    # magnitude == |complex| consistency
    mag = np.hypot(np.asarray(feats["mix_ri"][..., 0]),
                   np.asarray(feats["mix_ri"][..., 1]))
    np.testing.assert_allclose(np.asarray(feats["mix_feas"]), mag, atol=1e-4)


def test_wsj0mix_line_parsing():
    line = ("wsj0/si_tr_s/011/011a0101.wav 0.93421 "
            "wsj0/si_tr_s/022/022c0207.wav -0.93421")
    e = parse_mix_line(line)
    assert e.speakers == ("011", "022")
    assert e.utterances == ("011a0101", "022c0207")
    assert e.gains_db == (0.93421, -0.93421)
    assert mix_list_name(2, "train") == "mix_2_spk_tr.txt"
    assert mix_list_name(3, "test") == "mix_3_spk_tt.txt"


def test_wsj0mix_list_file(tmp_path):
    p = tmp_path / "mix_2_spk_cv.txt"
    p.write_text("a/b/01a/01aa0101.wav 1.0 a/b/02b/02bb0202.wav -1.0\n\n"
                 "a/b/01a/01ac0303.wav 0.5 a/b/03c/03cc0404.wav -0.5\n")
    entries = parse_mix_list(p)
    assert len(entries) == 2
    assert entries[1].speakers == ("01a", "03c")


def test_dirtree_sampler(tmp_path, rng):
    cfg = CFG.replace(max_len_seconds=0.25)
    root = tmp_path / "data"
    for spk in ["s1", "s2", "s3"]:
        d = root / "train" / spk
        os.makedirs(d)
        for u in range(2):
            write_wav(d / f"{u}.wav",
                      rng.standard_normal(1500).astype(np.float32) * 0.3, 8000)
    tree = scan_speaker_tree(root, "train")
    assert sorted(tree) == ["s1", "s2", "s3"]
    sampler = DirTreeSampler(root, cfg, "train", utts_per_speaker=2)
    assert sampler.bank.shape == (3, 2, cfg.max_len)
    assert sampler.spk2idx["s2"] == 1
    # bank feeds the device sampler directly
    batch = sample_mixtures(jax.random.PRNGKey(0), jnp.asarray(sampler.bank),
                            cfg.replace(num_speakers=3), batch_size=2)
    assert batch.mix_wav.shape == (2, cfg.max_len)
    # utts_offset starts each speaker's slice later — a held-out bank from
    # the same tree contains exactly the skipped utterances
    held = DirTreeSampler(root, cfg, "train", utts_per_speaker=1,
                          utts_offset=1)
    np.testing.assert_allclose(held.bank[:, 0], sampler.bank[:, 1])
    # a wrapped held-out slice would re-include training rows — refuse it
    with pytest.raises(ValueError, match="wraps"):
        DirTreeSampler(root, cfg, "train", utts_per_speaker=2, utts_offset=1)


def test_split_70_10_20():
    items = [f"x{i:02d}" for i in range(10)]
    tr, dev, te = split_for_train_dev_test(items)
    assert (len(tr), len(dev), len(te)) == (7, 1, 2)
    assert tr + dev + te == sorted(items)


def test_wav_duration_and_update_max_len(tmp_path, rng):
    from dl4ss_tpu.data.wavio import update_max_len, wav_duration
    p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(p1, rng.standard_normal(3000).astype(np.float32) * 0.1, 8000)
    write_wav(p2, rng.standard_normal(7000).astype(np.float32) * 0.1, 16000)
    assert wav_duration(p1) == (3000, 8000)
    assert wav_duration(p2) == (7000, 16000)
    # b.wav is 7000/16k = 3500 samples at 8k -> longest; capped by max_len
    assert update_max_len([p1, p2], 40000, 8000) == 3500
    assert update_max_len([p1, p2], 3200, 8000) == 3200


def test_window_and_center_knobs_govern_featurize():
    """cfg.window / cfg.center must actually change the features (they are
    logged config knobs, not decorations)."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.synth import featurize, make_synthetic_bank, \
        sample_mixtures
    cfg = preset("synth_tiny")
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    b = sample_mixtures(jax.random.PRNGKey(0), bank, cfg)
    hann = featurize(b, cfg)["mix_feas"]
    sine = featurize(b, cfg.replace(window="sine"))["mix_feas"]
    assert float(jnp.max(jnp.abs(hann - sine))) > 1e-3
    uncentered = featurize(b, cfg.replace(center=False))["mix_feas"]
    assert uncentered.shape[1] != hann.shape[1]


def test_load_cfg_ignores_unknown_keys(tmp_path):
    """cfg.json sidecars written under an older Config schema must still
    restore (extra keys dropped)."""
    import json
    from dl4ss_tpu import preset
    from dl4ss_tpu.train.checkpoint import load_cfg
    d = tmp_path / "ck"
    d.mkdir()
    raw = json.loads(preset("synth_tiny").to_json())
    raw["param_dtype"] = "float32"      # removed field
    raw["some_future_knob"] = 42
    (d / "cfg.json").write_text(json.dumps(raw))
    cfg = load_cfg(str(d))
    assert cfg is not None and cfg.name == "synth_tiny"


def test_dis_sp_real_pool_excludes_mixed_utterance():
    """The dis-sp 'real' example must be a DIFFERENT utterance of the same
    speaker (predata_fromList_dis.py:37-66) — never the mixed one."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.synth import (make_synthetic_bank, sample_mixtures,
                                      same_speaker_real_specs)
    from dl4ss_tpu.ops.stft import stft_cfg
    cfg = preset("synth_tiny")
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    for seed in range(4):
        b = sample_mixtures(jax.random.PRNGKey(seed), bank, cfg)
        real = same_speaker_real_specs(jax.random.PRNGKey(seed + 9), b,
                                       bank, cfg)
        # with u=2 the only valid draw is the OTHER utterance
        from dl4ss_tpu.data.synth import normalize_utterance
        other = normalize_utterance(bank[b.spk_idx, 1 - b.utt_idx])
        expect = jnp.abs(stft_cfg(other, cfg))
        np.testing.assert_allclose(np.asarray(real), np.asarray(expect),
                                   atol=1e-5)
