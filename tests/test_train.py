"""Train harness: steps run, losses decrease, checkpoints roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu import preset
from dl4ss_tpu.data import featurize, make_synthetic_bank, sample_mixtures
from dl4ss_tpu.train import (TrainState, create_train_state, make_train_step,
                             restore_checkpoint, save_checkpoint, train_loop)
from dl4ss_tpu.train.state import make_schedule
from dl4ss_tpu.train.steps import (make_adversarial_step, make_classifier_step,
                                   make_dense_train_step, make_eval_step,
                                   make_fused_step)

CFG = preset("synth_tiny")
BANK = jnp.asarray(make_synthetic_bank(0, CFG.num_speakers, 2, CFG.max_len))


def _feats(cfg=CFG, key=0):
    batch = sample_mixtures(jax.random.PRNGKey(key), BANK, cfg)
    return featurize(batch, cfg)


def test_schedules():
    s = make_schedule(CFG.replace(lr_schedule="halve_per_epoch",
                                  learning_rate=1e-3, lr_floor=1e-7), 10)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(10)) == pytest.approx(5e-4)
    assert float(s(1000)) == pytest.approx(1e-7)
    s50 = make_schedule(CFG.replace(lr_schedule="halve_50",
                                    learning_rate=1e-5), 2)
    assert float(s50(0)) == pytest.approx(1e-5)
    assert float(s50(100)) == pytest.approx(5e-6)
    # cosine: half-cosine over the max_epoch horizon, floored, then flat
    sc = make_schedule(CFG.replace(lr_schedule="cosine", learning_rate=1e-3,
                                   lr_floor=1e-7, max_epoch=10), 10)
    assert float(sc(0)) == pytest.approx(1e-3)
    assert float(sc(50)) == pytest.approx(5e-4)       # halfway -> base/2
    assert float(sc(100)) == pytest.approx(1e-7)      # horizon -> floor
    assert float(sc(500)) == pytest.approx(1e-7)      # stays at floor past it


def test_train_step_decreases_loss():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step = make_train_step(CFG)
    feats = _feats()
    losses = []
    for _ in range(30):
        state, m = step(state, feats)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0]
    assert int(state.step) == 30


def test_fused_step_runs_and_learns():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    fused = make_fused_step(CFG)
    first = None
    for _ in range(25):
        state, m = fused(state, BANK)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_dense_step_runs():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step = make_dense_train_step(CFG)
    feats = _feats()
    state, m1 = step(state, feats)
    state, m2 = step(state, feats)
    assert np.isfinite(m2["loss"]) and float(m2["loss"]) < float(m1["loss"])


def test_dense_step_sum_loss_and_crm():
    # sum-to-one term active (the reference's 0.5-weighted loss,
    # main_run.py:508-513) in the dense layout
    cfg = CFG.replace(sum_loss_weight=0.5)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_dense_train_step(cfg)
    feats = _feats(cfg)
    state, m = step(state, feats)
    assert np.isfinite(float(m["sum_loss"]))
    assert float(m["loss"]) == pytest.approx(
        float(m["mask_loss"]) + 0.5 * float(m["sum_loss"]), rel=1e-5)
    # cRM dense: complex-RI channels scattered by speaker id
    crm = CFG.replace(is_complex_mask=True)
    state = create_train_state(jax.random.PRNGKey(0), crm)
    step = make_dense_train_step(crm)
    feats = featurize(sample_mixtures(jax.random.PRNGKey(0), BANK, crm), crm)
    losses = []
    for _ in range(10):
        state, m = step(state, feats)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_classifier_step_learns():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step = make_classifier_step(CFG)
    feats = _feats()
    for i in range(40):
        state, m = step(state, feats)
        if i == 0:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert 0.0 <= float(m["element_acc"]) <= 1.0


def test_adversarial_step():
    cfg = CFG.replace(use_discriminator=True, loss_mode="identity")
    # discriminator conv needs >= 17x17 inputs after 3 stride-2 convs
    state = create_train_state(jax.random.PRNGKey(0), cfg,
                               num_frames=cfg.num_frames)
    step = make_adversarial_step(cfg)
    feats = _feats(cfg)
    state, m = step(state, feats)
    for k in ["d_loss", "g_loss", "mask_loss", "d_acc_real", "d_acc_fake"]:
        assert np.isfinite(float(m[k])), k
    assert state.d_opt_state is not None
    state, m2 = step(state, feats)
    assert float(m2["d_loss"]) <= float(m["d_loss"]) + 1.0


def test_crm_train_step():
    cfg = CFG.replace(is_complex_mask=True)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    batch = sample_mixtures(jax.random.PRNGKey(0), BANK, cfg)
    feats = featurize(batch, cfg)
    losses = []
    for _ in range(20):
        state, m = step(state, feats)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_eval_step_scores():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ev = make_eval_step(CFG)
    feats = _feats()
    out = ev(state.params, feats)
    assert out["pred_wavs"].shape == (CFG.batch_size, CFG.max_mix, CFG.max_len)
    assert out["si_sdr"].shape == (CFG.batch_size,)
    assert np.isfinite(np.asarray(out["si_sdr"])).all()
    # non-teacher-forced path also works
    out2 = ev(state.params, feats, teacher_forced=False)
    assert np.isfinite(np.asarray(out2["si_sdr"])).all()


def test_checkpoint_roundtrip(tmp_path):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step = make_train_step(CFG)
    feats = _feats()
    for _ in range(3):
        state, _ = step(state, feats)
    save_checkpoint(tmp_path / "ckpt", state)
    template = create_train_state(jax.random.PRNGKey(1), CFG)
    restored = restore_checkpoint(tmp_path / "ckpt", template)
    assert int(restored.step) == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, restored.params)
    # training continues seamlessly from the restored state
    restored, m = step(restored, feats)
    assert int(restored.step) == 4 and np.isfinite(float(m["loss"]))


def test_init_params_from_warm_start(tmp_path):
    """init_params_from grafts the donor's weights into a FRESH trainer
    (the MSE-pretrain -> si_sdr-fine-tune pattern): params match the donor,
    step/optimizer start at zero, and a mismatched donor raises."""
    from dl4ss_tpu.train.checkpoint import init_params_from
    donor = create_train_state(jax.random.PRNGKey(0), CFG)
    step = make_train_step(CFG)
    feats = _feats()
    for _ in range(3):
        donor, _ = step(donor, feats)
    save_checkpoint(tmp_path / "ckpt", donor)
    ft_cfg = CFG.replace(loss_mode="si_sdr")
    fresh = init_params_from(
        create_train_state(jax.random.PRNGKey(9), ft_cfg), tmp_path / "ckpt")
    assert int(fresh.step) == 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        donor.params, fresh.params)
    ft = make_train_step(ft_cfg)
    fresh, m = ft(fresh, feats)
    assert int(fresh.step) == 1 and np.isfinite(float(m["loss"]))
    wrong = create_train_state(
        jax.random.PRNGKey(9), CFG.replace(hidden_units=CFG.hidden_units * 2))
    with pytest.raises(ValueError):
        init_params_from(wrong, tmp_path / "ckpt")


def test_train_loop_smoke(tmp_path):
    cfg = CFG.replace(checkpoint_every_epochs=1)
    state, sdr = train_loop(cfg, bank=BANK, max_epochs=2, epoch_size=2,
                            metrics_path=str(tmp_path / "m.jsonl"),
                            checkpoint_dir=str(tmp_path / "ck"))
    assert int(state.step) == 4
    assert len(sdr) == 2
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2 and "si_sdr" in lines[0]


def test_training_improves_si_sdr():
    """End-to-end learning signal: after a few hundred steps on a tiny bank
    the separated SI-SDR must beat the mixture-as-estimate baseline."""
    cfg = CFG.replace(batch_size=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    fused = make_fused_step(cfg)
    ev = make_eval_step(cfg)
    feats0 = _feats(cfg, key=123)
    base = float(jnp.mean(ev(state.params, feats0)["si_sdr"]))
    for _ in range(150):
        state, m = fused(state, BANK)
    after = float(jnp.mean(ev(state.params, feats0)["si_sdr"]))
    assert after > base + 3.0, (base, after)


def test_si_sdr_loss_mode_trains():
    """loss_mode='si_sdr' (time-domain uPIT, the framework's fine-tune
    objective beyond the reference's spectral MSE): the step runs, the
    loss is the negative live-weighted SI-SDR (so -loss is a dB score),
    and training improves the eval SI-SDR over the init."""
    cfg = CFG.replace(loss_mode="si_sdr", batch_size=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    ev = make_eval_step(cfg)
    feats = _feats(cfg, key=7)
    base = float(jnp.mean(ev(state.params, feats)["si_sdr"]))
    first = None
    for _ in range(60):
        state, m = step(state, feats)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first               # -SI-SDR decreasing
    after = float(jnp.mean(ev(state.params, feats)["si_sdr"]))
    assert after > base + 3.0, (base, after)
    # validate() rejects typos
    with pytest.raises(ValueError):
        CFG.replace(loss_mode="sisdr").validate()


def test_fused_step_with_noise_bank():
    cfg = CFG.replace(add_bgd_noise=True)
    noise = jnp.asarray(make_synthetic_bank(9, 2, 1, cfg.max_len)[:, 0, :])
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_fused_step(cfg, noise_bank=noise)
    state, m = step(state, BANK)
    assert np.isfinite(float(m["loss"]))


def test_train_loop_noise_and_dissp(tmp_path):
    from dl4ss_tpu.train import train_loop
    cfg = CFG.replace(add_bgd_noise=True, use_discriminator=True,
                      loss_mode="identity")
    noise = jnp.asarray(make_synthetic_bank(9, 2, 1, cfg.max_len)[:, 0, :])
    state, _ = train_loop(cfg, bank=BANK, max_epochs=1, epoch_size=1,
                          mode="adversarial", noise_bank=noise, dis_sp=True,
                          eval_every=0)
    assert int(state.step) == 1


def test_eval_complement_mask():
    """The 1-speaker complement trick (TestVer:473-476): when the classifier
    sees only one speaker, channel 2 gets (1 - mask_1) * mixture."""
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ev = make_eval_step(CFG)
    feats = _feats()
    out = ev(state.params, feats, teacher_forced=True, complement_mask=True)
    assert np.isfinite(np.asarray(out["si_sdr"])).all()
    # probs are computed (needed for the 1-spk gate)
    assert np.abs(np.asarray(out["probs"])).max() > 0


def test_train_loop_out_sep_result(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = CFG.replace(out_sep_result=True, output_dir=str(tmp_path / "bo"))
    train_loop(cfg, bank=BANK, max_epochs=1, epoch_size=1)
    import os
    files = os.listdir(tmp_path / "bo")
    assert any(f.endswith("_pre.wav") for f in files)
    assert any(f == "0_True_mix.wav" for f in files)


def test_non_teacher_forced_training():
    """Ground_truth=False: channels selected by the classifier during
    training (main_run.py:465-474); PIT resolves the assignment."""
    cfg = CFG.replace(ground_truth=False, loss_mode="pit")
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    feats = _feats(cfg)
    state, m = step(state, feats)
    assert np.isfinite(float(m["loss"]))
    with pytest.raises(ValueError):
        make_train_step(cfg.replace(loss_mode="identity"))


def test_bf16_mixed_precision_step_matches_f32_learning():
    """compute_dtype='bfloat16': bf16 matmuls, f32 master params/loss.

    The bf16 step must keep f32 params/opt-state and track the f32 loss
    trajectory closely on the same data."""
    cfg16 = CFG.replace(compute_dtype="bfloat16")
    feats = _feats()

    def run(cfg):
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg)
        losses = []
        for _ in range(20):
            state, m = step(state, feats)
            losses.append(float(m["loss"]))
        return state, losses

    state16, l16 = run(cfg16)
    _, l32 = run(CFG)
    # master params stay f32
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state16.params))
    # learns: same qualitative trajectory as f32
    assert l16[-1] < 0.6 * l16[0]
    assert abs(l16[-1] - l32[-1]) < 0.3 * l32[0]


def test_bf16_classifier_step_runs():
    cfg16 = CFG.replace(compute_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), cfg16)
    step = make_classifier_step(cfg16)
    feats = _feats(cfg16)
    first = None
    for _ in range(10):
        state, m = step(state, feats)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.params))


def test_bf16_adversarial_step_runs():
    cfg16 = CFG.replace(compute_dtype="bfloat16", use_discriminator=True)
    state = create_train_state(jax.random.PRNGKey(0), cfg16)
    step = make_adversarial_step(cfg16)
    feats = _feats(cfg16)
    state, m = step(state, feats)
    assert np.isfinite(float(m["g_loss"])) and np.isfinite(float(m["d_loss"]))
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.params))


def test_bf16_eval_step_close_to_f32():
    cfg16 = CFG.replace(compute_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    feats = _feats()
    s32 = np.asarray(make_eval_step(CFG)(state.params, feats)["si_sdr"])
    s16 = np.asarray(make_eval_step(cfg16)(state.params, feats)["si_sdr"])
    assert np.isfinite(s16).all()
    assert abs(float(s16.mean() - s32.mean())) < 1.0   # dB
