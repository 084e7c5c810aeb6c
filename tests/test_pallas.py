"""Pallas kernels vs reference implementations (CPU interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu.ops import stft
from dl4ss_tpu.ops.pallas_stft import pallas_stft, pallas_stft_ri
from dl4ss_tpu.ops.rnn import bidirectional_rnn, rnn_init


def test_pallas_stft_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
    ours = pallas_stft(x)
    ref = stft(x)
    np.testing.assert_allclose(np.asarray(jnp.abs(ours)),
                               np.asarray(jnp.abs(ref)), atol=1e-4)
    ri = pallas_stft_ri(x)
    assert ri.shape == (3, ref.shape[1], 2 * 129)


def test_pallas_stft_uncentered(rng):
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    ours = pallas_stft(x, center=False)
    ref = stft(x, center=False)
    np.testing.assert_allclose(np.asarray(jnp.abs(ours)),
                               np.asarray(jnp.abs(ref)), atol=1e-4)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_rnn_forward_matches_scan(rng, cell):
    layers = rnn_init(jax.random.PRNGKey(0), cell, 9, 6, 2)
    x = jnp.asarray(rng.standard_normal((3, 11, 9)).astype(np.float32))
    ref = bidirectional_rnn(layers, x, cell, use_pallas=False)
    ours = bidirectional_rnn(layers, x, cell, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_rnn_grads_match_scan(rng, cell):
    layers = rnn_init(jax.random.PRNGKey(1), cell, 5, 4, 1)
    x = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))

    def loss(p, use_pallas):
        return jnp.sum(jnp.sin(bidirectional_rnn(p, x, cell,
                                                 use_pallas=use_pallas)))

    g_ref = jax.grad(lambda p: loss(p, False))(layers)
    g_pal = jax.grad(lambda p: loss(p, True))(layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4, rtol=1e-4),
        g_ref, g_pal)


def test_pallas_featurize_path(rng):
    """cfg.use_pallas_stft routes featurize through the fused kernel."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.data import featurize, make_synthetic_bank, sample_mixtures
    cfg = preset("synth_tiny")
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 2,
                                           cfg.max_len))
    batch = sample_mixtures(jax.random.PRNGKey(0), bank, cfg)
    base = featurize(batch, cfg)
    fused = featurize(batch, cfg.replace(use_pallas_stft=True))
    np.testing.assert_allclose(np.asarray(fused["mix_feas"]),
                               np.asarray(base["mix_feas"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused["src_feas"]),
                               np.asarray(base["src_feas"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused["mix_ri"]),
                               np.asarray(base["mix_ri"]), atol=1e-4)


def test_pallas_separator_end_to_end(rng):
    """Full separator forward with both pallas flags on (interpret mode)."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.models import init_separator, separate
    cfg = preset("synth_tiny").replace(use_pallas_rnn=True)
    params = init_separator(jax.random.PRNGKey(0), cfg)
    feat = jnp.abs(jnp.asarray(
        rng.standard_normal((2, 37, cfg.freq_bins)).astype(np.float32)))
    out = separate(params, feat, cfg, spk_idx=jnp.array([[0, 1], [2, 3]]))
    ref = separate(init_separator(jax.random.PRNGKey(0),
                                  cfg.replace(use_pallas_rnn=False)),
                   feat, cfg.replace(use_pallas_rnn=False),
                   spk_idx=jnp.array([[0, 1], [2, 3]]))
    np.testing.assert_allclose(np.asarray(out.masks), np.asarray(ref.masks),
                               atol=1e-4)


def test_pallas_istft_roundtrip(rng):
    from dl4ss_tpu.ops.pallas_stft import pallas_istft, pallas_stft
    from dl4ss_tpu.ops import istft
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    spec = pallas_stft(x)
    y = pallas_istft(spec)
    assert y.shape == (2, spec.shape[1] * 128 - 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[:, :y.shape[1]]),
                               atol=2e-4)
    # matches the XLA istft
    y_ref = istft(spec)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_pallas_istft_length_contract(rng):
    from dl4ss_tpu.ops.pallas_stft import pallas_istft, pallas_stft
    x = jnp.asarray(rng.standard_normal((1, 40000)).astype(np.float32))
    spec = pallas_stft(x)
    assert pallas_istft(spec).shape[-1] == 39936       # reference min_len
    assert pallas_istft(spec, length=40000).shape[-1] == 40000
    assert pallas_istft(spec, length=1000).shape[-1] == 1000


def test_fused_maskhead_matches_reference(rng):
    """fused_dot_masks == proj+tanh+dot+sigmoid XLA path, fwd and grads."""
    from dl4ss_tpu.ops.pallas_maskhead import (_reference_impl,
                                               fused_dot_masks)
    b, t, h2, f, e, k = 2, 37, 24, 13, 5, 3
    hidden = jnp.asarray(rng.standard_normal((b, t, h2)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((h2, f * e)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(f * e).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, k, e)).astype(np.float32))
    out = fused_dot_masks(hidden, w, bias, q, f, e)
    ref = _reference_impl(hidden, w, bias, q, f, e)
    assert out.shape == (b, k, t, f)
    # the kernel computes at native MXU precision (bf16 operands, f32
    # accumulate — the effective precision of XLA's default f32 matmul on
    # TPU); the f32 reference differs at bf16 rounding level
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def loss_fused(h, ww, bb, qq):
        return jnp.sum(fused_dot_masks(h, ww, bb, qq, f, e) ** 2)

    def loss_ref(h, ww, bb, qq):
        return jnp.sum(_reference_impl(h, ww, bb, qq, f, e) ** 2)

    # the hand-written backward kernel (round 4) recomputes tanh tiles in
    # VMEM and materializes dacc in bf16 — gradients match the f32
    # reference to bf16 rounding (same numerics class as the forward)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(hidden, w, bias, q)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(hidden, w, bias, q)
    for a, bb_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=5e-2, atol=4e-2)


def test_fused_maskhead_backward_multi_tile(rng):
    """The hand-written backward accumulates dq across time-tiles (the
    (i, 0, 0) output block is revisited for every j): t > _TILE_T_BWD
    exercises the init-at-j==0 + accumulate pattern."""
    from dl4ss_tpu.ops import pallas_maskhead as pm
    b, t, h2, f, e, k = 2, 150, 16, 9, 4, 2   # 3 tiles at _TILE_T_BWD=64
    assert t > pm._TILE_T_BWD
    hidden = jnp.asarray(rng.standard_normal((b, t, h2)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((h2, f * e)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(f * e).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, k, e)).astype(np.float32))

    def loss_fused(qq):
        return jnp.sum(pm.fused_dot_masks(hidden, w, bias, qq, f, e) ** 2)

    def loss_ref(qq):
        return jnp.sum(pm._reference_impl(hidden, w, bias, qq, f, e) ** 2)

    gq1 = np.asarray(jax.grad(loss_fused)(q))
    gq2 = np.asarray(jax.grad(loss_ref)(q))
    np.testing.assert_allclose(gq1, gq2, rtol=5e-2, atol=4e-2)


def test_fused_maskhead_backward_small_tile(rng):
    """bwd_tile=32 (the ADDJUST + si_sdr scoped-VMEM escape hatch,
    models/separator.py) produces the same gradients as the default tile:
    the tile size is a pure scheduling knob."""
    from dl4ss_tpu.ops import pallas_maskhead as pm
    b, t, h2, f, e, k = 2, 70, 16, 9, 4, 2    # 2 vs 3 tiles
    hidden = jnp.asarray(rng.standard_normal((b, t, h2)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((h2, f * e)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(f * e).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, k, e)).astype(np.float32))

    def loss(tile):
        def fn(h, ww, bb, qq):
            return jnp.sum(
                pm.fused_dot_masks(h, ww, bb, qq, f, e, tile) ** 2)
        return jax.grad(fn, argnums=(0, 1, 2, 3))(hidden, w, bias, q)

    # different tiles group the bf16 col partial sums differently, so dq
    # agrees only to bf16 rounding (same tolerance class as the reference
    # comparison above)
    for a, b_ in zip(loss(32), loss(pm._TILE_T_BWD)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-2, atol=2e-2)


def test_fused_maskhead_separator_equivalence(rng):
    """separate() with use_pallas_maskhead on == off (interpret mode)."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.models import init_separator, separate
    cfg = preset("synth_tiny")
    params = init_separator(jax.random.PRNGKey(0), cfg)
    feat = jnp.asarray(rng.standard_normal(
        (2, cfg.num_frames, cfg.freq_bins)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, cfg.num_speakers, (2, cfg.top_k)))
    off = separate(params, feat, cfg, spk_idx=idx)
    on = separate(params, feat,
                  cfg.replace(use_pallas_maskhead=True), spk_idx=idx)
    np.testing.assert_allclose(np.asarray(on.masks), np.asarray(off.masks),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(on.pred), np.asarray(off.pred),
                               atol=2e-2)


def test_fused_maskhead_backward_operands_bf16(rng, monkeypatch):
    """VMEM regression (round 4): the backward kernel's saved-masks and
    dout blocks must enter the pallas_call as bf16 — feeding them f32
    (as the video path's f32 hidden once did) doubles two double-buffered
    (1, K, Tt, F) blocks and blew the 16 MB scoped budget by 112 KB at
    B=64/T=320."""
    from dl4ss_tpu.ops import pallas_maskhead as pm
    b, t, h2, f, e, k = 1, 70, 16, 9, 4, 2
    hidden = jnp.asarray(rng.standard_normal((b, t, h2)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((h2, f * e)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(f * e).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, k, e)).astype(np.float32))

    seen = []
    orig = pm.pl.pallas_call

    def spy(*args, **kwargs):
        inner = orig(*args, **kwargs)

        def call(*operands):
            seen.append(tuple(op.dtype for op in operands))
            return inner(*operands)
        return call

    monkeypatch.setattr(pm.pl, "pallas_call", spy)
    jax.grad(lambda qq: jnp.sum(
        pm.fused_dot_masks(hidden, w, bias, qq, f, e) ** 2))(q)
    # last capture is the backward call: (h, W, b, qrep, S, R, masks, dout)
    bwd = seen[-1]
    assert len(bwd) == 8
    assert bwd[6] == jnp.bfloat16, "saved masks must be bf16 in VMEM"
    assert bwd[7] == jnp.bfloat16, "dout must be bf16 in VMEM"


def test_fused_maskhead_vmem_size_guard():
    """Scaled-up configs whose resident W exceeds the VMEM budget must fall
    back to the XLA head instead of failing to compile: H=600 puts the bf16
    (2H, F*E) projection at 15.5 MB against the 16 MB/core budget."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.models.separator import _use_fused_maskhead
    cfg = preset("torch_multi")
    assert _use_fused_maskhead(cfg)                      # H=300: 7.7 MB, on
    assert not _use_fused_maskhead(cfg.replace(hidden_units=600))


def test_pallas_stft_features_matches_xla(rng):
    """The single-kernel (mag, re, im) emission == stft -> abs/real/imag."""
    from dl4ss_tpu.ops.pallas_stft import pallas_stft_features
    x = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
    mag, re, im = pallas_stft_features(x)
    ref = stft(x)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(jnp.abs(ref)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(re), np.asarray(jnp.real(ref)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(jnp.imag(ref)),
                               atol=1e-4)
    # feat_dtype casts the feature inside the kernel
    mag16, _, _ = pallas_stft_features(x, feat_dtype=jnp.bfloat16)
    assert mag16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(mag16, np.float32),
                               np.asarray(jnp.abs(ref)), atol=0.15, rtol=1e-2)


def test_pallas_masked_istft_matches_phasor_path(rng):
    """Fused mask-apply + iDFT + OLA == the reference's explicit
    mask.|X|.e^{j angle(X)} -> istft resynthesis (the phase reapplication
    cancels against the magnitude division)."""
    from dl4ss_tpu.ops import istft, magnitude_and_phase
    from dl4ss_tpu.ops.pallas_stft import pallas_masked_istft
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    spec = stft(x)
    b, t, f = spec.shape
    masks = jnp.asarray(
        rng.uniform(0, 1, (b, 3, t, f)).astype(np.float32))
    ours = pallas_masked_istft(jnp.real(spec), jnp.imag(spec), masks,
                               length=8000)
    mag, phasor = magnitude_and_phase(spec)
    ref = istft((masks * mag[:, None]) * phasor[:, None], length=8000)
    assert ours.shape == (2, 3, 8000)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-4)


def test_pallas_masked_istft_length_contract(rng):
    from dl4ss_tpu.ops.pallas_stft import pallas_masked_istft
    x = jnp.asarray(rng.standard_normal((1, 40000)).astype(np.float32))
    spec = stft(x)
    masks = jnp.ones((1, 2) + spec.shape[1:], jnp.bfloat16)  # bf16 masks ok
    out = pallas_masked_istft(jnp.real(spec), jnp.imag(spec), masks)
    assert out.shape[-1] == 39936                      # reference min_len
    assert pallas_masked_istft(jnp.real(spec), jnp.imag(spec), masks,
                               length=40000).shape[-1] == 40000


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_rnn_step_batched_path(rng, cell, monkeypatch):
    """The step-batched (spc>1) kernels stay numerically identical to the
    production 1-step-per-cell path, forward and grads (padding included:
    T=7 is not a multiple of 4)."""
    import dl4ss_tpu.ops.pallas_rnn as pr

    x = jnp.asarray(rng.standard_normal((3, 7, 12)).astype(np.float32))
    layers = rnn_init(jax.random.PRNGKey(0), cell, 12, 10, 1,
                      bidirectional=True)

    def run():
        def loss(p):
            h = bidirectional_rnn(p, x, cell, use_pallas=True)
            return jnp.sum(h ** 2), h
        (l, h), g = jax.value_and_grad(loss, has_aux=True)(layers)
        return h, g

    h1, g1 = run()
    monkeypatch.setattr(pr, "_FORCED_SPC", 4)
    h4, g4 = run()
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h4), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
