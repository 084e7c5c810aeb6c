"""STFT/iSTFT numerics vs scipy — the `test_stft_istft.py` contract.

The reference's only kernel-correctness check is a hand-rolled-numpy vs
librosa STFT round trip (Cocktail/.../test_stft_istft.py:13-63); librosa is
not available here, so scipy.signal.ShortTimeFFT (same conventions) is the
ground truth, plus closed-form and round-trip properties.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from dl4ss_tpu.ops import stft as stft_mod
from dl4ss_tpu.ops import istft, magnitude_and_phase, overlap_add, stft
from dl4ss_tpu.ops.stft import frame_signal, num_frames, spectral_feature
from dl4ss_tpu.ops.windows import get_window

L, HOP = 256, 128


def _scipy_stft(x, window_name="hann"):
    """librosa-convention STFT via scipy (center=True reflect pad)."""
    win = get_window(window_name, L)
    pad = L // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    t = 1 + (len(xp) - L) // HOP
    frames = np.stack([xp[i * HOP:i * HOP + L] for i in range(t)])
    return np.fft.rfft(frames * win, axis=-1)  # (T, F)


def test_stft_matches_rfft(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), L, HOP))
    ref = _scipy_stft(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_reference_shape_contract():
    """5 s @ 8 kHz -> 313 frames x 129 bins (SURVEY.md §6 workload shape)."""
    x = jnp.zeros(40000)
    spec = stft(x, L, HOP)
    assert spec.shape == (313, 129)
    assert num_frames(40000, L, HOP, center=True) == 313


def test_stft_batched(rng):
    x = rng.standard_normal((3, 2, 4000)).astype(np.float32)
    batched = np.asarray(stft(jnp.asarray(x), L, HOP))
    single = np.asarray(stft(jnp.asarray(x[1, 0]), L, HOP))
    np.testing.assert_allclose(batched[1, 0], single, atol=1e-5)


@pytest.mark.parametrize("window", ["hann", "sine", "sqrt_hann"])
def test_roundtrip(rng, window):
    x = rng.standard_normal(8000).astype(np.float32)
    spec = stft(jnp.asarray(x), L, HOP, window=window)
    y = np.asarray(istft(spec, L, HOP, window=window))
    # librosa-style trimmed length: (T-1)*hop
    t = spec.shape[0]
    assert len(y) == (t - 1) * HOP
    np.testing.assert_allclose(y, x[:len(y)], atol=1e-4)


def test_roundtrip_reference_min_len():
    """40000-sample utterance resynthesizes to exactly 39936 samples — the
    reference's hard-coded min_len (main_run_multi_selfSS_subeval.py:71)."""
    x = jnp.asarray(np.sin(np.arange(40000) * 0.01).astype(np.float32))
    y = istft(stft(x, L, HOP), L, HOP)
    assert y.shape[-1] == 39936


def test_istft_length_pad_and_trim(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    spec = stft(jnp.asarray(x), L, HOP)
    assert istft(spec, L, HOP, length=1000).shape[-1] == 1000
    assert istft(spec, L, HOP, length=50000).shape[-1] == 50000


def test_overlap_add_50pct():
    frames = jnp.ones((5, L))
    out = np.asarray(overlap_add(frames, HOP))
    assert out.shape == (4 * HOP + L,)
    # interior samples overlap exactly two frames
    assert np.all(out[HOP:-HOP] == 2.0)
    assert np.all(out[:HOP] == 1.0) and np.all(out[-HOP:] == 1.0)


def test_overlap_add_arbitrary_hop(rng):
    frames = rng.standard_normal((7, 200)).astype(np.float32)
    hop = 60
    ours = np.asarray(overlap_add(jnp.asarray(frames), hop))
    ref = np.zeros(6 * hop + 200, np.float32)
    for i in range(7):
        ref[i * hop:i * hop + 200] += frames[i]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_frame_signal_uncentered(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    f = np.asarray(frame_signal(jnp.asarray(x), 256, 128, center=False))
    assert f.shape == (1 + (1000 - 256) // 128, 256)
    np.testing.assert_array_equal(f[2], x[256:512])


def test_magnitude_and_phase(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    spec = stft(jnp.asarray(x), L, HOP)
    mag, phasor = magnitude_and_phase(spec)
    np.testing.assert_allclose(np.abs(np.asarray(phasor))[np.asarray(mag) > 1e-3],
                               1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mag * phasor), np.asarray(spec),
                               atol=1e-4)


def test_spectral_feature_log_path(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    feat, spec = spectral_feature(jnp.asarray(x), L, HOP, log_spectral=True)
    ref = np.log(np.abs(_scipy_stft(x, "sine")) + np.spacing(1))
    np.testing.assert_allclose(np.asarray(feat), ref, atol=1e-2)
    feat_lin, _ = spectral_feature(jnp.asarray(x), L, HOP, log_spectral=False)
    np.testing.assert_allclose(np.asarray(feat_lin), np.abs(_scipy_stft(x)),
                               atol=2e-3, rtol=1e-4)


def test_masked_resynthesis_pipeline(rng):
    """mask * |X| * phasor -> istft: the reference's bss_eval resynthesis
    (Torch_multi/main_run.py:46-51) as one on-device expression."""
    x = rng.standard_normal(8000).astype(np.float32)
    spec = stft(jnp.asarray(x), L, HOP)
    mag, phasor = magnitude_and_phase(spec)
    mask = jnp.ones_like(mag)
    y = np.asarray(istft(mask * mag * phasor, L, HOP))
    np.testing.assert_allclose(y, x[:len(y)], atol=1e-3)


def test_masked_resynthesis_helper_matches_phasor_path(rng):
    """ops.masked_resynthesis == the explicit mask.|X|.phasor istft, on both
    the XLA and the fused-Pallas (use_pallas_stft) routes."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.ops.stft import masked_resynthesis
    cfg = preset("torch_multi")
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    spec = stft(x, cfg.frame_length, cfg.frame_shift)
    mag, phasor = magnitude_and_phase(spec)
    masks = jnp.asarray(rng.uniform(
        0, 1, (2, 2) + mag.shape[1:]).astype(np.float32))
    ref = np.asarray(istft((masks * mag[:, None]) * phasor[:, None],
                           cfg.frame_length, cfg.frame_shift, length=8000))
    for flag in (False, True):
        got = np.asarray(masked_resynthesis(
            spec, masks, cfg.replace(use_pallas_stft=flag), length=8000))
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_masked_resynthesis_fused_gradient_matches_xla(rng):
    """Differentiating masked_resynthesis under use_pallas_stft works (the
    custom_vjp recomputes through the XLA istft) and matches the XLA
    route's gradient — a future si_sdr-style caller gets correct grads
    instead of a Pallas autodiff error."""
    import jax
    from dl4ss_tpu import preset
    from dl4ss_tpu.ops.stft import masked_resynthesis
    cfg = preset("torch_multi")
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    spec = stft(x, cfg.frame_length, cfg.frame_shift)
    masks = jnp.asarray(rng.uniform(
        0, 1, (2, 2) + spec.shape[1:]).astype(np.float32))

    def loss(m, flag):
        w = masked_resynthesis(spec, m, cfg.replace(use_pallas_stft=flag),
                               length=4000)
        return jnp.sum(w ** 2)

    g_fused = np.asarray(jax.grad(lambda m: loss(m, True))(masks))
    g_xla = np.asarray(jax.grad(lambda m: loss(m, False))(masks))
    np.testing.assert_allclose(g_fused, g_xla, atol=2e-3, rtol=1e-4)


def test_masked_resynthesis_non_divisible_hop_falls_back(rng):
    """use_pallas_stft with L % hop != 0 must take the XLA route (the
    kernel's hop-row framing requires divisibility), not crash."""
    from dl4ss_tpu import preset
    from dl4ss_tpu.ops.stft import masked_resynthesis
    cfg = preset("torch_multi").replace(use_pallas_stft=True,
                                        frame_shift=96)
    x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    spec = stft(x, cfg.frame_length, cfg.frame_shift)
    masks = jnp.ones((1, 2) + spec.shape[1:], jnp.float32)
    out = masked_resynthesis(spec, masks, cfg, length=4000)
    assert out.shape == (1, 2, 4000)
    assert np.isfinite(np.asarray(out)).all()
