"""On-device STFT / iSTFT as MXU matmuls.

Replaces the reference's CPU hot loop — per-utterance `librosa.stft(wav, 256,
128)` calls in the data generators (Torch_multi/predata_multiAims.py:168-206,
TDAA_beta/predata_fromList.py:166-199) and the `librosa.istft` resynthesis in
every bss_eval helper (Torch_multi/main_run.py:48-51) — with a fully jittable,
batched formulation:

  * framing is a static gather (no dynamic shapes),
  * the 256-point real DFT is one (L x 2F) matmul against a constant DFT
    matrix, which XLA tiles onto the MXU and fuses with the windowing,
  * overlap-add is a reshape decomposition into ceil(L/hop) non-overlapping
    interleaved frame groups — no scatter, no serial accumulation.

Conventions match librosa's (center=True reflect padding, periodic Hann
default, spectra transposed to (frames, bins) as the reference stores them).
A centered 5 s / 8 kHz utterance gives 313 frames x 129 bins, and the istft
round trip returns (T-1)*hop = 39936 samples — the exact `min_len` the
reference hard-codes (Torch_multi/main_run_multi_selfSS_subeval.py:71).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.ops.windows import get_window


# ---------------------------------------------------------------------------
# DFT matrices (constants, computed once per (L, F) in float64 then cast)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def dft_matrix(frame_length: int) -> np.ndarray:
    """(L, 2F) real matrix: frames @ M -> [Re | Im] of the rfft."""
    length = frame_length
    bins = length // 2 + 1
    n = np.arange(length)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * k / length
    real = np.cos(ang)
    imag = -np.sin(ang)
    return np.concatenate([real, imag], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def idft_matrix(frame_length: int) -> np.ndarray:
    """(2F, L) real matrix: [Re | Im] @ M -> time-domain frame (inverse rfft)."""
    length = frame_length
    bins = length // 2 + 1
    n = np.arange(length)[None, :]
    k = np.arange(bins)[:, None]
    ang = 2.0 * np.pi * n * k / length
    scale = np.full((bins, 1), 2.0 / length)
    scale[0] = 1.0 / length
    if length % 2 == 0:
        scale[-1] = 1.0 / length
    real_part = scale * np.cos(ang)      # multiplies Re X
    imag_part = -scale * np.sin(ang)     # multiplies Im X
    return np.concatenate([real_part, imag_part], axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / overlap-add
# ---------------------------------------------------------------------------


def num_frames(num_samples: int, frame_length: int, frame_shift: int,
               center: bool = True) -> int:
    if center:
        padded = num_samples + 2 * (frame_length // 2)
    else:
        padded = num_samples
    return 1 + (padded - frame_length) // frame_shift


def frame_signal(x: jax.Array, frame_length: int, frame_shift: int,
                 center: bool = True) -> jax.Array:
    """(..., N) -> (..., T, L) by static strided gather."""
    if center:
        pad = frame_length // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_width, mode="reflect")
    n = x.shape[-1]
    t = 1 + (n - frame_length) // frame_shift
    idx = (np.arange(t)[:, None] * frame_shift +
           np.arange(frame_length)[None, :])
    return x[..., idx]


def overlap_add(frames: jax.Array, frame_shift: int) -> jax.Array:
    """(..., T, L) -> (..., (T-1)*hop + L) without scatter.

    Decomposes the frame sequence into R = ceil(L/hop) interleaved groups;
    within a group consecutive frames are >= L samples apart, so each group is
    a plain pad+reshape, and the groups sum elementwise.
    """
    *lead, t, length = frames.shape
    hop = frame_shift
    r = -(-length // hop)  # ceil
    out_len = (t - 1) * hop + length
    t_pad = -(-t // r) * r
    if t_pad != t:
        pad_width = [(0, 0)] * len(lead) + [(0, t_pad - t), (0, 0)]
        frames = jnp.pad(frames, pad_width)
    group_stride = r * hop
    full_len = (t_pad - 1) * hop + length + group_stride  # covers every group
    out = None
    for g in range(r):
        grp = frames[..., g::r, :]                       # (..., t_pad//r, L)
        if length < group_stride:
            pad_width = [(0, 0)] * len(lead) + [(0, 0), (0, group_stride - length)]
            grp = jnp.pad(grp, pad_width)
        flat = grp.reshape(*lead, -1)                    # non-overlapping now
        start = g * hop
        flat = jnp.pad(flat, [(0, 0)] * len(lead) +
                       [(start, full_len - start - flat.shape[-1])])
        out = flat if out is None else out + flat
    return out[..., :out_len]


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------


def stft(x: jax.Array, frame_length: int = 256, frame_shift: int = 128,
         window: str = "hann", center: bool = True,
         dtype=jnp.float32) -> jax.Array:
    """Batched STFT. (..., N) -> complex64 (..., T, F).

    Note the (frames, bins) layout — the transpose the reference applies to
    every librosa call (`np.transpose(...stft(...))`, predata_multiAims.py:200).
    """
    win = jnp.asarray(get_window(window, frame_length), dtype)
    mat = jnp.asarray(dft_matrix(frame_length), dtype)
    frames = frame_signal(x.astype(dtype), frame_length, frame_shift, center)
    # HIGHEST keeps the DFT exact to ~1e-6 on the MXU (vs ~2e-2 at default
    # bf16-pass precision) and measures no slower for these (L x 2F) shapes.
    ri = jnp.dot(frames * win, mat, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    bins = frame_length // 2 + 1
    return jax.lax.complex(ri[..., :bins], ri[..., bins:])


def istft(spec: jax.Array, frame_length: int = 256, frame_shift: int = 128,
          window: str = "hann", center: bool = True,
          length: Optional[int] = None, dtype=jnp.float32) -> jax.Array:
    """Batched iSTFT with window-square normalization (librosa semantics).

    complex (..., T, F) -> (..., length) where length defaults to (T-1)*hop
    for center=True (librosa's trimmed output).
    """
    t = spec.shape[-2]
    win = jnp.asarray(get_window(window, frame_length), dtype)
    mat = jnp.asarray(idft_matrix(frame_length), dtype)
    ri = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-1).astype(dtype)
    frames = jnp.dot(ri, mat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    ola = overlap_add(frames * win, frame_shift)
    wsq = jnp.tile(win[None, :] ** 2, (t, 1))
    wsum = overlap_add(wsq, frame_shift)
    ola = jnp.where(wsum > 1e-10, ola / jnp.maximum(wsum, 1e-10), ola)
    if center:
        pad = frame_length // 2
        full = (t - 1) * frame_shift + frame_length
        default_len = full - 2 * pad
        out = ola[..., pad:full - pad]
    else:
        default_len = (t - 1) * frame_shift + frame_length
        out = ola
    if length is None:
        return out
    if length <= default_len:
        return out[..., :length]
    pad_width = [(0, 0)] * (out.ndim - 1) + [(0, length - default_len)]
    return jnp.pad(out, pad_width)


def masked_resynthesis(spec: jax.Array, masks: jax.Array, cfg,
                       length: Optional[int] = None) -> jax.Array:
    """Waveforms of K masked channels: istft(mask (.) X) per channel.

    Identical math to the reference's explicit phase reapplication
    mask . |X| . e^{j angle X} -> istft (Torch_multi/main_run.py:46-51) —
    the magnitude division inside the phasor cancels — but with no phasor,
    no complex multiply, and (under cfg.use_pallas_stft) the mask apply +
    iDFT + overlap-add fused in one VMEM-resident kernel. Magnitude masks
    only; the cRM path resynthesizes from its predicted complex spectrum.

    Differentiable on every path: the fused Pallas kernel has no native
    VJP, so under use_pallas_stft the backward pass recomputes through the
    algebraically-identical XLA istft (custom_vjp below) — forward stays
    fused; a differentiated caller (e.g. an si_sdr-style loss) pays one
    XLA re-forward instead of hitting an opaque Pallas autodiff error.
    (The production train steps bypass this wrapper and differentiate
    istft_cfg directly, train/steps.py.)

    spec (B, T, F) complex mixture, masks (B, K, T, F) -> (B, K, length).
    """
    # the kernel's hop-row framing needs L % hop == 0 (true for the
    # reference's 256/128); other valid hops take the XLA route below
    if cfg.use_pallas_stft and cfg.frame_length % cfg.frame_shift == 0:
        return _fused_masked_resynthesis(jnp.real(spec), jnp.imag(spec),
                                         masks, cfg, length)
    return istft(masks.astype(jnp.float32) * spec[:, None], cfg.frame_length,
                 cfg.frame_shift, window=cfg.window, center=cfg.center,
                 length=length)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_masked_resynthesis(re, im, masks, cfg, length):
    from dl4ss_tpu.ops.pallas_stft import pallas_masked_istft
    return pallas_masked_istft(re, im, masks, cfg.frame_length,
                               cfg.frame_shift, window=cfg.window,
                               center=cfg.center, length=length)


def _xla_masked_resynthesis(re, im, masks, cfg, length):
    spec = (re + 1j * im)[:, None]
    return istft(masks.astype(jnp.float32) * spec, cfg.frame_length,
                 cfg.frame_shift, window=cfg.window, center=cfg.center,
                 length=length)


def _fused_mr_fwd(re, im, masks, cfg, length):
    return _fused_masked_resynthesis(re, im, masks, cfg, length), \
        (re, im, masks)


def _fused_mr_bwd(cfg, length, res, g):
    # recompute-based backward through the XLA-equivalent math: same
    # values (the kernel is parity-checked against this path on chip),
    # one extra forward — the price of a fused forward without a
    # hand-written backward kernel
    re, im, masks = res
    _, vjp = jax.vjp(
        lambda r, i, m: _xla_masked_resynthesis(r, i, m, cfg, length),
        re, im, masks)
    return vjp(g)


_fused_masked_resynthesis.defvjp(_fused_mr_fwd, _fused_mr_bwd)


def magnitude_and_phase(spec: jax.Array, eps: float = 1e-8
                        ) -> Tuple[jax.Array, jax.Array]:
    """Split a complex spectrogram into |X| and the unit phasor X/|X|.

    The reference stores the raw complex mix spectrogram and reapplies phase
    as `mag * exp(1j*angle(mix))` (Torch_multi/main_run.py:46-48); keeping the
    phasor avoids transcendental angle/exp on device.
    """
    mag = jnp.abs(spec)
    phasor = spec / jnp.maximum(mag, eps).astype(spec.dtype)
    return mag, phasor


def spectral_feature(wav: jax.Array, frame_length: int = 256,
                     frame_shift: int = 128, window: str = "hann",
                     log_spectral: bool = False,
                     log_window: str = "sine",
                     center: bool = True) -> Tuple[jax.Array, jax.Array]:
    """wav -> (feature, complex spectrogram).

    Linear path: |STFT| with Hann (predata_multiAims.py:200-206).  Log path:
    log(|STFT|+eps) with the sine window (predata_multiAims.py:195-197,
    config.py:240) — both gated by IS_LOG_SPECTRAL in the reference.
    """
    spec = stft(wav, frame_length, frame_shift, window=window, center=center)
    if log_spectral:
        lspec = stft(wav, frame_length, frame_shift, window=log_window,
                     center=center)
        feat = jnp.log(jnp.abs(lspec) + np.spacing(np.float32(1.0)))
    else:
        feat = jnp.abs(spec)
    return feat, spec


# ---- Config-aware conveniences: the analysis window and centering are
# Config knobs (cfg.window / cfg.center); every batch-path call site goes
# through these so the knobs actually govern the DSP -------------------------


def stft_cfg(wav: jax.Array, cfg) -> jax.Array:
    return stft(wav, cfg.frame_length, cfg.frame_shift, window=cfg.window,
                center=cfg.center)


def istft_cfg(spec: jax.Array, cfg, length: Optional[int] = None
              ) -> jax.Array:
    return istft(spec, cfg.frame_length, cfg.frame_shift, window=cfg.window,
                 center=cfg.center, length=length)


def spectral_feature_cfg(wav: jax.Array, cfg) -> Tuple[jax.Array, jax.Array]:
    return spectral_feature(wav, cfg.frame_length, cfg.frame_shift,
                            window=cfg.window, log_spectral=cfg.log_spectral,
                            center=cfg.center)
