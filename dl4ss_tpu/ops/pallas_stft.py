"""Pallas fused STFT: framing + window + real DFT in one VMEM-resident kernel.

The XLA path (ops/stft.py) materializes the (B, T, L) frame tensor in HBM
between the gather and the DFT matmul; this kernel keeps one utterance's
signal, its frame view, and the DFT output entirely in VMEM — one HBM read
of the signal, one HBM write of the spectrum, with the framing done as k
shifted row-views of the signal reshaped to hop-sized rows (no gather at
all; requires frame_length % frame_shift == 0, true for the reference's
256/128).

Grid: one program per batch row; everything for a 5 s utterance (160 KB
signal + 320 KB frames + 264 KB DFT matrix + 323 KB output) fits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl4ss_tpu.ops.stft import dft_matrix, idft_matrix
from dl4ss_tpu.ops.windows import get_window


def _interpret() -> bool:
    # pallas only compiles natively on TPU; CPU tests run the interpreter
    return jax.default_backend() != "tpu"


def _stft_kernel(x_ref, win_ref, dft_ref, o_ref, *, t: int, hop: int,
                 ratio: int):
    # frame f = [rows[f], rows[f+1], ..., rows[f+ratio-1]] flattened; rather
    # than concatenating offset views (unsupported by Mosaic), the windowed
    # DFT splits into `ratio` partial matmuls over hop-wide segments:
    #   out = sum_i (rows[i:t+i] * win_i) @ dft_i
    rows = x_ref[0]                                  # (t + ratio - 1, hop)
    acc = None
    for i in range(ratio):
        seg = rows[i:t + i] * win_ref[0, i * hop:(i + 1) * hop]
        part = jnp.dot(seg, dft_ref[i * hop:(i + 1) * hop, :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        acc = part if acc is None else acc + part
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("frame_length", "frame_shift",
                                             "window", "center"))
def pallas_stft_ri(x: jax.Array, frame_length: int = 256,
                   frame_shift: int = 128, window: str = "hann",
                   center: bool = True) -> jax.Array:
    """(B, N) -> (B, T, 2F) with [Re | Im] halves on the last axis.

    Same conventions as ops.stft.stft (librosa center/reflect), returned in
    packed-real form (the TPU-native representation — complex arrays cannot
    even be host-transferred on this backend).
    """
    assert frame_length % frame_shift == 0, "kernel needs L % hop == 0"
    ratio = frame_length // frame_shift
    b, n = x.shape
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n = n + 2 * pad
    t = 1 + (n - frame_length) // frame_shift
    # pad the signal so it reshapes exactly into (t + ratio - 1) hop-rows
    need = (t + ratio - 1) * frame_shift
    if need > n:
        x = jnp.pad(x, ((0, 0), (0, need - n)))
    else:
        x = x[:, :need]
    rows = t + ratio - 1
    x = x.reshape(b, rows, frame_shift)  # hop-rows (TPU block = full dims)
    bins2 = 2 * (frame_length // 2 + 1)
    win = jnp.asarray(get_window(window, frame_length))[None, :]
    dft = jnp.asarray(dft_matrix(frame_length))

    kernel = functools.partial(_stft_kernel, t=t, hop=frame_shift,
                               ratio=ratio)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, frame_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, bins2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, bins2), jnp.float32),
        interpret=_interpret(),
    )(x, win, dft)


def pallas_stft(x: jax.Array, frame_length: int = 256, frame_shift: int = 128,
                window: str = "hann", center: bool = True) -> jax.Array:
    """Complex-output wrapper matching ops.stft.stft's signature."""
    ri = pallas_stft_ri(x, frame_length, frame_shift, window, center)
    bins = frame_length // 2 + 1
    return jax.lax.complex(ri[..., :bins], ri[..., bins:])


def pallas_spectral_feature(wav: jax.Array, frame_length: int = 256,
                            frame_shift: int = 128, window: str = "hann"):
    """|STFT| magnitude + packed RI spectrum, fused-kernel path (the
    magnitude comes out of the kernel itself — no XLA pass over the RI
    spectrum; see pallas_stft_features)."""
    mag, re, im = pallas_stft_features(wav, frame_length, frame_shift,
                                       window)
    return mag, jnp.stack([re, im], axis=-1)


# ---------------------------------------------------------------------------
# STFT feature kernel: magnitude + Re/Im emitted from ONE kernel
# ---------------------------------------------------------------------------


def _stft_feat_kernel(x_ref, win_ref, dre_ref, dim_ref, mag_ref, re_ref,
                      im_ref, *, t: int, hop: int, ratio: int):
    rows = x_ref[0]                                  # (t + ratio - 1, hop)
    re = im = None
    for i in range(ratio):
        seg = rows[i:t + i] * win_ref[0, i * hop:(i + 1) * hop]
        re_p = jnp.dot(seg, dre_ref[i * hop:(i + 1) * hop, :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        im_p = jnp.dot(seg, dim_ref[i * hop:(i + 1) * hop, :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        re = re_p if re is None else re + re_p
        im = im_p if im is None else im + im_p
    mag_ref[0] = jnp.sqrt(re * re + im * im).astype(mag_ref.dtype)
    re_ref[0] = re
    im_ref[0] = im


@functools.partial(jax.jit, static_argnames=("frame_length", "frame_shift",
                                             "window", "center", "feat_dtype"))
def pallas_stft_features(x: jax.Array, frame_length: int = 256,
                         frame_shift: int = 128, window: str = "hann",
                         center: bool = True, feat_dtype=jnp.float32):
    """(B, N) -> (mag (B, T, F) in feat_dtype, re (B, T, F), im (B, T, F)).

    One kernel pass emits the magnitude FEATURE (optionally already cast to
    the compute dtype — no separate XLA cast pass over HBM) plus the real
    and imaginary spectrum halves that `pallas_masked_istft` consumes for
    resynthesis. Together the pair removes the phasor from the inference
    pipeline entirely: mask (.) |X| . e^{j angle(X)} == mask (.) X, so the
    magnitude division, the complex multiply, and their HBM round trips all
    vanish (the reference reapplies phase explicitly per utterance on CPU,
    Torch_multi/main_run.py:46-51)."""
    assert frame_length % frame_shift == 0, "kernel needs L % hop == 0"
    ratio = frame_length // frame_shift
    b, n = x.shape
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n = n + 2 * pad
    t = 1 + (n - frame_length) // frame_shift
    need = (t + ratio - 1) * frame_shift
    if need > n:
        x = jnp.pad(x, ((0, 0), (0, need - n)))
    else:
        x = x[:, :need]
    rows = t + ratio - 1
    x = x.reshape(b, rows, frame_shift)
    bins = frame_length // 2 + 1
    win = jnp.asarray(get_window(window, frame_length))[None, :]
    dft = dft_matrix(frame_length)
    dre = jnp.asarray(dft[:, :bins])
    dim = jnp.asarray(dft[:, bins:])

    kernel = functools.partial(_stft_feat_kernel, t=t, hop=frame_shift,
                               ratio=ratio)
    out_blk = pl.BlockSpec((1, t, bins), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mag, re, im = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, frame_shift), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out_blk, out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct((b, t, bins), feat_dtype),
                   jax.ShapeDtypeStruct((b, t, bins), jnp.float32),
                   jax.ShapeDtypeStruct((b, t, bins), jnp.float32)],
        interpret=_interpret(),
    )(x, win, dre, dim)
    return mag, re, im


# ---------------------------------------------------------------------------
# Masked iSTFT: mask apply + iDFT + window + overlap-add in one kernel
# ---------------------------------------------------------------------------


def _masked_istft_kernel(re_ref, im_ref, mask_ref, mre_ref, mim_ref, win_ref,
                         o_ref, *, t: int, hop: int, ratio: int, k: int):
    re = re_ref[0]                                       # (T, F) f32
    im = im_ref[0]
    rows = t + ratio - 1
    for ki in range(k):                                  # static K unroll
        m = mask_ref[0, ki].astype(jnp.float32)
        frames = (jnp.dot(m * re, mre_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
                  + jnp.dot(m * im, mim_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)) * win_ref[0]
        acc = None
        for i in range(ratio):
            seg = frames[:, i * hop:(i + 1) * hop]       # (T, hop)
            parts = []
            if i:
                parts.append(jnp.zeros((i, hop), jnp.float32))
            parts.append(seg)
            if rows - t - i:
                parts.append(jnp.zeros((rows - t - i, hop), jnp.float32))
            shifted = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                       else seg)
            acc = shifted if acc is None else acc + shifted
        o_ref[0, ki] = acc


@functools.partial(jax.jit, static_argnames=("frame_length", "frame_shift",
                                             "window", "center", "length"))
def pallas_masked_istft(re: jax.Array, im: jax.Array, masks: jax.Array,
                        frame_length: int = 256, frame_shift: int = 128,
                        window: str = "hann", center: bool = True,
                        length=None) -> jax.Array:
    """Fused resynthesis of K masked channels from the mixture spectrum.

    re/im (B, T, F) mixture spectrum halves, masks (B, K, T, F) real masks
    -> (B, K, length) waveforms, computing istft(mask * spec) per channel
    with the mask multiply, iDFT matmuls, synthesis window, and overlap-add
    all VMEM-resident (the per-channel frame tensor never touches HBM).
    Equal by construction to the reference's mask.|X|.e^{j angle(X)} -> istft
    resynthesis (Torch_multi/main_run.py:46-51): the phase reapplication
    cancels against the magnitude division."""
    assert frame_length % frame_shift == 0
    ratio = frame_length // frame_shift
    b, k, t, f = masks.shape
    want = (b, t, f)
    if re.shape != want or im.shape != want:
        raise ValueError(
            f"pallas_masked_istft: re/im must be the (B, T, F) mixture "
            f"spectrum matching masks (B, K, T, F)={masks.shape}; got "
            f"re={re.shape} im={im.shape}, expected {want}")
    rows = t + ratio - 1
    bins = frame_length // 2 + 1
    win_np = get_window(window, frame_length)
    win = jnp.asarray(win_np)[None, :]
    idft = idft_matrix(frame_length)
    mre = jnp.asarray(idft[:bins])
    mim = jnp.asarray(idft[bins:])
    kernel = functools.partial(_masked_istft_kernel, t=t, hop=frame_shift,
                               ratio=ratio, k=k)
    spec_blk = pl.BlockSpec((1, t, bins), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    ola = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec_blk,
            spec_blk,
            pl.BlockSpec((1, k, t, bins), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, rows, frame_shift),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, rows, frame_shift),
                                       jnp.float32),
        interpret=_interpret(),
    )(re, im, masks, mre, mim, win)
    ola = ola.reshape(b, k, rows * frame_shift)
    out_len = (t - 1) * frame_shift + frame_length
    ola = ola[..., :out_len]
    wsq = np.zeros(out_len, np.float32)
    for ti in range(t):
        wsq[ti * frame_shift:ti * frame_shift + frame_length] += win_np ** 2
    norm = jnp.asarray(np.where(wsq > 1e-10, 1.0 / np.maximum(wsq, 1e-10),
                                1.0))
    ola = ola * norm
    if center:
        pad = frame_length // 2
        default_len = out_len - 2 * pad
        out = ola[..., pad:out_len - pad]
    else:
        default_len = out_len
        out = ola
    if length is None:
        return out
    if length <= default_len:
        return out[..., :length]
    return jnp.pad(out, ((0, 0), (0, 0), (0, length - default_len)))


# ---------------------------------------------------------------------------
# iSTFT: iDFT + window + overlap-add fused per utterance
# ---------------------------------------------------------------------------


def _istft_kernel(spec_ref, idft_ref, win_ref, o_ref, *, t: int, hop: int,
                  ratio: int):
    frames = jnp.dot(spec_ref[0], idft_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) * win_ref[0]
    rows = t + ratio - 1
    acc = None
    for i in range(ratio):
        seg = frames[:, i * hop:(i + 1) * hop]           # (T, hop)
        parts = []
        if i:
            parts.append(jnp.zeros((i, hop), jnp.float32))
        parts.append(seg)
        if rows - t - i:
            parts.append(jnp.zeros((rows - t - i, hop), jnp.float32))
        shifted = jnp.concatenate(parts, axis=0) if len(parts) > 1 else seg
        acc = shifted if acc is None else acc + shifted
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("frame_length", "frame_shift",
                                             "window", "center", "length"))
def pallas_istft_ri(spec_ri: jax.Array, frame_length: int = 256,
                    frame_shift: int = 128, window: str = "hann",
                    center: bool = True, length=None) -> jax.Array:
    """Fused iSTFT: (B, T, 2F) [Re | Im] -> (B, length) waveforms.

    iDFT matmul + synthesis window + overlap-add happen per utterance inside
    one VMEM-resident kernel (frames never hit HBM); the window-square
    normalization and center trim are cheap elementwise XLA ops outside.
    """
    assert frame_length % frame_shift == 0
    ratio = frame_length // frame_shift
    b, t, _ = spec_ri.shape
    rows = t + ratio - 1
    win_np = get_window(window, frame_length)
    win = jnp.asarray(win_np)[None, :]
    idft = jnp.asarray(idft_matrix(frame_length))
    kernel = functools.partial(_istft_kernel, t=t, hop=frame_shift,
                               ratio=ratio)
    ola = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, 2 * (frame_length // 2 + 1)),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, frame_shift), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, frame_shift), jnp.float32),
        interpret=_interpret(),
    )(spec_ri, idft, win)
    ola = ola.reshape(b, rows * frame_shift)
    out_len = (t - 1) * frame_shift + frame_length
    ola = ola[:, :out_len]
    # window-square normalization (host-side numpy OLA of win^2, a constant)
    wsq = np.zeros(out_len, np.float32)
    for ti in range(t):
        wsq[ti * frame_shift:ti * frame_shift + frame_length] += win_np ** 2
    norm = jnp.asarray(np.where(wsq > 1e-10, 1.0 / np.maximum(wsq, 1e-10),
                                1.0))
    ola = ola * norm
    if center:
        pad = frame_length // 2
        default_len = out_len - 2 * pad
        out = ola[:, pad:out_len - pad]
    else:
        default_len = out_len
        out = ola
    if length is None:
        return out
    if length <= default_len:
        return out[:, :length]
    return jnp.pad(out, ((0, 0), (0, length - default_len)))


def pallas_istft(spec: jax.Array, frame_length: int = 256,
                 frame_shift: int = 128, window: str = "hann",
                 center: bool = True, length=None) -> jax.Array:
    """Complex-input wrapper matching ops.stft.istft's signature."""
    ri = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return pallas_istft_ri(ri, frame_length, frame_shift, window, center,
                           length)
