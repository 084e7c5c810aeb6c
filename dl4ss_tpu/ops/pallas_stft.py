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

from dl4ss_tpu.ops.stft import dft_matrix
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
    """|STFT| magnitude + packed RI spectrum, fused-kernel path."""
    ri = pallas_stft_ri(wav, frame_length, frame_shift, window)
    bins = frame_length // 2 + 1
    re, im = ri[..., :bins], ri[..., bins:]
    mag = jnp.sqrt(re * re + im * im)
    return mag, jnp.stack([re, im], axis=-1)
