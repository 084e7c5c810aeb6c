"""Long-signal cross-correlation as matmul-DFT overlap-save.

BSS-Eval needs all lag correlations c_ab[l] = sum_u a[u] b[u+l] between
40000-sample signals for |l| < 512. A direct XLA conv with an N-length
kernel compiles for ~7 minutes on TPU; jnp.fft is unimplemented on this
backend. Instead: classic overlap-save, with the chunk DFTs expressed as
matmuls against DFT matrices (the same trick as ops/stft.py) — a handful of
MXU matmuls, running in microseconds.

Compile-time note: the DFT matrices are generated ON DEVICE from iota with
exact integer phase reduction ((n*k) mod P before the float angle) — baking
them in as numpy constants balloons the HLO shipped to the TPU compile
service (~80 MB MLIR, minutes of compile), and unreduced f32 angles of order
n*k ~ 1e7 would be meaningless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.ops.stft import overlap_add


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def _dft_mats_onchip(p: int):
    """Forward (P, 2B) and inverse (2B, P) real-DFT matrices, built on device."""
    bins = p // 2 + 1
    n = jnp.arange(p, dtype=jnp.int32)[:, None]
    k = jnp.arange(bins, dtype=jnp.int32)[None, :]
    phase = (n * k) % p                         # exact int reduction
    ang = (2.0 * np.pi / p) * phase.astype(jnp.float32)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    dft = jnp.concatenate([cos, -sin], axis=1)  # (P, 2B)
    scale = jnp.full((1, bins), 2.0 / p).at[0, 0].set(1.0 / p)
    if p % 2 == 0:
        scale = scale.at[0, bins - 1].set(1.0 / p)
    idft = jnp.concatenate([(scale * cos).T, (-(scale * sin)).T], axis=0)
    return dft, idft


@functools.partial(jax.jit, static_argnames=("lo", "hi", "fft_size"))
def _xcorr_impl(a_sigs, b_sigs, lo: int, hi: int, fft_size: int):
    ka, na = a_sigs.shape
    kb, nb = b_sigs.shape
    nlag = hi - lo + 1
    p = fft_size
    bins = p // 2 + 1
    dft, idft = _dft_mats_onchip(p)
    chunk = p - nlag + 1                       # a-chunk length, no wraparound
    m = -(-na // chunk)                        # number of chunks
    hp = jax.lax.Precision.HIGHEST

    # a chunks: pad to m*chunk then pad each chunk to P
    a_pad = jnp.pad(a_sigs.astype(jnp.float32), ((0, 0), (0, m * chunk - na)))
    a_chunks = a_pad.reshape(ka, m, chunk)
    a_chunks = jnp.pad(a_chunks, ((0, 0), (0, 0), (0, p - chunk)))

    # b segments: chunk i covers b[i*chunk + lo : i*chunk + lo + P)
    right_pad = p + max(hi, 0) + max(na - nb, 0) + chunk
    b_full = jnp.pad(b_sigs.astype(jnp.float32),
                     ((0, 0), (max(-lo, 0), right_pad)))
    start0 = max(lo, 0)
    idx = (start0 + np.arange(m)[:, None] * chunk + np.arange(p)[None, :])
    b_chunks = b_full[:, idx]                  # (Kb, m, P)

    fa = jnp.dot(a_chunks, dft, precision=hp,
                 preferred_element_type=jnp.float32)          # (Ka, m, 2B)
    fb = jnp.dot(b_chunks, dft, precision=hp,
                 preferred_element_type=jnp.float32)          # (Kb, m, 2B)
    ar, ai = fa[..., :bins], fa[..., bins:]
    br, bi = fb[..., :bins], fb[..., bins:]
    # conj(A) * B summed over chunks
    zr = (jnp.einsum("amf,bmf->baf", ar, br, precision=hp) +
          jnp.einsum("amf,bmf->baf", ai, bi, precision=hp))
    zi = (jnp.einsum("amf,bmf->baf", ar, bi, precision=hp) -
          jnp.einsum("amf,bmf->baf", ai, br, precision=hp))
    z = jnp.concatenate([zr, zi], axis=-1)                     # (Kb, Ka, 2B)
    c = jnp.dot(z, idft, precision=hp,
                preferred_element_type=jnp.float32)            # (Kb, Ka, P)
    return c[..., :nlag]


def xcorr(a_sigs: jax.Array, b_sigs: jax.Array, lo: int, hi: int,
          fft_size: int = 0) -> jax.Array:
    """c[b, a, l] = sum_u a_sigs[a, u] * b_sigs[b, u + l], l in [lo, hi].

    a_sigs (Ka, Na), b_sigs (Kb, Nb); indices outside either signal read 0.
    Returns (Kb, Ka, hi - lo + 1) float32.
    """
    nlag = hi - lo + 1
    p = fft_size or max(1024, _next_pow2(2 * nlag))
    return _xcorr_impl(a_sigs, b_sigs, lo, hi, p)


def _complex_mul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


@functools.partial(jax.jit, static_argnames=("sum_channels", "fft_size"))
def ola_conv(sigs: jax.Array, kernels: jax.Array,
             sum_channels: bool = True, fft_size: int = 0) -> jax.Array:
    """Linear convolution y = sigs * kernels via matmul-DFT overlap-save.

    sigs (Ka, N), kernels (J, Ka, F).  Returns
      (J, N + F - 1)        when sum_channels (summed over the Ka axis), or
      (J, Ka, N + F - 1)    otherwise.

    Exists because a vmapped XLA conv with per-batch kernels lowers to a
    grouped conv, which costs minutes of TPU compile; this is matmuls only.
    """
    ka, n = sigs.shape
    j, ka2, f = kernels.shape
    assert ka == ka2
    p = fft_size or max(1024, _next_pow2(2 * f))
    bins = p // 2 + 1
    chunk = p - f + 1
    m = -(-n // chunk)
    hp = jax.lax.Precision.HIGHEST
    dft, idft = _dft_mats_onchip(p)

    s_pad = jnp.pad(sigs.astype(jnp.float32), ((0, 0), (0, m * chunk - n)))
    s_chunks = jnp.pad(s_pad.reshape(ka, m, chunk),
                       ((0, 0), (0, 0), (0, p - chunk)))
    k_pad = jnp.pad(kernels.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, p - f)))

    fs = jnp.dot(s_chunks, dft, precision=hp,
                 preferred_element_type=jnp.float32)       # (Ka, m, 2B)
    fk = jnp.dot(k_pad, dft, precision=hp,
                 preferred_element_type=jnp.float32)       # (J, Ka, 2B)
    sr, si = fs[..., :bins], fs[..., bins:]
    kr, ki = fk[..., :bins], fk[..., bins:]
    if sum_channels:
        yr = (jnp.einsum("amf,jaf->jmf", sr, kr, precision=hp) -
              jnp.einsum("amf,jaf->jmf", si, ki, precision=hp))
        yi = (jnp.einsum("amf,jaf->jmf", sr, ki, precision=hp) +
              jnp.einsum("amf,jaf->jmf", si, kr, precision=hp))
        lead = (j,)
    else:
        yr, yi = _complex_mul(sr[None], si[None], kr[:, :, None], ki[:, :, None])
        lead = (j, ka)                                      # (J, Ka, m, 2B)
    y = jnp.dot(jnp.concatenate([yr, yi], axis=-1), idft, precision=hp,
                preferred_element_type=jnp.float32)         # (..., m, P)
    # chunk outputs are valid on [0, chunk + F - 1); overlap-add at hop=chunk
    y = y[..., :chunk + f - 1]
    flat = y.reshape((-1,) + y.shape[-2:])
    out = overlap_add(flat, chunk)
    return out.reshape(lead + (-1,))[..., :n + f - 1]
