"""Complex-ratio-mask (cRM) math.

Reproduces TDAA's phase-aware path: real/imag packed as a trailing dim-2
channel (TDAA_beta/predata_fromList_cRM_123.py:37-42), the tanh-compressed
mask K*tanh(energy) with K=10, C=0.1
(TDAA_beta/main_run_sstune_cRM_EvalVer.py:28-29,269), the uncompression
-1/C*log((K-M)/(K+M)) (:512), and the complex multiply
(Mr*Xr - Mi*Xi, Mr*Xi + Mi*Xr) (:552-553).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_ri(spec: jax.Array) -> jax.Array:
    """complex (..., T, F) -> real (..., T, F, 2) with [real, imag] channels."""
    return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)


def unpack_ri(ri: jax.Array) -> jax.Array:
    """real (..., T, F, 2) -> complex (..., T, F)."""
    return jax.lax.complex(ri[..., 0], ri[..., 1])


def crm_compress(mask_ri: jax.Array, k: float = 10.0, c: float = 0.1
                 ) -> jax.Array:
    """M_compressed = K * tanh(C/2 * M) = K*(1-e^{-CM})/(1+e^{-CM}).

    Exact inverse of `crm_uncompress` (Williamson-style cRM compression).
    """
    return k * jnp.tanh(0.5 * c * mask_ri)


def crm_uncompress(mask_ri: jax.Array, k: float = 10.0, c: float = 0.1,
                   eps: float = 1e-6) -> jax.Array:
    """M = -1/C * log((K - M_c) / (K + M_c)) = (2/C) * artanh(M_c/K).

    The exact formula the reference applies to the K*tanh-bounded head output
    (main_run_sstune_cRM_EvalVer.py:512). Inputs are clipped inside (-K, K)
    to keep the log finite.
    """
    m = jnp.clip(mask_ri, -k + eps, k - eps)
    return -(1.0 / c) * jnp.log((k - m) / (k + m))


def complex_mask_apply(mask_ri: jax.Array, spec_ri: jax.Array) -> jax.Array:
    """(Mr + iMi) * (Xr + iXi), both packed as trailing dim-2 channels."""
    mr, mi = mask_ri[..., 0], mask_ri[..., 1]
    xr, xi = spec_ri[..., 0], spec_ri[..., 1]
    return jnp.stack([mr * xr - mi * xi, mr * xi + mi * xr], axis=-1)
