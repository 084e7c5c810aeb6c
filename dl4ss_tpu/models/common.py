"""Shared init helpers (torch-compatible initializers for parity testing)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    kw, kb = jax.random.split(key)
    scale = 1.0 / np.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -scale, scale)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -scale, scale)
    return p


def linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_init(key, in_ch: int, out_ch: int, kh: int, kw: int,
              dtype=jnp.float32):
    """torch nn.Conv2d default: U(-s, s), s = 1/sqrt(in_ch*kh*kw). HWIO."""
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(in_ch * kh * kw)
    return {
        "w": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), dtype, -scale, scale),
        "b": jax.random.uniform(k2, (out_ch,), dtype, -scale, scale),
    }


def conv2d(p, x, stride=(1, 1), padding="VALID"):
    """x: NHWC. XLA conv — maps straight onto the MXU."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)
