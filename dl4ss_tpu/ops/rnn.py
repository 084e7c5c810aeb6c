"""TPU-first LSTM / GRU recurrences.

Replaces the reference's cuDNN `nn.GRU`/`nn.LSTM` stacks (the MIX_SPEECH
encoder, Torch_multi/main_run.py:258-282; the 2x-wide TDAA classifier,
TDAA_beta/main_run_sstune_TestVer.py:324-332; the 4-layer TDAA encoder,
TestVer:284-310) with a `jax.lax.scan` formulation designed for the MXU:

  * the input projection `x_t @ W` for ALL timesteps is hoisted out of the
    scan into one large (B*T, D) x (D, GH) matmul — only the small recurrent
    `h @ U` matmul stays sequential,
  * both directions of a bidirectional layer share one scan (the reversed
    sequence is stacked on the batch axis), halving scan overhead,
  * gate layout matches torch's (i,f,g,o for LSTM; r,z,n for GRU, with the
    GRU candidate using r * (h@U_n + b_n)) so parity can be tested directly
    against `torch.nn.LSTM/GRU` on CPU.

Pure functions over parameter pytrees; the flax modules in
`dl4ss_tpu.models` own the parameters and call into these.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Unrolling the scan body amortizes per-iteration loop overhead on TPU
# (~12% on the reference-scale forward); 8 is safe for any T (jax handles
# the remainder).
_UNROLL = 8


def _uniform(key, shape, scale, dtype):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


def _cell_init(key, input_size: int, hidden_size: int, gates: int,
               dtype=jnp.float32) -> Params:
    """Torch-style init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases."""
    k_wx, k_wh, k_bx, k_bh = jax.random.split(key, 4)
    scale = 1.0 / np.sqrt(hidden_size)
    g = gates * hidden_size
    return {
        "wx": _uniform(k_wx, (input_size, g), scale, dtype),
        "wh": _uniform(k_wh, (hidden_size, g), scale, dtype),
        "bx": _uniform(k_bx, (g,), scale, dtype),
        "bh": _uniform(k_bh, (g,), scale, dtype),
    }


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32) -> Params:
    return _cell_init(key, input_size, hidden_size, 4, dtype)


def gru_init(key, input_size: int, hidden_size: int, dtype=jnp.float32) -> Params:
    return _cell_init(key, input_size, hidden_size, 3, dtype)


def _lstm_scan(params: Params, xproj: jax.Array, h0: jax.Array, c0: jax.Array
               ) -> jax.Array:
    """xproj: (T, B, 4H) precomputed input projection. Returns hs (T, B, H)."""
    wh = params["wh"]
    hidden = h0.shape[-1]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h, wh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h.astype(h0.dtype), c.astype(c0.dtype)), h.astype(h0.dtype)

    del hidden
    (_, _), hs = jax.lax.scan(step, (h0, c0), xproj,
                               unroll=_UNROLL)
    return hs


def _gru_scan(params: Params, xproj: jax.Array, xproj_n: jax.Array,
              h0: jax.Array) -> jax.Array:
    """xproj: (T, B, 2H) for r,z; xproj_n: (T, B, H) for the candidate.

    Torch GRU: n = tanh(x@Wn + bn_x + r * (h@Un + bn_h));
               h' = (1 - z) * n + z * h.
    """
    wh = params["wh"]
    bh = params["bh"]
    hidden = h0.shape[-1]
    wh_rz, wh_n = wh[:, :2 * hidden], wh[:, 2 * hidden:]
    bh_n = bh[2 * hidden:]

    def step(h, xp):
        xp_rz, xp_n = xp
        rz = xp_rz + jnp.dot(h, wh_rz, preferred_element_type=jnp.float32)
        r, z = jnp.split(jax.nn.sigmoid(rz), 2, axis=-1)
        n = jnp.tanh(xp_n + r * (jnp.dot(h, wh_n, preferred_element_type=jnp.float32) + bh_n))
        h = (1.0 - z) * n + z * h
        h = h.astype(h0.dtype)
        return h, h

    _, hs = jax.lax.scan(step, h0, (xproj, xproj_n), unroll=_UNROLL)
    return hs


def _run_layer(params: Params, x: jax.Array, cell: str) -> jax.Array:
    """Unidirectional layer. x: (B, T, D) -> (B, T, H)."""
    b, t, _ = x.shape
    hidden = params["wh"].shape[0]
    dtype = x.dtype
    xproj = (jnp.dot(x, params["wx"], preferred_element_type=jnp.float32)
             + params["bx"]).astype(dtype)
    xproj = jnp.swapaxes(xproj, 0, 1)  # (T, B, G)
    h0 = jnp.zeros((b, hidden), dtype)
    if cell == "lstm":
        xproj = xproj + params["bh"].astype(dtype)
        hs = _lstm_scan(params, xproj, h0, h0)
    elif cell == "gru":
        bh_rz = params["bh"][:2 * hidden].astype(dtype)
        hs = _gru_scan(params, xproj[..., :2 * hidden] + bh_rz,
                       xproj[..., 2 * hidden:], h0)
    else:
        raise ValueError(f"unknown cell {cell!r}")
    return jnp.swapaxes(hs, 0, 1)


def _run_layer_bidir_pallas(fwd: Params, bwd: Params, x: jax.Array,
                            cell: str) -> jax.Array:
    """Bidirectional layer on the fused Pallas scan kernels
    (ops/pallas_rnn.py): input projections as one XLA matmul, the whole
    sequential loop in one kernel with VMEM-resident recurrent weights.

    The hidden width is zero-padded to a 128-lane multiple HERE so the
    kernel can run all G gates as ONE fused (B, Hp) x (Hp, G*Hp) matmul
    per direction per step with 128-aligned gate slices (Mosaic's
    constraint for the reference's H=300). Padded h lanes stay exactly 0
    through both recurrences, so the unpadded slice is bit-identical."""
    from dl4ss_tpu.ops import pallas_rnn

    b, t, _ = x.shape
    hidden = fwd["wh"].shape[0]
    gates = fwd["wh"].shape[1] // hidden
    hp = -(-hidden // 128) * 128
    pad = hp - hidden
    f32 = jnp.float32
    # bf16 pipelines keep the kernel's MXU tiles on native bf16 (the scan
    # path's numerics: inputs in compute dtype, f32 accumulation)
    kdtype = x.dtype if x.dtype == jnp.bfloat16 else f32

    # fused recurrent weights + the backward's gradient accumulator must
    # both sit in VMEM (~16 MB/core) beside the streamed blocks; very wide
    # layers fall back to the shared-scan path instead of failing to compile
    if 2 * 2 * hp * gates * hp * 4 > 12 * 1024 * 1024:
        return _run_layer_bidir(fwd, bwd, x, cell)

    def pad_cols(w):
        """(..., G*H) -> (..., G*Hp): zero-pad each gate to the lane tile."""
        if pad == 0:
            return w.astype(f32)
        widths = [(0, 0)] * (w.ndim - 1) + [(0, pad)]
        return jnp.concatenate([jnp.pad(p.astype(f32), widths)
                                for p in jnp.split(w, gates, axis=-1)],
                               axis=-1)

    def prep(p):
        wx = pad_cols(p["wx"])                                 # (Din, G*Hp)
        wh = jnp.pad(pad_cols(p["wh"]), ((0, pad), (0, 0)))    # (Hp, G*Hp)
        return wx, wh, pad_cols(p["bx"]), pad_cols(p["bh"])

    wx_f, wh_f, bx_f, bh_f = prep(fwd)
    wx_b, wh_b, bx_b, bh_b = prep(bwd)
    xr = jnp.flip(x, axis=1)

    if cell == "gru":
        # fold bh into the r,z segments; the candidate's bh_n must stay
        # inside r * (h @ U_n + bh_n) (torch GRU layout)
        n_mask = jnp.concatenate([jnp.ones((2 * hp,), f32),
                                  jnp.zeros((hp,), f32)])
        bias_f, bias_b = bx_f + bh_f * n_mask, bx_b + bh_b * n_mask
        bh_n = jnp.stack([bh_f[None, 2 * hp:], bh_b[None, 2 * hp:]])
    elif cell == "lstm":
        bias_f, bias_b = bx_f + bh_f, bx_b + bh_b
    else:
        raise ValueError(f"unknown cell {cell!r}")

    def proj(xx, wx, bias):
        return (jnp.dot(xx, wx.astype(xx.dtype),
                        preferred_element_type=jnp.float32)
                + bias).astype(kdtype)

    xp = jnp.stack([proj(x, wx_f, bias_f), proj(xr, wx_b, bias_b)],
                   axis=2)                                  # (B, T, D, G*Hp)
    xp = jnp.transpose(xp, (1, 2, 0, 3))                    # (T, D, B, G*Hp)
    wh = jnp.stack([wh_f, wh_b]).astype(kdtype)             # (D, Hp, G*Hp)

    if cell == "gru":
        hs = pallas_rnn.pallas_gru_scan(xp, wh, bh_n)
    else:
        hs = pallas_rnn.pallas_lstm_scan(xp, wh)
    # (T, D, B, Hp) -> (B, T, 2H) with the reverse direction unflipped
    fwd_out = jnp.transpose(hs[:, 0, :, :hidden], (1, 0, 2))
    bwd_out = jnp.flip(jnp.transpose(hs[:, 1, :, :hidden], (1, 0, 2)),
                       axis=1)
    return jnp.concatenate([fwd_out, bwd_out], axis=-1).astype(x.dtype)


def _run_layer_bidir(fwd: Params, bwd: Params, x: jax.Array, cell: str
                     ) -> jax.Array:
    """Bidirectional layer sharing ONE scan: the time-reversed sequence rides
    the batch axis, so the sequential recurrent matmul is (2B, H) x (H, GH)
    — better MXU occupancy than two half-size scans."""
    xr = jnp.flip(x, axis=1)
    b, t, _ = x.shape
    hidden = fwd["wh"].shape[0]
    dtype = x.dtype

    def proj(p, xx):
        return (jnp.dot(xx, p["wx"], preferred_element_type=jnp.float32)
                + p["bx"]).astype(dtype)

    xp = jnp.concatenate([proj(fwd, x), proj(bwd, xr)], axis=0)  # (2B, T, G)
    xp = jnp.swapaxes(xp, 0, 1)                                  # (T, 2B, G)
    wh = jnp.stack([fwd["wh"], bwd["wh"]])                       # (2, H, G)
    bh = jnp.stack([fwd["bh"], bwd["bh"]])
    # Block-diagonal recurrent weights via per-half split keeps one scan while
    # using each direction's own U; implemented by reshaping (T, 2, B, G).
    xp = xp.reshape(t, 2, b, -1)
    h0 = jnp.zeros((2, b, hidden), dtype)

    if cell == "lstm":
        def step(carry, xp_t):
            h, c = carry
            gates = xp_t + jnp.einsum(
                "dbh,dhg->dbg", h, wh,
                preferred_element_type=jnp.float32) + bh[:, None, :]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h.astype(dtype), c.astype(dtype)), h.astype(dtype)

        (_, _), hs = jax.lax.scan(step, (h0, h0), xp, unroll=_UNROLL)
    else:
        wh_rz, wh_n = wh[..., :2 * hidden], wh[..., 2 * hidden:]
        bh_rz = bh[:, None, :2 * hidden]
        bh_n = bh[:, None, 2 * hidden:]

        def step(h, xp_t):
            rz = xp_t[..., :2 * hidden] + jnp.einsum(
                "dbh,dhg->dbg", h, wh_rz,
                preferred_element_type=jnp.float32) + bh_rz
            r, z = jnp.split(jax.nn.sigmoid(rz), 2, axis=-1)
            n = jnp.tanh(xp_t[..., 2 * hidden:] + r * (jnp.einsum(
                "dbh,dhg->dbg", h, wh_n,
                preferred_element_type=jnp.float32) + bh_n))
            h = ((1.0 - z) * n + z * h).astype(dtype)
            return h, h

        _, hs = jax.lax.scan(step, h0, xp, unroll=_UNROLL)

    hs = jnp.swapaxes(hs, 0, 1)          # (2, T, B, H)
    fwd_out = jnp.swapaxes(hs[0], 0, 1)  # (B, T, H)
    bwd_out = jnp.flip(jnp.swapaxes(hs[1], 0, 1), axis=1)
    return jnp.concatenate([fwd_out, bwd_out], axis=-1)


def rnn_init(key, cell: str, input_size: int, hidden_size: int,
             num_layers: int, bidirectional: bool = True,
             dtype=jnp.float32) -> List[Params]:
    """Initialize a (possibly bidirectional) multi-layer stack."""
    init = lstm_init if cell == "lstm" else gru_init
    layers = []
    d = input_size
    for li in range(num_layers):
        key, k1, k2 = jax.random.split(key, 3)
        if bidirectional:
            layers.append({"fwd": init(k1, d, hidden_size, dtype),
                           "bwd": init(k2, d, hidden_size, dtype)})
            d = 2 * hidden_size
        else:
            layers.append({"fwd": init(k1, d, hidden_size, dtype)})
            d = hidden_size
    return layers


def bidirectional_rnn(layers: List[Params], x: jax.Array, cell: str,
                      remat: bool = False, use_pallas: bool = False
                      ) -> jax.Array:
    """Multi-layer (bi)RNN: (B, T, D) -> (B, T, 2H) (or (B, T, H) unidir)."""
    def one_layer(lp, xx):
        if "bwd" in lp:
            if use_pallas:
                return _run_layer_bidir_pallas(lp["fwd"], lp["bwd"], xx, cell)
            return _run_layer_bidir(lp["fwd"], lp["bwd"], xx, cell)
        return _run_layer(lp["fwd"], xx, cell)

    for lp in layers:
        layer_fn = functools.partial(one_layer, lp)
        if remat:
            layer_fn = jax.checkpoint(layer_fn)
        x = layer_fn(x)
    return x
