"""Fused projection + dot-attention mask head (Pallas).

The encoder's Dense(2H -> F*E) + tanh and the dot mask head
sigmoid(<emb_map, query>) together are ~47% of headline inference time
(docs/BENCHMARKS.md round-3 stage profile): the XLA path materializes the
(B, T, F, E) embedding grid in HBM (~775 MB at B=192) between two
contractions, because XLA cannot fuse through a matmul boundary. This
kernel computes, per (batch, time-tile) grid cell, entirely in VMEM:

    acc  = h_tile @ W + b          (Tt, F*E)   MXU, f32 accumulate
    g    = tanh(acc)                           VPU
    e_k  = (g * qrep_k) @ S        (Tt, F)     MXU block-sum over E
    mask = sigmoid(e_k)                        -> (B, K, Tt, F)

where qrep_k is the query q_k tiled F times (column f*E+e holds q_k[e])
and S is the 0/1 block-sum matrix S[f*E+e, f'] = [f == f'], so the E
contraction of einsum("btfe,bke->bktf") (models/attention.py:38-41,
rebuilding ATTENTION 'dot', Torch_multi/main_run.py:201-210) becomes one
MXU matmul — Mosaic's 128-aligned-lane rule forbids slicing the (Tt, F*E)
accumulator into E-wide pieces directly.

The embedding grid never touches HBM: traffic drops from
read(h) + write(emb) + read(emb) + write(masks) to read(h) + write(masks).
W rides in VMEM as a whole-array block and stays resident across the grid.

Backward: hand-written Pallas kernel (see the round-4 block below) — no
XLA re-forward, tanh tiles recomputed in VMEM, one bf16 dacc
materialization feeding three plain XLA matmuls for dW/dh/db. Activation
storage is the masks (25x smaller than the embedding grid). Measured at
B=128 bf16: fused train step 31.1 -> 26.3 ms (1.18x) over the XLA
mask-head path, so training now takes the fused head too (the
recompute-based VJP of rounds 2-3 was a measured net loss and kept
training on XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# time-tile: swept on v5e at the reference shape (docs/BENCHMARKS.md r3):
# 64 -> 6.55 ms, 128 -> 7.43 ms, 160 -> 6.47 ms for the B=192 stage
# (XLA path: 8.24 ms); 160 divides the padded T=320 evenly and won
_TILE_T = 160

# backward time-tile default — rationale in the backward section below
_TILE_T_BWD = 64


def _kernel(h_ref, w_ref, b_ref, qrep_ref, s_ref, out_ref, *, k: int):
    h = h_ref[0]                                          # (Tt, 2H)
    acc = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    g = jnp.tanh(acc + b_ref[...])                        # (Tt, F*E) f32
    for ki in range(k):                                   # static K unroll
        q = qrep_ref[0, ki][None, :].astype(jnp.float32)  # (1, F*E)
        gk = (g * q).astype(s_ref.dtype)
        e = jnp.dot(gk, s_ref[...], preferred_element_type=jnp.float32)
        out_ref[0, ki] = jax.nn.sigmoid(e).astype(out_ref.dtype)


def _block_sum_matrix(fe: int, emb: int, f: int, dtype):
    """(F*E, F) 0/1 matrix generated ON DEVICE from iota — a host-side
    constant this size would be inlined into the jit MLIR (multi-MB
    constants cost minutes of remote compile, verify SKILL.md)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (fe, f), 0) // emb
    cols = jax.lax.broadcasted_iota(jnp.int32, (fe, f), 1)
    return (rows == cols).astype(dtype)


def _reference_impl(hidden, w, b, queries, freq_bins, emb):
    """The exact XLA computation this kernel replaces (encoder proj +
    _dot_energy + sigmoid); also the backward-pass recompute."""
    bsz, t, _ = hidden.shape
    g = jnp.tanh(jnp.dot(hidden, w, preferred_element_type=jnp.float32)
                 + b).astype(hidden.dtype)
    emb_map = g.reshape(bsz, t, freq_bins, emb)
    energy = jnp.einsum("btfe,bke->bktf", emb_map, queries,
                        preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(energy).astype(hidden.dtype)


def _fwd_impl(hidden, w, b, queries, freq_bins, emb):
    bsz, t, h2 = hidden.shape
    out_dtype = hidden.dtype
    # the kernel always computes at native MXU precision — bf16 operands,
    # f32 accumulation (the effective precision of XLA's DEFAULT f32
    # matmul on this hardware, CLAUDE.md); an f32-resident W (15.5 MB)
    # plus the f32 accumulator would also blow the 16 MB VMEM budget
    hidden = hidden.astype(jnp.bfloat16)
    k = queries.shape[1]
    fe = freq_bins * emb
    tt = min(_TILE_T, t)
    tp = -(-t // tt) * tt
    if tp != t:
        hidden = jnp.pad(hidden, ((0, 0), (0, tp - t), (0, 0)))
    qrep = jnp.tile(queries.astype(hidden.dtype), (1, 1, freq_bins))
    s = _block_sum_matrix(fe, emb, freq_bins, hidden.dtype)
    bias = b.reshape(1, fe).astype(jnp.float32)
    w = w.astype(hidden.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(bsz, tp // tt),
        in_specs=[
            pl.BlockSpec((1, tt, h2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # W resident
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bias
            pl.BlockSpec((1, k, fe), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # S resident
        ],
        out_specs=pl.BlockSpec((1, k, tt, freq_bins),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k, tp, freq_bins),
                                       out_dtype),
        interpret=_interpret(),
    )(hidden, w, bias, qrep, s)
    return out[:, :, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_dot_masks(hidden, w, b, queries, freq_bins: int, emb: int,
                    bwd_tile: int = _TILE_T_BWD):
    """hidden (B, T, 2H), w (2H, F*E), b (F*E,), queries (B, K, E) ->
    sigmoid dot-attention masks (B, K, T, F) without materializing the
    (B, T, F, E) embedding grid. `bwd_tile` sizes the backward kernel's
    time-tile (static; see _TILE_T_BWD for when to shrink it)."""
    return _fwd_impl(hidden, w, b, queries, freq_bins, emb)


def _fwd_vjp(hidden, w, b, queries, freq_bins, emb, bwd_tile):
    out = _fwd_impl(hidden, w, b, queries, freq_bins, emb)
    return out, (hidden, w, b, queries, out)


# ---------------------------------------------------------------------------
# Hand-written backward (round 4): no full XLA re-forward.
#
# The recompute VJP (rounds 2-3) re-ran the ENTIRE reference implementation
# under jax.vjp — an extra fused forward plus XLA's own backward with its
# f32 (B, T, F*E) activation materializations; measured a net LOSS for
# training (42.1 vs 31 ms at B=128 bf16), so train steps forced the flag
# off. This kernel removes both costs:
#
#   per (batch, time-tile), in VMEM:
#     g      = tanh(h W + b)                        (recomputed tile-local)
#     de_k   = dmask_k . m_k . (1 - m_k)            (Tt, F)   from saved out
#     dgq_k  = de_k @ S^T                           (Tt, FE)  MXU
#     dq_k  += ones @ (g . dgq_k) @ R               (1, E)    MXU, f32 acc
#     dg     = sum_k dgq_k . qrep_k
#     dacc   = dg . (1 - g^2)                       -> HBM (bf16)
#
# and the two large weight/input gradients are clean XLA matmuls over the
# single dacc materialization (bf16, vs XLA's f32 grids):
#     dW = h^T dacc   (contract B, T)      dh = dacc W^T      db = sum dacc
#
# The (2H, FE) f32 dW accumulator therefore never enters VMEM — the exact
# obstacle that killed the in-kernel dW variant (docs/BENCHMARKS.md r3).
# ---------------------------------------------------------------------------

# backward time-tile: g (f32) + dg (f32) + (g.dgq) temp share VMEM with the
# resident W (bf16) + S + R; 64 keeps the sum under the ~16 MB budget.
# The saved-masks and dout blocks MUST enter the kernel as bf16 (they are
# upcast to f32 tile-locally): feeding them f32 doubles two double-buffered
# (1, K, Tt, F) blocks, which blew the scoped budget by 112 KB at the
# video path's shapes (B=64, T=320, f32 hidden -> f32 saved masks).
# Callers in programs whose surrounding layout choices inflate Mosaic's
# scoped stack (measured: ADDJUST + si_sdr fine-tune, 18.9 MB > 16 MB at
# the same block shapes) pass bwd_tile=32 — ~9% slower standalone but
# still faster than the XLA mask-head fallback (models/separator.py).
# (_TILE_T_BWD itself is defined at the top of the file: it is the
# default for fused_dot_masks' bwd_tile argument.)


def _bwd_kernel(h_ref, w_ref, b_ref, qrep_ref, s_ref, r_ref, m_ref, dm_ref,
                dacc_ref, dq_ref, *, k: int):
    j = pl.program_id(1)
    h = h_ref[0]                                          # (Tt, 2H) bf16
    acc = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    g = jnp.tanh(acc + b_ref[...])                        # (Tt, FE) f32

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    dg = jnp.zeros_like(g)
    for ki in range(k):                                   # static K unroll
        m = m_ref[0, ki].astype(jnp.float32)              # (Tt, F)
        de = dm_ref[0, ki].astype(jnp.float32) * m * (1.0 - m)
        # de @ S^T: contract the F axis of both (S is (FE, F))
        dgq = jax.lax.dot_general(
            de.astype(s_ref.dtype), s_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (Tt, FE)
        q = qrep_ref[0, ki][None, :].astype(jnp.float32)  # (1, FE)
        dg = dg + dgq * q
        # dq_k[e] = sum_{t,f} g[t, f*E+e] de[t, f]: fold FE -> E via R
        col = jnp.sum(g * dgq, axis=0, keepdims=True)     # (1, FE) f32
        dq_ref[0, ki] += jnp.dot(col.astype(r_ref.dtype), r_ref[...],
                                 preferred_element_type=jnp.float32)[0]

    dacc_ref[0] = (dg * (1.0 - g * g)).astype(dacc_ref.dtype)


def _fold_matrix(fe: int, emb: int, dtype):
    """(FE, E) 0/1 matrix R[f*E+e, e'] = [e == e'] (on-device iota)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (fe, emb), 0) % emb
    cols = jax.lax.broadcasted_iota(jnp.int32, (fe, emb), 1)
    return (rows == cols).astype(dtype)


def _bwd_vjp(freq_bins, emb, bwd_tile, res, dout):
    hidden, w, b, queries, masks = res
    bsz, t, h2 = hidden.shape
    k = queries.shape[1]
    fe = freq_bins * emb
    hp16 = hidden.astype(jnp.bfloat16)
    tt = min(bwd_tile, t)
    tp = -(-t // tt) * tt
    if tp != t:
        hp16 = jnp.pad(hp16, ((0, 0), (0, tp - t), (0, 0)))
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
        dout = jnp.pad(dout, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    qrep = jnp.tile(queries.astype(jnp.bfloat16), (1, 1, freq_bins))
    s = _block_sum_matrix(fe, emb, freq_bins, jnp.bfloat16)
    # bf16 R halves a (FE, 128-lane-padded) resident — 1.65 MB of scoped
    # VMEM at the reference shape; the fold itself stays exact (R is 0/1,
    # f32 MXU accumulation), only `col` rounds to bf16 before the matmul,
    # which is below the kernel's existing bf16 operand rounding anyway
    r = _fold_matrix(fe, emb, jnp.bfloat16)
    bias = b.reshape(1, fe).astype(jnp.float32)
    w16 = w.astype(jnp.bfloat16)

    dacc, dq = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(bsz, tp // tt),
        in_specs=[
            pl.BlockSpec((1, tt, h2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # W resident
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bias
            pl.BlockSpec((1, k, fe), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # S resident
            pl.BlockSpec(memory_space=pltpu.VMEM),            # R resident
            pl.BlockSpec((1, k, tt, freq_bins), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),            # saved masks
            pl.BlockSpec((1, k, tt, freq_bins), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),            # dout
        ],
        out_specs=[
            pl.BlockSpec((1, tt, fe), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, emb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # dq accumulates
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, tp, fe), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, k, emb), jnp.float32),
        ],
        interpret=_interpret(),
    )(hp16, w16, bias, qrep, s, r,
      masks.astype(jnp.bfloat16), dout.astype(jnp.bfloat16))

    dacc = dacc[:, :t]
    hp16 = hp16[:, :t]
    # the two big gradients as plain XLA matmuls over the one bf16 dacc
    # materialization (f32 accumulation on the MXU)
    dw = jax.lax.dot_general(hp16, dacc, (((0, 1), (0, 1)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(dacc, w.astype(jnp.bfloat16),
                             (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jnp.sum(dacc.astype(jnp.float32), axis=(0, 1))
    return (dh.astype(hidden.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            dq.astype(queries.dtype))


fused_dot_masks.defvjp(_fwd_vjp, _bwd_vjp)
