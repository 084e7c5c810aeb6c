"""Pallas fused recurrent cores.

The encoder/classifier BiGRU/BiLSTM scans are the compute heart of every
model in this framework (SURVEY.md §7 "hard parts"). The `lax.scan` path
(ops/rnn.py) re-launches per-timestep HLO with the recurrent weights
re-fetched from HBM each iteration; these kernels instead run the ENTIRE
time loop inside one Pallas program per layer:

  * recurrent weights + biases stay resident in VMEM for all T steps,
  * the per-step input projections (precomputed as one big MXU matmul
    outside the kernel) stream through the sequential grid with Pallas's
    automatic double-buffering,
  * both directions ride one kernel (the time-reversed sequence is stacked
    on a leading direction axis, exactly like ops/rnn.py's shared scan);
    the direction axis is a static unrolled loop of plain 2-D matmuls —
    Mosaic does not support batched dot_general here,
  * the hidden width is padded to a 128-lane multiple by the CALLER
    (ops/rnn.py pads weights/projections with zeros), so all G gates fuse
    into ONE (B, Hp) x (Hp, G*Hp) MXU matmul per direction per step and
    every gate slice lands on a 128-aligned lane boundary (Mosaic's
    requirement). Zero padding is self-consistent: padded lanes of h stay
    exactly 0 through the recurrence in both cells,
  * gate matmuls run at DEFAULT precision (single-pass bf16 inputs on the
    MXU with f32 accumulation) — the same numerics as the lax.scan path's
    `jnp.dot` and ~3-6x less MXU work than HIGHEST; these are model
    matmuls, not DSP-critical ones (CLAUDE.md style rule).

A custom VJP runs the backward pass as a second Pallas kernel scanning
time in reverse (grid index i -> time T-1-i), accumulating the fused
recurrent-weight gradient in an output ref across grid steps and emitting
per-step fused input-projection gradients; the outer projection matmuls
differentiate via normal XLA autodiff.

Gate math matches torch (ops/rnn.py) bit-for-bit in structure:
  GRU:  r,z = sigmoid(xp_{r,z} + h @ U_{r,z});  n = tanh(xp_n + r*(h @ U_n + b_n))
        h' = (1-z)*n + z*h      (xp_* carry x@W + b_x [+ b_h for r,z])
  LSTM: i,f,g,o gates, c' = sig(f)*c + sig(i)*tanh(g), h' = sig(o)*tanh(c')
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_FORCED_SPC = None   # tests force >1 to keep the step-batched path covered


def _steps_per_cell(per_step_bytes: int, resident_bytes: int,
                    budget: int = 13 * 2 ** 20) -> int:
    """Time-steps processed per grid cell. MEASURED on v5e at the
    reference shapes (B=128-256, Hp=384): batching 2/4 steps per cell
    LOSES 5-8% on both forward (11,878 -> 10,781 mix/s pipeline) and
    backward (42.1 -> 45.6 ms train step) — the ~1 us gate matmul was
    never launch-bound, and larger streamed blocks reduce Mosaic's
    latency hiding. Production therefore runs 1 step/cell; the
    step-batched kernels remain for shapes where DMA latency dominates
    (and under test via _FORCED_SPC)."""
    if _FORCED_SPC:
        for spc in (_FORCED_SPC, 2):
            if resident_bytes + 2 * spc * per_step_bytes <= budget:
                return spc
    return 1


def _pad_steps(x, spc: int):
    t = x.shape[0]
    tp = -(-t // spc) * spc
    if tp == t:
        return x, tp
    pad = [(0, tp - t)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), tp


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a^T @ b for (B, H) x (B, G) -> (H, G)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b^T."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(xp_ref, wh_ref, bhn_ref, hs_ref, h_scr,
                    *, ndir: int, hp: int, spc: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    for s in range(spc):                                # step batch (VMEM)
        for d in range(ndir):
            h = h_scr[d]                                # (B, Hp)
            a = _mm(h, wh_ref[d])                       # (B, 3Hp) fused gates
            xpd = xp_ref[s, d].astype(jnp.float32)
            # r and z are adjacent in the fused layout: ONE sigmoid over the
            # 2Hp slice (Hp is a 128 multiple, so both sub-slices are
            # lane-aligned) instead of two VPU ops per step per direction
            rz = jax.nn.sigmoid(xpd[:, :2 * hp] + a[:, :2 * hp])
            rr, zz = rz[:, :hp], rz[:, hp:]
            hn = a[:, 2 * hp:] + bhn_ref[d]
            nn = jnp.tanh(xpd[:, 2 * hp:] + rr * hn)
            h = (1.0 - zz) * nn + zz * h.astype(jnp.float32)
            h_scr[d] = h.astype(h_scr.dtype)
            hs_ref[s, d] = h.astype(hs_ref.dtype)


@jax.custom_vjp
def pallas_gru_scan(xp, wh, bh_n):
    """xp: (T, D, B, 3*Hp) fused input projections (+biases folded for r,z);
    wh: (D, Hp, 3*Hp) fused recurrent weights; bh_n: (D, 1, Hp). Hp must be
    a multiple of 128 (pad with zeros). Returns hs (T, D, B, Hp). h0 = 0
    (the reference never uses a nonzero initial state)."""
    return _gru_fwd(xp, wh, bh_n)


def _gru_fwd(xp, wh, bh_n):
    t, d, b, g3 = xp.shape
    hp = g3 // 3
    esize = xp.dtype.itemsize
    spc = _steps_per_cell(d * b * (g3 + hp) * esize,
                          d * hp * g3 * wh.dtype.itemsize)
    xp, tp = _pad_steps(xp, spc)
    block = pl.BlockSpec((spc, d, b, g3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    hblock = pl.BlockSpec((spc, d, b, hp), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hs = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, ndir=d, hp=hp, spc=spc),
        grid=(tp // spc,),
        in_specs=[block, full, full],
        out_specs=hblock,
        # the recurrent carry matches the input dtype (bf16 pipelines keep
        # the MXU on native bf16 tiles; accumulation stays f32 via
        # preferred_element_type — same numerics as the scan path's
        # per-step h.astype(dtype))
        out_shape=jax.ShapeDtypeStruct((tp, d, b, hp), xp.dtype),
        scratch_shapes=[pltpu.VMEM((d, b, hp), xp.dtype)],
        interpret=_interpret(),
    )(xp, wh, bh_n)
    return hs[:t]


def _gru_bwd_kernel(xp_ref, wh_ref, bhn_ref, hprev_ref, dhs_ref,
                    dxp_ref, dwh_ref, dbhn_ref, dh_scr,
                    *, ndir: int, hp: int, spc: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    for s in reversed(range(spc)):      # time runs backward within the cell
        for d in range(ndir):
            hprev = hprev_ref[s, d].astype(jnp.float32)
            # recompute the forward activations for this step (one matmul)
            a = _mm(hprev_ref[s, d], wh_ref[d])
            xpd = xp_ref[s, d].astype(jnp.float32)
            rz = jax.nn.sigmoid(xpd[:, :2 * hp] + a[:, :2 * hp])
            rr, zz = rz[:, :hp], rz[:, hp:]
            hn = a[:, 2 * hp:] + bhn_ref[d]
            nn = jnp.tanh(xpd[:, 2 * hp:] + rr * hn)

            dh = dh_scr[d] + dhs_ref[s, d].astype(jnp.float32)
            dn = dh * (1.0 - zz)
            dz = dh * (hprev - nn)
            dhprev = dh * zz
            da_n = dn * (1.0 - nn * nn)
            dr = da_n * hn
            dhn = da_n * rr
            da_z = dz * zz * (1.0 - zz)
            da_r = dr * rr * (1.0 - rr)

            # fused per-step grads: xp sees (da_r, da_z, da_n); the
            # recurrent matmul sees (da_r, da_z, dhn) — n's pre-activation
            # routes to xp directly but to h only through r*(h @ U_n + b_n)
            dxp_ref[s, d] = jnp.concatenate(
                [da_r, da_z, da_n], axis=-1).astype(dxp_ref.dtype)
            da_w = jnp.concatenate([da_r, da_z, dhn],
                                   axis=-1).astype(dhs_ref.dtype)  # (B, 3Hp)
            dhprev = dhprev + _mm_nt(da_w, wh_ref[d])
            dwh_ref[d] += _mm_tn(hprev_ref[s, d], da_w)
            dbhn_ref[d] += jnp.sum(dhn, axis=0, keepdims=True)
            dh_scr[d] = dhprev


def _gru_fwd_vjp(xp, wh, bh_n):
    hs = _gru_fwd(xp, wh, bh_n)
    return hs, (xp, wh, bh_n, hs)


def _gru_bwd_vjp(res, dhs):
    xp, wh, bh_n, hs = res
    t, d, b, g3 = xp.shape
    hp = g3 // 3
    hprev = jnp.concatenate([jnp.zeros((1, d, b, hp), hs.dtype), hs[:-1]],
                            axis=0)
    esize = xp.dtype.itemsize
    spc = _steps_per_cell(
        d * b * (2 * g3 + 2 * hp) * esize,
        d * hp * g3 * (wh.dtype.itemsize + 4))
    # zero-padding is grad-neutral: padded dhs rows are 0, so every padded
    # step emits dxp=0 and leaves the dh carry/dwh accumulators unchanged
    xp, tp = _pad_steps(xp, spc)
    hprev, _ = _pad_steps(hprev, spc)
    dhs, _ = _pad_steps(dhs, spc)
    nblk = tp // spc
    rev = pl.BlockSpec((spc, d, b, g3), lambda i: (nblk - 1 - i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    hrev = pl.BlockSpec((spc, d, b, hp), lambda i: (nblk - 1 - i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dxp, dwh, dbhn = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, ndir=d, hp=hp, spc=spc),
        grid=(nblk,),
        in_specs=[rev, full, full, hrev, hrev],
        out_specs=[rev, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((tp, d, b, g3), xp.dtype),
            jax.ShapeDtypeStruct((d, hp, g3), jnp.float32),  # f32 accumulate
            jax.ShapeDtypeStruct((d, 1, hp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d, b, hp), jnp.float32)],
        interpret=_interpret(),
    )(xp, wh, bh_n, hprev, dhs)
    return dxp[:t], dwh.astype(wh.dtype), dbhn.astype(bh_n.dtype)


pallas_gru_scan.defvjp(_gru_fwd_vjp, _gru_bwd_vjp)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def _lstm_fwd_kernel(xp_ref, wh_ref, hs_ref, cs_ref, h_scr, c_scr,
                     *, ndir: int, hp: int, spc: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    for s in range(spc):
        for d in range(ndir):
            h, c = h_scr[d], c_scr[d].astype(jnp.float32)
            a = (xp_ref[s, d].astype(jnp.float32)
                 + _mm(h, wh_ref[d]))                   # (B, 4Hp) fused
            # i and f are adjacent: one sigmoid over the 2Hp slice
            iff = jax.nn.sigmoid(a[:, :2 * hp])
            ii, ff = iff[:, :hp], iff[:, hp:]
            gg = jnp.tanh(a[:, 2 * hp:3 * hp])
            oo = jax.nn.sigmoid(a[:, 3 * hp:])
            c = ff * c + ii * gg
            h = oo * jnp.tanh(c)
            h_scr[d] = h.astype(h_scr.dtype)
            c_scr[d] = c.astype(c_scr.dtype)
            hs_ref[s, d] = h.astype(hs_ref.dtype)
            cs_ref[s, d] = c.astype(cs_ref.dtype)


@jax.custom_vjp
def pallas_lstm_scan(xp, wh):
    """xp: (T, D, B, 4*Hp) with all biases folded; wh: (D, Hp, 4*Hp);
    Hp a multiple of 128 (zero-padded). Returns hs (T, D, B, Hp)."""
    hs, _ = _lstm_fwd(xp, wh)
    return hs


def _lstm_fwd(xp, wh):
    t, d, b, g4 = xp.shape
    hp = g4 // 4
    esize = xp.dtype.itemsize
    spc = _steps_per_cell(d * b * (g4 + 2 * hp) * esize,
                          d * hp * g4 * wh.dtype.itemsize)
    xp, tp = _pad_steps(xp, spc)
    block = pl.BlockSpec((spc, d, b, g4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    hblock = pl.BlockSpec((spc, d, b, hp), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hs, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, ndir=d, hp=hp, spc=spc),
        grid=(tp // spc,),
        in_specs=[block, full],
        out_specs=[hblock, hblock],
        out_shape=[jax.ShapeDtypeStruct((tp, d, b, hp), xp.dtype),
                   jax.ShapeDtypeStruct((tp, d, b, hp), xp.dtype)],
        scratch_shapes=[pltpu.VMEM((d, b, hp), xp.dtype),
                        pltpu.VMEM((d, b, hp), jnp.float32)],
        interpret=_interpret(),
    )(xp, wh)
    return hs[:t], cs[:t]


def _lstm_bwd_kernel(xp_ref, wh_ref, hprev_ref, cprev_ref, cs_ref, dhs_ref,
                     dxp_ref, dwh_ref, dh_scr, dc_scr,
                     *, ndir: int, hp: int, spc: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    for s in reversed(range(spc)):      # time runs backward within the cell
        for d in range(ndir):
            cprev = cprev_ref[s, d].astype(jnp.float32)
            c = cs_ref[s, d].astype(jnp.float32)
            a = (xp_ref[s, d].astype(jnp.float32)
                 + _mm(hprev_ref[s, d], wh_ref[d]))
            iff = jax.nn.sigmoid(a[:, :2 * hp])
            ii, ff = iff[:, :hp], iff[:, hp:]
            gg = jnp.tanh(a[:, 2 * hp:3 * hp])
            oo = jax.nn.sigmoid(a[:, 3 * hp:])
            tc = jnp.tanh(c)

            dh = dh_scr[d] + dhs_ref[s, d].astype(jnp.float32)
            do = dh * tc
            dc = dc_scr[d] + dh * oo * (1.0 - tc * tc)
            di = dc * gg
            dg = dc * ii
            df = dc * cprev
            dc_next = dc * ff

            da = jnp.concatenate([di * ii * (1.0 - ii),
                                  df * ff * (1.0 - ff),
                                  dg * (1.0 - gg * gg),
                                  do * oo * (1.0 - oo)],
                                 axis=-1).astype(dhs_ref.dtype)   # (B, 4Hp)
            dxp_ref[s, d] = da.astype(dxp_ref.dtype)
            dh_scr[d] = _mm_nt(da, wh_ref[d])
            dwh_ref[d] += _mm_tn(hprev_ref[s, d], da)
            dc_scr[d] = dc_next


def _lstm_fwd_vjp(xp, wh):
    hs, cs = _lstm_fwd(xp, wh)
    return hs, (xp, wh, hs, cs)


def _lstm_bwd_vjp(res, dhs):
    xp, wh, hs, cs = res
    t, d, b, g4 = xp.shape
    hp = g4 // 4
    zeros = jnp.zeros((1, d, b, hp), hs.dtype)
    hprev = jnp.concatenate([zeros, hs[:-1]], axis=0)
    cprev = jnp.concatenate([zeros, cs[:-1]], axis=0)
    esize = xp.dtype.itemsize
    spc = _steps_per_cell(
        d * b * (2 * g4 + 4 * hp) * esize,
        d * hp * g4 * (wh.dtype.itemsize + 4))
    # zero-padded dhs rows are grad-neutral (see _gru_bwd_vjp)
    xp, tp = _pad_steps(xp, spc)
    hprev, _ = _pad_steps(hprev, spc)
    cprev, _ = _pad_steps(cprev, spc)
    cs_p, _ = _pad_steps(cs, spc)
    dhs, _ = _pad_steps(dhs, spc)
    nblk = tp // spc
    rev = pl.BlockSpec((spc, d, b, g4), lambda i: (nblk - 1 - i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    hrev = pl.BlockSpec((spc, d, b, hp), lambda i: (nblk - 1 - i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dxp, dwh = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, ndir=d, hp=hp, spc=spc),
        grid=(nblk,),
        in_specs=[rev, full, hrev, hrev, hrev, hrev],
        out_specs=[rev, full],
        out_shape=[jax.ShapeDtypeStruct((tp, d, b, g4), xp.dtype),
                   jax.ShapeDtypeStruct((d, hp, g4), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((d, b, hp), jnp.float32),
                        pltpu.VMEM((d, b, hp), jnp.float32)],
        interpret=_interpret(),
    )(xp, wh, hprev, cprev, cs_p, dhs)
    return dxp[:t], dwh.astype(wh.dtype)


pallas_lstm_scan.defvjp(_lstm_fwd_vjp, _lstm_bwd_vjp)
