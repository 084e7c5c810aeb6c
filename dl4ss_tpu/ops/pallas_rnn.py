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
  * gates use separate per-gate weight tensors — (H, H) matmuls — because
    Mosaic cannot cheaply slice a fused (3H|4H) gate matrix at non-128
    lane boundaries for the reference's H=300.

A custom VJP runs the backward pass as a second Pallas kernel scanning
time in reverse (grid index i -> time T-1-i), accumulating the
recurrent-weight gradients in the output refs across grid steps and
emitting per-step input-projection gradients; the outer projection matmuls
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

_HP = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm(a, b):
    return jnp.dot(a, b, precision=_HP, preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """a^T @ b for (B, H) x (B, H) -> (H, H)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=_HP,
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a @ b^T."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=_HP,
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(xr_ref, xz_ref, xn_ref, whr_ref, whz_ref, whn_ref,
                    bhn_ref, hs_ref, h_scr, *, ndir: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    for d in range(ndir):
        h = h_scr[d]                                    # (B, H)
        rr = jax.nn.sigmoid(xr_ref[0, d] + _mm(h, whr_ref[d]))
        zz = jax.nn.sigmoid(xz_ref[0, d] + _mm(h, whz_ref[d]))
        hn = _mm(h, whn_ref[d]) + bhn_ref[d]
        nn = jnp.tanh(xn_ref[0, d] + rr * hn)
        h = (1.0 - zz) * nn + zz * h
        h_scr[d] = h
        hs_ref[0, d] = h


@jax.custom_vjp
def pallas_gru_scan(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n):
    """xp_*: (T, D, B, H) input projections (+biases folded); wh_*: (D, H, H);
    bh_n: (D, 1, H). Returns hs (T, D, B, H). h0 = 0 (the reference never
    uses a nonzero initial state)."""
    return _gru_fwd(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n)


def _gru_fwd(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n):
    t, d, b, h = xp_r.shape
    block = pl.BlockSpec((1, d, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gru_fwd_kernel, ndir=d),
        grid=(t,),
        in_specs=[block, block, block, full, full, full, full],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((t, d, b, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, b, h), jnp.float32)],
        interpret=_interpret(),
    )(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n)


def _gru_bwd_kernel(xr_ref, xz_ref, xn_ref, whr_ref, whz_ref, whn_ref,
                    bhn_ref, hprev_ref, dhs_ref,
                    dxr_ref, dxz_ref, dxn_ref, dwhr_ref, dwhz_ref, dwhn_ref,
                    dbhn_ref, dh_scr, *, ndir: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwhr_ref[:] = jnp.zeros_like(dwhr_ref)
        dwhz_ref[:] = jnp.zeros_like(dwhz_ref)
        dwhn_ref[:] = jnp.zeros_like(dwhn_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    for d in range(ndir):
        hprev = hprev_ref[0, d]
        # recompute the forward activations for this step
        rr = jax.nn.sigmoid(xr_ref[0, d] + _mm(hprev, whr_ref[d]))
        zz = jax.nn.sigmoid(xz_ref[0, d] + _mm(hprev, whz_ref[d]))
        hn = _mm(hprev, whn_ref[d]) + bhn_ref[d]
        nn = jnp.tanh(xn_ref[0, d] + rr * hn)

        dh = dh_scr[d] + dhs_ref[0, d]
        dn = dh * (1.0 - zz)
        dz = dh * (hprev - nn)
        dhprev = dh * zz
        da_n = dn * (1.0 - nn * nn)
        dr = da_n * hn
        dhn = da_n * rr
        da_z = dz * zz * (1.0 - zz)
        da_r = dr * rr * (1.0 - rr)

        dxn_ref[0, d] = da_n
        dxz_ref[0, d] = da_z
        dxr_ref[0, d] = da_r
        dhprev = dhprev + _mm_nt(da_r, whr_ref[d]) \
                        + _mm_nt(da_z, whz_ref[d]) \
                        + _mm_nt(dhn, whn_ref[d])
        dwhr_ref[d] += _mm_tn(hprev, da_r)
        dwhz_ref[d] += _mm_tn(hprev, da_z)
        dwhn_ref[d] += _mm_tn(hprev, dhn)
        dbhn_ref[d] += jnp.sum(dhn, axis=0, keepdims=True)
        dh_scr[d] = dhprev


def _gru_fwd_vjp(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n):
    hs = _gru_fwd(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n)
    return hs, (xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n, hs)


def _gru_bwd_vjp(res, dhs):
    xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n, hs = res
    t, d, b, h = xp_r.shape
    hprev = jnp.concatenate([jnp.zeros((1, d, b, h), hs.dtype), hs[:-1]],
                            axis=0)
    rev = pl.BlockSpec((1, d, b, h), lambda i: (t - 1 - i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, ndir=d),
        grid=(t,),
        in_specs=[rev, rev, rev, full, full, full, full, rev, rev],
        out_specs=[rev, rev, rev, full, full, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((t, d, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, d, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, d, b, h), jnp.float32),
            jax.ShapeDtypeStruct((d, h, h), jnp.float32),
            jax.ShapeDtypeStruct((d, h, h), jnp.float32),
            jax.ShapeDtypeStruct((d, h, h), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d, b, h), jnp.float32)],
        interpret=_interpret(),
    )(xp_r, xp_z, xp_n, wh_r, wh_z, wh_n, bh_n, hprev, dhs)
    return tuple(outs)


pallas_gru_scan.defvjp(_gru_fwd_vjp, _gru_bwd_vjp)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def _lstm_fwd_kernel(xi_ref, xf_ref, xg_ref, xo_ref, whi_ref, whf_ref,
                     whg_ref, who_ref, hs_ref, cs_ref, h_scr, c_scr,
                     *, ndir: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    for d in range(ndir):
        h, c = h_scr[d], c_scr[d]
        ii = jax.nn.sigmoid(xi_ref[0, d] + _mm(h, whi_ref[d]))
        ff = jax.nn.sigmoid(xf_ref[0, d] + _mm(h, whf_ref[d]))
        gg = jnp.tanh(xg_ref[0, d] + _mm(h, whg_ref[d]))
        oo = jax.nn.sigmoid(xo_ref[0, d] + _mm(h, who_ref[d]))
        c = ff * c + ii * gg
        h = oo * jnp.tanh(c)
        h_scr[d], c_scr[d] = h, c
        hs_ref[0, d] = h
        cs_ref[0, d] = c


@jax.custom_vjp
def pallas_lstm_scan(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o):
    """xp_*: (T, D, B, H) with all biases folded; wh_*: (D, H, H).
    Returns hs (T, D, B, H)."""
    hs, _ = _lstm_fwd(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o)
    return hs


def _lstm_fwd(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o):
    t, d, b, h = xp_i.shape
    block = pl.BlockSpec((1, d, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hs, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, ndir=d),
        grid=(t,),
        in_specs=[block] * 4 + [full] * 4,
        out_specs=[block, block],
        out_shape=[jax.ShapeDtypeStruct((t, d, b, h), jnp.float32),
                   jax.ShapeDtypeStruct((t, d, b, h), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((d, b, h), jnp.float32),
                        pltpu.VMEM((d, b, h), jnp.float32)],
        interpret=_interpret(),
    )(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o)
    return hs, cs


def _lstm_bwd_kernel(xi_ref, xf_ref, xg_ref, xo_ref, whi_ref, whf_ref,
                     whg_ref, who_ref, hprev_ref, cprev_ref, cs_ref, dhs_ref,
                     dxi_ref, dxf_ref, dxg_ref, dxo_ref, dwhi_ref, dwhf_ref,
                     dwhg_ref, dwho_ref, dh_scr, dc_scr, *, ndir: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwhi_ref[:] = jnp.zeros_like(dwhi_ref)
        dwhf_ref[:] = jnp.zeros_like(dwhf_ref)
        dwhg_ref[:] = jnp.zeros_like(dwhg_ref)
        dwho_ref[:] = jnp.zeros_like(dwho_ref)

    for d in range(ndir):
        hprev, cprev = hprev_ref[0, d], cprev_ref[0, d]
        c = cs_ref[0, d]
        ii = jax.nn.sigmoid(xi_ref[0, d] + _mm(hprev, whi_ref[d]))
        ff = jax.nn.sigmoid(xf_ref[0, d] + _mm(hprev, whf_ref[d]))
        gg = jnp.tanh(xg_ref[0, d] + _mm(hprev, whg_ref[d]))
        oo = jax.nn.sigmoid(xo_ref[0, d] + _mm(hprev, who_ref[d]))
        tc = jnp.tanh(c)

        dh = dh_scr[d] + dhs_ref[0, d]
        do = dh * tc
        dc = dc_scr[d] + dh * oo * (1.0 - tc * tc)
        di = dc * gg
        dg = dc * ii
        df = dc * cprev
        dc_next = dc * ff

        da_i = di * ii * (1.0 - ii)
        da_f = df * ff * (1.0 - ff)
        da_g = dg * (1.0 - gg * gg)
        da_o = do * oo * (1.0 - oo)

        dxi_ref[0, d] = da_i
        dxf_ref[0, d] = da_f
        dxg_ref[0, d] = da_g
        dxo_ref[0, d] = da_o

        dhprev = (_mm_nt(da_i, whi_ref[d]) + _mm_nt(da_f, whf_ref[d]) +
                  _mm_nt(da_g, whg_ref[d]) + _mm_nt(da_o, who_ref[d]))
        dwhi_ref[d] += _mm_tn(hprev, da_i)
        dwhf_ref[d] += _mm_tn(hprev, da_f)
        dwhg_ref[d] += _mm_tn(hprev, da_g)
        dwho_ref[d] += _mm_tn(hprev, da_o)
        dh_scr[d] = dhprev
        dc_scr[d] = dc_next


def _lstm_fwd_vjp(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o):
    hs, cs = _lstm_fwd(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o)
    return hs, (xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o, hs, cs)


def _lstm_bwd_vjp(res, dhs):
    xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o, hs, cs = res
    t, d, b, h = xp_i.shape
    zeros = jnp.zeros((1, d, b, h), hs.dtype)
    hprev = jnp.concatenate([zeros, hs[:-1]], axis=0)
    cprev = jnp.concatenate([zeros, cs[:-1]], axis=0)
    rev = pl.BlockSpec((1, d, b, h), lambda i: (t - 1 - i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, ndir=d),
        grid=(t,),
        in_specs=[rev] * 4 + [full] * 4 + [rev, rev, rev, rev],
        out_specs=[rev] * 4 + [full] * 4,
        out_shape=[jax.ShapeDtypeStruct((t, d, b, h), jnp.float32)] * 4 +
                  [jax.ShapeDtypeStruct((d, h, h), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((d, b, h), jnp.float32),
                        pltpu.VMEM((d, b, h), jnp.float32)],
        interpret=_interpret(),
    )(xp_i, xp_f, xp_g, xp_o, wh_i, wh_f, wh_g, wh_o, hprev, cprev, cs, dhs)
    return tuple(outs)


pallas_lstm_scan.defvjp(_lstm_fwd_vjp, _lstm_bwd_vjp)
