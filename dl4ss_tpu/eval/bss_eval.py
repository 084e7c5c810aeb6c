"""BSS-Eval (SDR / SIR / SAR) with permutation resolution.

The reference depends on two opaque implementations: a vendored-but-missing
`separation.bss_eval_sources` (Torch_multi/bss_test.py:5 — mir_eval-style,
512-tap projections, permutation by SIR) and MATLAB BSS-Eval 2.0
(Cocktail/.../BSS_EVAL.m). Neither ships here, so this module provides:

  * `bss_eval_sources_numpy` — a transparent ground-truth implementation of
    the BSS Eval v3 `sources` variant (Vincent, Gribonval, Fevotte 2006):
    least-squares projection of each estimate onto the span of 512-tap
    delayed copies of (a) the matching source (s_target) and (b) all sources
    (e_interf split), built from explicit delay matrices — exact by
    construction, used as the test oracle;
  * `bss_eval_sources` — the TPU formulation: the Gram matrix of delayed
    sources and all cross-correlations are batched matmuls (MXU), one
    Cholesky-backed solve per mixture, vmapped over the batch; permutation
    chosen by max mean SIR, as mir_eval does.

NSDR(pred) = SDR(pred) - SDR(mixture-as-prediction)
(Cocktail/.../BSS_EVAL.m:16-21).
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BssResult(NamedTuple):
    sdr: jax.Array   # (K,) or (B, K)
    sir: jax.Array
    sar: jax.Array
    perm: jax.Array  # chosen estimate->source assignment


# ---------------------------------------------------------------------------
# numpy ground truth (test oracle)
# ---------------------------------------------------------------------------


def _delay_matrix(sig: np.ndarray, flen: int) -> np.ndarray:
    """(N,) -> (N + flen - 1, flen): column p is sig delayed by p."""
    n = len(sig)
    out = np.zeros((n + flen - 1, flen), sig.dtype)
    for p in range(flen):
        out[p:p + n, p] = sig
    return out


def bss_eval_sources_numpy(ref: np.ndarray, est: np.ndarray,
                           flen: int = 512, permute: bool = True):
    """ref, est: (K, N) float64. Returns (sdr, sir, sar, perm) numpy arrays."""
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    k, n = ref.shape
    delays = [_delay_matrix(ref[i], flen) for i in range(k)]     # (L, flen)
    all_mat = np.concatenate(delays, axis=1)                     # (L, K*flen)
    sdr = np.zeros((k, k))
    sir = np.zeros((k, k))
    sar = np.zeros((k, k))
    for j in range(k):
        e = np.zeros(n + flen - 1)
        e[:n] = est[j]
        # the all-sources projection depends only on the estimate j —
        # solve it once per j, not once per (j, i) pair
        c_all, *_ = np.linalg.lstsq(all_mat, e, rcond=None)
        p_all = all_mat @ c_all
        e_artif = e - p_all
        for i in range(k):
            c_true, *_ = np.linalg.lstsq(delays[i], e, rcond=None)
            s_true = delays[i] @ c_true
            e_interf = p_all - s_true
            sdr[j, i] = 10 * np.log10(
                np.sum(s_true ** 2) / np.sum((e_interf + e_artif) ** 2))
            sir[j, i] = 10 * np.log10(
                np.sum(s_true ** 2) / np.sum(e_interf ** 2))
            sar[j, i] = 10 * np.log10(
                np.sum((s_true + e_interf) ** 2) / np.sum(e_artif ** 2))
    if not permute:
        d = np.arange(k)
        return sdr[d, d], sir[d, d], sar[d, d], d
    best, best_sir = None, -np.inf
    for perm in itertools.permutations(range(k)):
        p = np.array(perm)
        m = np.mean(sir[np.arange(k), p])
        if m > best_sir:
            best, best_sir = p, m
    d = np.arange(k)
    return sdr[d, best], sir[d, best], sar[d, best], best


# ---------------------------------------------------------------------------
# JAX / TPU implementation
# ---------------------------------------------------------------------------


from dl4ss_tpu.ops.xcorr import ola_conv, xcorr as _corr_all  # noqa: E402
# c[b, a, l] = sum_u a_sigs[a,u] b_sigs[b,u+l] — matmul-DFT overlap-save
# (a direct XLA conv with N-length kernels costs ~7 min of TPU compile;
# an explicit delay matrix costs 21 GB at the reference scale).


@functools.partial(jax.jit, static_argnames=("flen", "permute"))
def bss_eval_sources(ref: jax.Array, est: jax.Array, flen: int = 512,
                     permute: bool = True, ridge: float = 1e-8) -> BssResult:
    """ref, est: (K, N) or (B, K, N). Correlations and projections are XLA
    convs at HIGHEST precision; the only dense solves are (K*flen)^2 and
    (flen)^2 Gram systems with a tiny ridge."""
    if ref.ndim == 3:
        fn = functools.partial(bss_eval_sources, flen=flen, permute=permute,
                               ridge=ridge)
        return jax.vmap(fn)(ref, est)

    k, n = ref.shape
    length = n + flen - 1
    hp = jax.lax.Precision.HIGHEST
    ref = ref.astype(jnp.float32)
    est = est.astype(jnp.float32)

    # Gram of the delayed-source family, from lag correlations:
    # G[(a,p),(b,q)] = sum_u ref[a,u] ref[b,u+p-q] = corr[b, a, p-q]
    corr = _corr_all(ref, ref, -(flen - 1), flen - 1)        # (K, K, 2F-1)
    lag = np.arange(flen)[:, None] - np.arange(flen)[None, :] + flen - 1
    gram = jnp.transpose(corr, (1, 0, 2))[:, :, lag]         # (Ka, Kb, F, F)
    gram = jnp.transpose(gram, (0, 2, 1, 3)).reshape(k * flen, k * flen)

    # D[j, (a,p)] = sum_u ref[a,u] est[j,u+p]
    d = _corr_all(ref, est, 0, flen - 1)                     # (K_est, K, F)
    d_all = d.reshape(k, k * flen)                           # (K_est, K*flen)

    eye = jnp.eye(k * flen, dtype=jnp.float32)
    coef_all = jnp.linalg.solve(gram + ridge * eye, d_all.T)  # (K*flen, K_est)
    # proj_all[j, t] = sum_{a,p} coef[(a,p), j] * ref[a, t-p]:
    # FIR-filter each source with its coefficient taps and sum — done via
    # matmul-DFT overlap-save (XLA convs with per-batch kernels lower to
    # grouped convs under vmap and cost minutes of TPU compile).
    kern_all = coef_all.T.reshape(k, k, flen)                # (K_est, Ka, F)
    proj_all = ola_conv(ref, kern_all, sum_channels=True)    # (K_est, L)

    # per-source projections: (flen, flen) diagonal Gram blocks
    gii = jnp.transpose(corr, (1, 0, 2))[np.arange(k), np.arange(k)][:, lag]
    eye_f = jnp.eye(flen, dtype=jnp.float32)
    # coef_single[i, :, j]: projection of est j onto delayed ref i
    d_blocks = jnp.transpose(d, (1, 2, 0))                   # (K_src, F, K_est)
    coef_single = jnp.linalg.solve(gii + ridge * eye_f, d_blocks)
    # s_true[j, i, t] = sum_p coef_single[i, p, j] ref[i, t-p]
    kern_s = jnp.transpose(coef_single, (2, 0, 1))           # (K_est, K_src, F)
    s_true = ola_conv(ref, kern_s, sum_channels=False)       # (K_est, K_src, L)

    est_pad = jnp.pad(est, ((0, 0), (0, flen - 1)))

    e_interf = proj_all[:, None, :] - s_true
    e_artif = est_pad[:, None, :] - proj_all[:, None, :]

    def _db(num, den, eps=1e-12):
        return 10.0 * jnp.log10(jnp.maximum(num, eps) /
                                jnp.maximum(den, eps))

    p_true = jnp.sum(s_true ** 2, axis=-1)
    p_interf = jnp.sum(e_interf ** 2, axis=-1)
    p_artif = jnp.sum(e_artif ** 2, axis=-1)
    sdr = _db(p_true, jnp.sum((e_interf + e_artif) ** 2, axis=-1))
    sir = _db(p_true, p_interf)
    sar = _db(jnp.sum((s_true + e_interf) ** 2, axis=-1), p_artif)

    if not permute:
        d = jnp.arange(k)
        return BssResult(sdr[d, d], sir[d, d], sar[d, d], d)

    perms = np.array(list(itertools.permutations(range(k))))
    mean_sir = jnp.mean(sir[np.arange(k)[None, :], perms], axis=-1)  # (P,)
    best = jnp.argmax(mean_sir)
    perm = jnp.asarray(perms)[best]
    d = jnp.arange(k)
    return BssResult(sdr[d, perm], sir[d, perm], sar[d, perm], perm)


def nsdr(sdr_pred: jax.Array, sdr_mix: jax.Array) -> jax.Array:
    """NSDR = SDR(pred) - SDR(mix-as-pred) (BSS_EVAL.m:16-21)."""
    return sdr_pred - sdr_mix


# ---------------------------------------------------------------------------
# BSS-Eval 2.0 gain decomposition (bss_decomp_gain + bss_crit)
# ---------------------------------------------------------------------------
#
# The Keras stacks score with BSS-Eval **2.0**, not v3: the allowed
# distortion of the target is a single time-invariant scalar gain, and the
# interference space is the span of the source signals themselves (no
# 512-tap filters) — MATLAB `bss_decomp_gain(se, index, S)` + `bss_crit`
# (Cocktail/software/DL4SS_Keras/BSS_EVAL.m:8-21). The reference computes
# the prediction's SDR against orig=[noise; signal] (both sources span the
# projection) and the NSDR baseline against the TARGET ALONE
# (`bss_decomp_gain(wav_mix, 1, wav_truth_signal)`, BSS_EVAL.m:14-16).


def bss_decomp_gain_numpy(est: np.ndarray, index: int, sources: np.ndarray):
    """Transparent oracle of MATLAB bss_decomp_gain (0-based `index`).

    est (N,), sources (K, N) float64 ->
      s_target = <est, s_i>/||s_i||^2 * s_i        (scalar-gain projection)
      e_interf = P_{span(sources)} est - s_target  (time-invariant gains)
      e_artif  = est - P_{span(sources)} est
    """
    est = np.asarray(est, np.float64)
    s = np.asarray(sources, np.float64)
    si = s[index]
    s_target = (est @ si) / (si @ si) * si
    coef, *_ = np.linalg.lstsq(s.T, est, rcond=None)
    p_all = s.T @ coef
    return s_target, p_all - s_target, est - p_all


def bss_crit_numpy(s_target, e_interf, e_artif):
    """bss_crit: SDR / SIR / SAR from a gain decomposition (BSS_EVAL.m:10-13).
    With a single source e_interf is exactly 0 and SIR is +inf."""
    pt = np.sum(np.asarray(s_target) ** 2)
    pi = np.sum(np.asarray(e_interf) ** 2)
    pa = np.sum(np.asarray(e_artif) ** 2)
    with np.errstate(divide="ignore"):
        sdr = 10 * np.log10(pt / (pi + pa))
        sir = 10 * np.log10(pt / pi) if pi > 0 else np.inf
        sar = 10 * np.log10(np.sum((np.asarray(s_target)
                                    + np.asarray(e_interf)) ** 2) / pa)
    return sdr, sir, sar


@functools.partial(jax.jit, static_argnames=("target_index",))
def bss_eval_gain(ref: jax.Array, est: jax.Array,
                  target_index: int = 0, ridge: float = 1e-10) -> BssResult:
    """Batched BSS-Eval 2.0 gain decomposition on device.

    ref (B, K, N) sources (dead/zero rows are tolerated via the tiny ridge:
    their gain solves to 0 and they never enter the projection), est (B, N)
    one estimate per mixture, `target_index` the target's channel. Returns
    BssResult with (B,) sdr/sir/sar; perm is the constant target index
    (gain decomposition has designated channels, nothing to permute —
    BSS_EVAL.m:10-16). All inner products are HIGHEST-precision matmuls.
    """
    hp = jax.lax.Precision.HIGHEST
    ref = ref.astype(jnp.float32)
    est = est.astype(jnp.float32)
    b, k, n = ref.shape
    si = ref[:, target_index]                                   # (B, N)
    num = jnp.einsum("bn,bn->b", est, si, precision=hp)
    den = jnp.maximum(jnp.einsum("bn,bn->b", si, si, precision=hp), 1e-20)
    s_target = (num / den)[:, None] * si                        # (B, N)
    gram = jnp.einsum("bkn,bln->bkl", ref, ref, precision=hp)   # (B, K, K)
    rhs = jnp.einsum("bkn,bn->bk", ref, est, precision=hp)      # (B, K)
    eye = jnp.eye(k, dtype=jnp.float32)
    coef = jnp.linalg.solve(gram + ridge * eye, rhs[..., None])[..., 0]
    p_all = jnp.einsum("bk,bkn->bn", coef, ref, precision=hp)   # (B, N)
    e_interf = p_all - s_target
    e_artif = est - p_all

    def _db(a, bb, eps=1e-20):
        return 10.0 * jnp.log10(jnp.maximum(a, eps) / jnp.maximum(bb, eps))

    pt = jnp.sum(s_target ** 2, axis=-1)
    pi = jnp.sum(e_interf ** 2, axis=-1)
    pa = jnp.sum(e_artif ** 2, axis=-1)
    sdr = _db(pt, pi + pa)
    sir = _db(pt, pi)
    sar = _db(jnp.sum((s_target + e_interf) ** 2, axis=-1), pa)
    return BssResult(sdr, sir, sar,
                     jnp.full((b,), target_index, jnp.int32))


def gain_nsdr(pred: jax.Array, mix: jax.Array, sources: jax.Array,
              live: Optional[jax.Array] = None,
              target_index: int = 0):
    """The full Cocktail metric contract (BSS_EVAL.m:8-21): SDR/SIR/SAR of
    `pred` against ALL sources, NSDR = SDR - SDR(mix projected onto the
    TARGET ALONE). pred/mix (B, N), sources (B, K, N) with channel 0 the
    target by the Cocktail first-speaker-is-target convention; `live`
    (B, K) optionally zeroes dead padded channels before the solve."""
    if live is not None:
        sources = sources * live[..., None].astype(sources.dtype)
    res = bss_eval_gain(sources, pred, target_index=target_index)
    base = bss_eval_gain(sources[:, target_index:target_index + 1], mix,
                         target_index=0)
    return res, res.sdr - base.sdr
