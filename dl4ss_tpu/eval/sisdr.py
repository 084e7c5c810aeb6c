"""Scale-invariant SDR (and plain SDR) — the jitted inner-loop metric.

The reference scores every eval batch by writing wavs to disk and running a
CPU `bss_eval_sources` over them (Torch_multi/bss_test.py:12-61,
TDAA_beta/main_run_sstune_TestVer.py:513). SI-SDR (Le Roux et al. 2019) is
the modern equivalent for the in-loop metric and runs fully on device; the
exact BSS-Eval lives in `dl4ss_tpu.eval.bss_eval` for final numbers.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def si_sdr(est: jax.Array, ref: jax.Array, zero_mean: bool = True,
           eps: float = 1e-8) -> jax.Array:
    """SI-SDR in dB over the last axis; leading axes broadcast."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    target = (dot / jnp.maximum(energy, eps)) * ref
    noise = est - target
    ratio = (jnp.sum(target ** 2, axis=-1) /
             jnp.maximum(jnp.sum(noise ** 2, axis=-1), eps))
    return 10.0 * jnp.log10(jnp.maximum(ratio, eps))


def sdr_simple(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Plain (scale-variant) SNR-style SDR in dB."""
    ratio = (jnp.sum(ref ** 2, axis=-1) /
             jnp.maximum(jnp.sum((est - ref) ** 2, axis=-1), eps))
    return 10.0 * jnp.log10(jnp.maximum(ratio, eps))


def si_sdr_pit(est: jax.Array, ref: jax.Array, live=None):
    """Permutation-resolved SI-SDR: est/ref (B, K, N).

    Returns (per-sample mean SI-SDR over channels (B,), best perms (B, K)).
    `live` (B, K) masks dead channels (zero-gain speakers in variable-k
    mixtures) out of the mean — a silent reference would otherwise score
    ~-80 dB and poison the average.
    """
    k = est.shape[1]
    perms = np.array(list(itertools.permutations(range(k))))
    pair = si_sdr(est[:, :, None], ref[:, None, :, :])      # (B, K, K)
    gathered = pair[:, np.arange(k)[None, :], perms]        # (B, P, K)
    if live is not None:
        # the dead entity is the REFERENCE channel: weight each (est i ->
        # ref perm[i]) pair by the liveness of the ref it is scored against
        w = live.astype(gathered.dtype)[:, perms]           # (B, P, K)
        scores = (jnp.sum(gathered * w, axis=-1) /
                  jnp.maximum(jnp.sum(w, axis=-1), 1.0))
    else:
        scores = jnp.mean(gathered, axis=-1)                # (B, P)
    best = jnp.argmax(scores, axis=-1)
    return jnp.max(scores, axis=-1), jnp.asarray(perms)[best]
