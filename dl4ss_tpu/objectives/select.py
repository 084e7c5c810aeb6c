"""Speaker-channel selection: thresholded top-k and cosine dedup.

jit-friendly (static-shape) rebuilds of:
  * top_k_mask (Torch_multi/main_run.py:340-355): keep a speaker iff its
    classifier probability is among the row's top_k AND exceeds alpha — the
    reference loops rows in Python; here it is a rank comparison.
  * select_the_final "quchong" dedup
    (Torch_multi/main_run_multi_selfSS_quchong.py:398-445): walk candidates
    by descending probability, keep one iff its embedding's cosine distance
    to every already-kept embedding >= alpha, stop at top_k; 2-mix fallback
    appends the embedding farthest from the top-1 pick.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def top_k_mask(probs: jax.Array, alpha: float, top_k: int) -> jax.Array:
    """(B, S) probabilities -> (B, S) 0/1 channel gate."""
    ranks = jnp.argsort(jnp.argsort(-probs, axis=-1), axis=-1)
    keep = (ranks < top_k) & (probs > alpha)
    return keep.astype(probs.dtype)


def top_k_indices(probs: jax.Array, top_k: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """(B, S) -> (indices (B, K) sorted by prob desc, their probs)."""
    vals, idx = jax.lax.top_k(probs, top_k)
    return idx, vals


def candidate_pools(key: jax.Array, spk_idx: jax.Array, live: jax.Array,
                    n_candidates: int, num_speakers: int) -> jax.Array:
    """Per-sample candidate rosters for the multi-speech test protocol
    (`aim_pro`, Torch_multi/predata_multiSpeechTest.py:89-115): each sample
    knows a short list of POSSIBLE speakers a priori — the true mixed
    speakers plus random distractors up to `n_candidates`. Returns a
    (B, S) 0/1 membership mask.

    Distractors are drawn without replacement from the non-true vocabulary
    via a per-row random ranking (static shapes, jit-friendly)."""
    b, k = spk_idx.shape
    member = jnp.zeros((b, num_speakers), bool)
    member = member.at[jnp.arange(b)[:, None], spk_idx].max(
        live.astype(bool))
    scores = jax.random.uniform(key, (b, num_speakers))
    scores = jnp.where(member, -jnp.inf, scores)          # never re-draw true
    n_true = jnp.sum(member, axis=-1, keepdims=True)      # (B, 1)
    want = jnp.maximum(n_candidates - n_true, 0)
    ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
    return member | (ranks < want)


def candidate_restricted_select(probs: jax.Array, candidates: jax.Array,
                                top_k: int) -> jax.Array:
    """Top-k speaker selection restricted to a per-sample candidate pool —
    the reference evaluator picks only among each sample's `aim_pro` roster
    (predata_multiSpeechTest.py:89-115). probs (B, S); candidates (B, S)
    boolean membership. Returns indices (B, K)."""
    masked = jnp.where(candidates, probs, -1.0)
    _, idx = jax.lax.top_k(masked, top_k)
    return idx


def cosine_dedup_select(probs: jax.Array, embeddings: jax.Array,
                        alpha: float = 0.15, top_k: int = 2,
                        two_mix_fallback: bool = True) -> jax.Array:
    """Greedy diversity-aware speaker selection. Returns indices (B, K).

    probs (B, S); embeddings (S, Q) — the trained speaker-embedding table
    rows the reference runs its pairwise `paired_cosine_distances` over.
    Static-shape greedy scan over the S candidates in probability order.
    """
    b, s = probs.shape
    norm = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
    cos_dist = 1.0 - norm @ norm.T                       # (S, S)
    order = jnp.argsort(-probs, axis=-1)                 # (B, S)

    def per_row(order_row):
        def body(carry, cand):
            kept_mask, n_kept = carry                    # (S,) bool, scalar
            # distance to every kept embedding must be >= alpha
            dists = cos_dist[cand]                       # (S,)
            conflict = jnp.any(kept_mask & (dists < alpha))
            take = (~conflict) & (n_kept < top_k)
            kept_mask = kept_mask.at[cand].set(kept_mask[cand] | take)
            return (kept_mask, n_kept + take.astype(jnp.int32)), take

        (kept_mask, n_kept), taken = jax.lax.scan(
            body, (jnp.zeros((s,), bool), jnp.asarray(0, jnp.int32)),
            order_row)
        # gather kept candidates in visit order
        kept_pos = jnp.where(taken, jnp.arange(s), s)    # visit slots
        sel = jnp.argsort(kept_pos)[:top_k]              # first `top_k` takes
        picked = order_row[sel]
        if two_mix_fallback and top_k == 2:
            # if only one kept, replace slot 1 with argmax distance to top-1
            top1 = order_row[0]
            far = jnp.argmax(cos_dist[top1])
            picked = jnp.where(n_kept >= 2, picked,
                               jnp.stack([top1, far]))
        return picked

    return jax.vmap(per_row)(order)
