"""Mask heads: query-vs-grid attention emitting time-frequency masks.

Rebuilds ATTENTION (Torch_multi/main_run.py:184-223 and the cRM fork,
TDAA_beta/main_run_sstune_cRM_EvalVer.py:229-303):

  * `dot`:   sigmoid(<emb_map[b,t,f,:], query[b,k,:]>) over the (T, F) grid
  * `align`: sigmoid(v . tanh(W1 h + W2 q)) additive attention
  * cRM variants: the query is split in two halves; each half produces one
    channel of a K*tanh-bounded complex mask (B, K, T, F, 2).

The reference materializes a (B*K, T, F, E) broadcast of the encoder output
before a batched matmul (main_run.py:478-480); here both modes are single
einsums over the unexpanded (B, T, F, E) grid — the broadcast never exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.common import linear_init


def init_mask_head(key, cfg: Config):
    """Params for `align` mode (the `dot` head is parameter-free)."""
    if cfg.mask_head == "dot":
        return {}
    e, a = cfg.embedding_size, cfg.embedding_size
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w_grid": linear_init(k1, e, a, bias=False),
        "w_query": linear_init(k2, e, a, bias=False),
        "v": linear_init(k3, a, 1, bias=False),
    }


def _dot_energy(emb_map, queries):
    """(B,T,F,E) x (B,K,E) -> (B,K,T,F)."""
    return jnp.einsum("btfe,bke->bktf", emb_map, queries,
                      preferred_element_type=jnp.float32).astype(emb_map.dtype)


def _align_energy(params, emb_map, queries):
    g = jnp.einsum("btfe,ea->btfa", emb_map, params["w_grid"]["w"],
                   preferred_element_type=jnp.float32)
    q = jnp.einsum("bke,ea->bka", queries, params["w_query"]["w"],
                   preferred_element_type=jnp.float32)
    # static loop over the (small) K query channels: the 5-D
    # (B,K,T,F,A) broadcast costs minutes of TPU compile and K*|g| memory
    v = params["v"]["w"]
    outs = []
    for ki in range(queries.shape[1]):
        s = jnp.tanh(g + q[:, ki][:, None, None, :])     # (B,T,F,A)
        outs.append(jnp.einsum("btfa,ax->btf", s, v,
                               preferred_element_type=jnp.float32))
    return jnp.stack(outs, axis=1).astype(emb_map.dtype)


def apply_mask_head(params, emb_map: jax.Array, queries: jax.Array,
                    cfg: Config) -> jax.Array:
    """emb_map (B,T,F,E), queries (B,K,Q) -> masks.

    Returns (B,K,T,F) sigmoid masks, or (B,K,T,F,2) K*tanh-bounded compressed
    cRM masks when cfg.is_complex_mask (per-channel queries = the two halves
    of the doubled embedding, main_run_sstune_cRM_EvalVer.py:259-270).
    """
    e = cfg.embedding_size
    if not cfg.is_complex_mask:
        if cfg.mask_head == "dot":
            energy = _dot_energy(emb_map, queries)
        else:
            energy = _align_energy(params, emb_map, queries)
        return jax.nn.sigmoid(energy)

    q_real, q_imag = queries[..., :e], queries[..., e:]
    if cfg.mask_head == "dot":
        e_real = _dot_energy(emb_map, q_real)
        e_imag = _dot_energy(emb_map, q_imag)
    else:
        e_real = _align_energy(params, emb_map, q_real)
        e_imag = _align_energy(params, emb_map, q_imag)
    energy = jnp.stack([e_real, e_imag], axis=-1)
    return cfg.crm_k * jnp.tanh(energy)
