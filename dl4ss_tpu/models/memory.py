"""Life-long speaker memory as explicit functional state.

Unifies the reference's two memory designs into one pytree that lives in the
train state (non-differentiable, updated post-step — reproducing the Keras
out-of-graph `update_memory` write, Cocktail/.../extend_layers.py:220-228,
and the torch MEMORY list, Torch_multi/main_run.py:67-181):

  * vectors (S, 3, D): one D-dim vector per speaker per modality slot
    (voice / image / video — the torch 3H layout, main_run.py:78-80);
  * age (S, 3): per-slot write counts (the torch age vector).

Write semantics are selectable:
  * "keras": L2-normalize the incoming vector (eps-guarded, matching
    extend_layers.py:160-166), scatter-add into the row, then renormalize
    the whole row — SpkLifeLongMemory's inc_subtensor update;
  * "torch": final = (old + new) / ||old + new||_2 — MEMORY.updata_vector
    (main_run.py:129-140).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SLOT_SPEECH, SLOT_IMAGE, SLOT_VIDEO = 0, 1, 2


class MemorySlots(NamedTuple):
    vectors: jax.Array  # (S, 3, D) float32
    age: jax.Array      # (S, 3) int32


def memory_rows(cfg) -> int:
    """Memory row count for a Config: the speaker inventory plus the
    reserved unk row (SpkLifeLongMemory sizes its table with the unk slot
    when UNK_SPK, extend_layers.py:133-136). Single source of truth —
    create_train_state and create_memory_state must size identically or
    checkpoints stop round-tripping between them."""
    return cfg.num_speakers + (1 if cfg.unk_spk else 0)


def init_memory(num_speakers: int, dim: int) -> MemorySlots:
    return MemorySlots(
        vectors=jnp.zeros((num_speakers, 3, dim), jnp.float32),
        age=jnp.zeros((num_speakers, 3), jnp.int32),
    )


def _safe_l2(v: jax.Array, axis=-1, keepdims=True) -> jax.Array:
    """L2 norm with the reference's zero guard (np.spacing(1) substitution,
    extend_layers.py:161)."""
    v = jnp.where(v == 0.0, np.spacing(np.float32(1.0)), v)
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def memory_write_slot(state: MemorySlots, spk_idx: jax.Array,
                      vec: jax.Array, slot: int = SLOT_SPEECH,
                      mode: str = "keras") -> MemorySlots:
    """Batched write: spk_idx (B,) int32, vec (B, D) -> new state.

    Duplicate indices within the batch accumulate (inc_subtensor semantics).
    """
    old = state.vectors[:, slot, :]
    if mode == "keras":
        incoming = vec / _safe_l2(vec)
        new = old.at[spk_idx].add(incoming)
        new = new / _safe_l2(new)
    elif mode == "torch":
        summed = old.at[spk_idx].add(vec)
        norm = jnp.linalg.norm(summed, axis=-1, keepdims=True)
        new = jnp.where(norm > 0, summed / jnp.maximum(norm, 1e-12), summed)
        # only touched rows renormalize in the reference; untouched rows kept
        touched = jnp.zeros((old.shape[0],), bool).at[spk_idx].set(True)
        new = jnp.where(touched[:, None], new, old)
    else:
        raise ValueError(f"unknown memory mode {mode!r}")
    vectors = state.vectors.at[:, slot, :].set(new)
    age = state.age.at[spk_idx, slot].add(1)
    return MemorySlots(vectors, age)


def memory_write(state: MemorySlots, spk_idx, vec, slot=SLOT_SPEECH,
                 mode="keras") -> MemorySlots:
    return memory_write_slot(state, spk_idx, vec, slot, mode)


def memory_read(state: MemorySlots, spk_idx: jax.Array,
                slot: int = SLOT_SPEECH) -> jax.Array:
    """SelectSpkMemory gather (extend_layers.py:188-216): (B,) -> (B, D)."""
    return state.vectors[spk_idx, slot, :]


def memory_reset_rows(state: MemorySlots, spk_idx: jax.Array) -> MemorySlots:
    """Zero the given rows (all slots). Used between successive
    unknown-speaker enrollments so the reserved unk row starts fresh for
    each speaker (the reference evaluates unk speakers one at a time for
    exactly this reason — batching 'confuses the memory',
    Cocktail/.../predict.py:48-50)."""
    return MemorySlots(vectors=state.vectors.at[spk_idx].set(0.0),
                       age=state.age.at[spk_idx].set(0))


def memory_extend(state: MemorySlots, extra_rows: int) -> MemorySlots:
    """Append `extra_rows` zeroed rows — batched unk-speaker evaluation
    enrolls each unknown speaker into their own fresh row, removing the
    reference's batch-size-1 restriction."""
    s, slots, d = state.vectors.shape
    return MemorySlots(
        vectors=jnp.concatenate(
            [state.vectors, jnp.zeros((extra_rows, slots, d))], axis=0),
        age=jnp.concatenate(
            [state.age, jnp.zeros((extra_rows, slots), jnp.int32)], axis=0))
