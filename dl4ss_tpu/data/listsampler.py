"""List-driven mixture sampling — the official wsj0-2mix recipe.

Rebuilds TDAA's epoch-finite list pipeline (TDAA_beta/predata_fromList.py:
80-233, predata_fromList_123.py per-k pools): mixtures come from the
official `mix_{k}_spk_{tr,cv,tt}.txt` lists with per-utterance dB gains
(linear gain 10^(dB/20), :158-159), epochs end when the list is exhausted
(the reference's `yield False`), and SHUFFLE_BATCH shuffles entry order.

Host work = decode unique utterances once into a bank; each batch is then a
device-side gather+mix (`mix_from_list`), so epoch iteration is index
shuffling only.
"""

from __future__ import annotations

import functools
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.config import Config
from dl4ss_tpu.data.synth import MixtureBatch, normalize_utterance
from dl4ss_tpu.data.wsj0mix import Wsj0MixEntry, mix_list_name, parse_mix_list


@functools.partial(jax.jit, static_argnames=("cfg",))
def mix_from_list(bank: jax.Array, utt_idx: jax.Array, gains_db: jax.Array,
                  spk_idx: jax.Array, cfg: Config) -> MixtureBatch:
    """bank (U, N); utt_idx/gains_db/spk_idx (B, K) -> MixtureBatch.

    Normalization order matches the reference exactly: crop (bank rows are
    already MAX_LEN) -> mean-sub -> peak-norm -> pad -> per-utterance gain
    (predata_fromList.py:140-176).
    """
    wavs = normalize_utterance(bank[utt_idx])          # (B, K, N)
    gains = 10.0 ** (gains_db / 20.0)
    sources = wavs * gains[..., None]
    return MixtureBatch(mix_wav=jnp.sum(sources, axis=1),
                        source_wavs=sources, spk_idx=spk_idx, gains=gains)


class Wsj0MixSampler:
    """Loads the unique utterances referenced by the list(s) into one bank
    and yields epoch-finite batches of device index/gain arrays."""

    def __init__(self, list_dir, wav_root, cfg: Config, split: str = "train",
                 mix_ks: Sequence[int] = (2,), max_entries: Optional[int] = None,
                 spk2idx: Optional[dict] = None):
        self.cfg = cfg
        self.entries: List[Wsj0MixEntry] = []
        for k in mix_ks:
            path = os.path.join(list_dir, mix_list_name(k, split))
            if os.path.exists(path):
                self.entries.extend(parse_mix_list(path))
        if max_entries:
            self.entries = self.entries[:max_entries]
        if not self.entries:
            raise FileNotFoundError(
                f"no mixture lists for split {split!r} in {list_dir}")
        self.k = len(self.entries[0].paths)
        assert all(len(e.paths) == self.k for e in self.entries), \
            "mixed k within one sampler; use one sampler per k"

        # speaker vocabulary across the lists (spk2idx contract); a caller
        # may inject the TRAIN vocabulary so a cv/dev sampler indexes the
        # same embedding table rows
        if spk2idx is None:
            spk_set = sorted({s for e in self.entries for s in e.speakers})
            self.spk2idx = {s: i for i, s in enumerate(spk_set)}
        else:
            self.spk2idx = dict(spk2idx)
            missing = ({s for e in self.entries for s in e.speakers}
                       - set(self.spk2idx))
            if missing:
                raise ValueError(
                    f"list speakers {sorted(missing)} absent from the "
                    f"provided spk2idx vocabulary")
        self.idx2spk = {i: s for s, i in self.spk2idx.items()}

        # unique utterance paths -> bank rows
        uniq = sorted({p for e in self.entries for p in e.paths})
        self.utt2row = {p: i for i, p in enumerate(uniq)}
        paths = [os.path.join(wav_root, p) for p in uniq]
        from dl4ss_tpu.data.dirtree import _load_bank
        self.bank = _load_bank(paths, cfg.frame_rate, cfg.max_len)

        self.utt_idx = np.array(
            [[self.utt2row[p] for p in e.paths] for e in self.entries],
            np.int32)
        self.gains_db = np.array([e.gains_db for e in self.entries],
                                 np.float32)
        self.spk_idx = np.array(
            [[self.spk2idx[s] for s in e.speakers] for e in self.entries],
            np.int32)

    @property
    def num_speakers(self) -> int:
        return len(self.spk2idx)

    def num_batches(self, batch_size: int) -> int:
        # python-2 floor division semantics (predata_fromList.py:90)
        return len(self.entries) // batch_size

    def epoch(self, batch_size: int, shuffle: bool = True, seed: int = 0
              ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yields (utt_idx, gains_db, spk_idx) batches; ends when exhausted
        (the reference's `yield False` epoch end, predata_fromList.py:100)."""
        order = np.arange(len(self.entries))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for b in range(self.num_batches(batch_size)):
            sel = order[b * batch_size:(b + 1) * batch_size]
            yield self.utt_idx[sel], self.gains_db[sel], self.spk_idx[sel]

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0
                ) -> Iterator[MixtureBatch]:
        bank = jnp.asarray(self.bank)
        for utt, db, spk in self.epoch(batch_size, shuffle, seed):
            yield mix_from_list(bank, jnp.asarray(utt), jnp.asarray(db),
                                jnp.asarray(spk), self.cfg)
