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
                  spk_idx: jax.Array, cfg: Config,
                  live: Optional[jax.Array] = None,
                  shift_key: Optional[jax.Array] = None) -> MixtureBatch:
    """bank (U, N); utt_idx/gains_db/spk_idx (B, K) -> MixtureBatch.

    Normalization order matches the reference exactly: crop (bank rows are
    already MAX_LEN) -> mean-sub -> peak-norm -> pad -> per-utterance gain
    (predata_fromList.py:140-176). `live` (B, K) in {0,1} gates padded
    channels when entries with fewer than K speakers are padded up to the
    static width (the mixed-k recipe, predata_fromList_123.py:45-110).

    `shift_key` enables the AUGMENT_DATA train-time random circular shift of
    every source (predata_fromList.py:150-152). The reference shifts the
    cropped signal BEFORE zero-padding; bank rows are already padded, so the
    roll carries any padding along — identical whenever the utterance fills
    MAX_LEN (every 5 s crop), a benign variant for shorter ones.
    """
    wavs = normalize_utterance(bank[utt_idx])          # (B, K, N)
    if shift_key is not None:
        shifts = jax.random.randint(shift_key, wavs.shape[:2], 0,
                                    wavs.shape[-1])
        wavs = jax.vmap(jax.vmap(lambda w, s: jnp.roll(w, s)))(wavs, shifts)
    gains = 10.0 ** (gains_db / 20.0)
    if live is not None:
        gains = gains * live.astype(gains.dtype)
    sources = wavs * gains[..., None]
    return MixtureBatch(mix_wav=jnp.sum(sources, axis=1),
                        source_wavs=sources, spk_idx=spk_idx, gains=gains,
                        utt_idx=utt_idx)


def draw_same_speaker_rows(key: jax.Array, spk_idx: jax.Array,
                           utt_idx: jax.Array, spk_rows: jax.Array,
                           spk_counts: jax.Array) -> jax.Array:
    """For each (batch, channel) speaker, a bank row of a DIFFERENT random
    utterance of the same speaker — the dis-sp real-pool draw from the list
    vocabulary (predata_fromList_dis.py:37-66). `spk_rows` (S, Umax) holds
    each speaker's bank rows (padded by repetition), `spk_counts` (S,) the
    live prefix lengths. Speakers with a single utterance degenerate to that
    utterance (nothing else to draw)."""
    counts = spk_counts[spk_idx]                       # (B, K)
    r = jax.random.randint(key, spk_idx.shape, 0, 1 << 30) % counts
    drawn = spk_rows[spk_idx, r]
    # collision with the mixed utterance: step to the next row (mod count)
    bumped = spk_rows[spk_idx, (r + 1) % counts]
    return jnp.where((drawn == utt_idx) & (counts > 1), bumped, drawn)


@functools.partial(jax.jit, static_argnames=("cfg",))
def list_same_speaker_real_specs(key: jax.Array, batch: MixtureBatch,
                                 bank: jax.Array, spk_rows: jax.Array,
                                 spk_counts: jax.Array,
                                 cfg: Config) -> jax.Array:
    """dis-sp "real" pool for list-driven training: clean magnitude spectra
    of different utterances of the mixed speakers, drawn from the list
    vocabulary's utterance pool (predata_fromList_dis.py:37-66, consumed by
    main_run_sstune_dis_sp.py:613-624). Returns (B, K, T, F) for
    feats["real_specs"], in the same |STFT| convention as featurize's
    src_feas."""
    from dl4ss_tpu.ops.stft import stft_cfg
    rows = draw_same_speaker_rows(key, batch.spk_idx, batch.utt_idx,
                                  spk_rows, spk_counts)
    wavs = normalize_utterance(bank[rows])
    # gate dead padded channels (mixed-k entries) exactly like the fake
    # side, so the discriminator can't win on padding alone
    live = (batch.gains > 0).astype(wavs.dtype)
    return jnp.abs(stft_cfg(wavs, cfg)) * live[..., None, None]


class Wsj0MixSampler:
    """Loads the unique utterances referenced by the list(s) into one bank
    and yields epoch-finite batches of device index/gain arrays."""

    def __init__(self, list_dir, wav_root, cfg: Config, split: str = "train",
                 mix_ks: Sequence[int] = (2,), max_entries: Optional[int] = None,
                 spk2idx: Optional[dict] = None):
        self.cfg = cfg
        # per-k list pools with their own cursors — the mixed 1-3-speaker
        # recipe (predata_fromList_123.py:45-110); max_entries truncates each
        # pool like the reference's debug `[:17]` (:98)
        self.pools: dict = {}
        for k in mix_ks:
            path = os.path.join(list_dir, mix_list_name(k, split))
            if os.path.exists(path):
                entries = parse_mix_list(path)
                if max_entries:
                    entries = entries[:max_entries]
                if entries:
                    self.pools[k] = entries
        self.entries: List[Wsj0MixEntry] = [
            e for k in sorted(self.pools) for e in self.pools[k]]
        if not self.entries:
            raise FileNotFoundError(
                f"no mixture lists for split {split!r} in {list_dir}")
        self.k = max(self.pools)   # static channel width (smaller k padded)

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

        # per-speaker utterance-row table (dis-sp same-speaker real pool,
        # predata_fromList_dis.py:37-66): rows (S, Umax) padded by repeating
        # the speaker's rows, counts (S,) the live prefix lengths
        by_spk: dict = {i: [] for i in self.idx2spk}
        for e in self.entries:
            for s, p in zip(e.speakers, e.paths):
                si = self.spk2idx[s]
                r = self.utt2row[p]
                if r not in by_spk[si]:
                    by_spk[si].append(r)
        umax = max(max((len(v) for v in by_spk.values()), default=0), 1)
        self.spk_rows = np.zeros((len(by_spk), umax), np.int32)
        self.spk_counts = np.zeros((len(by_spk),), np.int32)
        for si, rows in by_spk.items():
            if not rows:
                # injected-vocabulary speaker absent from this split's
                # lists: never mixed, so never drawn from — leave zeros
                continue
            rep = (rows * umax)[:umax]
            self.spk_rows[si] = rep
            self.spk_counts[si] = len(rows)

        # per-k index arrays, padded to the static width self.k (padded
        # channels: utterance row 0, speaker 0, live 0 — zero-gained in
        # mix_from_list so they never contribute)
        self._per_k: dict = {}
        for k, entries in self.pools.items():
            n = len(entries)
            utt = np.zeros((n, self.k), np.int32)
            db = np.zeros((n, self.k), np.float32)
            spk = np.zeros((n, self.k), np.int32)
            live = np.zeros((n, self.k), np.float32)
            for i, e in enumerate(entries):
                utt[i, :k] = [self.utt2row[p] for p in e.paths]
                db[i, :k] = e.gains_db
                spk[i, :k] = [self.spk2idx[s] for s in e.speakers]
                live[i, :k] = 1.0
            self._per_k[k] = (utt, db, spk, live)

    @property
    def num_speakers(self) -> int:
        return len(self.spk2idx)

    def num_batches(self, batch_size: int) -> int:
        # python-2 floor division semantics, per k-pool — each pool yields
        # exactly len_k // batch_size batches before the cursor switches
        # (predata_fromList.py:90; predata_fromList_123.py cursor check)
        return sum(len(v[0]) // batch_size for v in self._per_k.values())

    def epoch(self, batch_size: int, shuffle: bool = True, seed: int = 0
              ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]]:
        """Yields (utt_idx, gains_db, spk_idx, live) batches; ends when all
        pools are exhausted (the reference's `yield False`,
        predata_fromList.py:100). Batches are uniform-k; the epoch consumes
        contiguous per-k blocks in random order, reproducing the reference's
        pick-a-k-until-its-list-runs-out cursor walk
        (predata_fromList_123.py:84-110)."""
        rng = np.random.default_rng(seed)
        ks = sorted(self._per_k)
        if shuffle:
            rng.shuffle(ks)
        for k in ks:
            utt, db, spk, live = self._per_k[k]
            order = np.arange(len(utt))
            if shuffle:
                rng.shuffle(order)
            for b in range(len(utt) // batch_size):
                sel = order[b * batch_size:(b + 1) * batch_size]
                yield utt[sel], db[sel], spk[sel], live[sel]

    def device_bank(self) -> jax.Array:
        """The utterance bank on device, transferred ONCE and cached — at
        real wsj0 scale (~28k utterances) the bank is ~4.5 GB; re-uploading
        it every epoch would dominate epoch wall-clock."""
        if getattr(self, "_device_bank", None) is None:
            self._device_bank = jnp.asarray(self.bank)
        return self._device_bank

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                augment: bool = False) -> Iterator[MixtureBatch]:
        """augment=True applies the train-time random circular shift to every
        source (AUGMENT_DATA, predata_fromList.py:150-152); eval/cv batches
        keep it off like the reference's train_or_test gate."""
        bank = self.device_bank()
        base = jax.random.PRNGKey(seed + 15485863) if augment else None
        for i, (utt, db, spk, live) in enumerate(
                self.epoch(batch_size, shuffle, seed)):
            k = jax.random.fold_in(base, i) if augment else None
            yield mix_from_list(bank, jnp.asarray(utt), jnp.asarray(db),
                                jnp.asarray(spk), self.cfg,
                                live=jnp.asarray(live), shift_key=k)
