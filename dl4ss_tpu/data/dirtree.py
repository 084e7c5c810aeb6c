"""Host-side speaker-tree dataset: decode + resample -> device utterance bank.

Rebuilds the predata_multiAims directory contract
(Torch_multi/predata_multiAims.py:84-120): a root with split subdirs
(`train/eval/test`), each containing one directory per speaker full of wavs.
The host's only jobs are wav decode, resample to cfg.frame_rate, and
crop/pad to cfg.max_len; mixing, gains, augmentation, and every STFT happen
on device (`dl4ss_tpu.data.synth`).

Two modes:
  * bank mode — load the whole split into an (S, U, N) device array
    (WSJ0-scale fits easily: 101 spk x ~100 utts x 40k samples x 4 B ≈ 1.6 GB
    in HBM, and far less for the fixed per-speaker cap used here);
  * streaming mode — `iter_batches` yields host numpy batches for corpora
    too big for HBM, feeding `device_prefetch`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from dl4ss_tpu.config import Config
from dl4ss_tpu.data.resample import resample_poly_kaiser
from dl4ss_tpu.data.wavio import read_wav


def scan_speaker_tree(root, split: Optional[str] = None
                      ) -> Dict[str, List[str]]:
    """-> {speaker_id: [wav paths]} sorted for determinism."""
    base = os.path.join(root, split) if split else root
    out: Dict[str, List[str]] = {}
    for spk in sorted(os.listdir(base)):
        spk_dir = os.path.join(base, spk)
        if not os.path.isdir(spk_dir):
            continue
        wavs = sorted(os.path.join(spk_dir, w) for w in os.listdir(spk_dir)
                      if w.lower().endswith(".wav"))
        if wavs:
            out[spk] = wavs
    return out


def _load_fixed(path, rate: int, num_samples: int,
                normalize: bool = False) -> np.ndarray:
    wav, sr = read_wav(path)
    if wav.ndim > 1:
        wav = wav[:, 0]
    wav = resample_poly_kaiser(wav, sr, rate)
    if len(wav) > num_samples:
        wav = wav[:num_samples]
    if normalize:
        # reference order: crop -> mean-sub -> peak-norm -> PAD
        # (predata_fromList.py:140-176) — normalizing after zero-padding
        # would leave a -mean DC offset in the padded tail
        wav = wav - wav.mean()
        wav = wav / max(float(np.abs(wav).max()), 1e-8)
    if len(wav) < num_samples:
        wav = np.pad(wav, (0, num_samples - len(wav)))
    return wav.astype(np.float32)


def _load_bank(paths, rate: int, num_samples: int,
               normalize: bool = True) -> np.ndarray:
    """(len(paths), num_samples) bank; native threaded C++ loader when built
    (dl4ss_tpu/native/loader.cc), numpy fallback otherwise. Rows are
    normalized BEFORE padding by default (so the device samplers'
    normalize_utterance is an exact no-op on them)."""
    from dl4ss_tpu import native
    if native.available():
        return native.load_batch(paths, rate, num_samples,
                                 normalize=normalize)
    return np.stack([_load_fixed(p, rate, num_samples, normalize=normalize)
                     for p in paths])


class DirTreeSampler:
    """Loads a split into an utterance bank usable by `sample_mixtures`."""

    def __init__(self, root, cfg: Config, split: str = "train",
                 utts_per_speaker: int = 32, utts_offset: int = 0):
        """`utts_offset` starts each speaker's slice that many utterances
        into the sorted list — train/held-out banks from one tree (e.g.
        rehearsal corpora reserve the LAST utterances for cv/tt)."""
        self.cfg = cfg
        tree = scan_speaker_tree(root, split)
        self.speakers = sorted(tree)
        self.spk2idx = {s: i for i, s in enumerate(self.speakers)}
        self.idx2spk = {i: s for s, i in self.spk2idx.items()}
        u = utts_per_speaker
        n = cfg.max_len
        flat_paths = []
        for spk in self.speakers:
            paths = tree[spk]
            if utts_offset and utts_offset + u > len(paths):
                # a wrapped held-out slice would silently re-include rows
                # from the training prefix and inflate eval scores
                raise ValueError(
                    f"held-out slice [{utts_offset}:{utts_offset + u}] wraps "
                    f"speaker {spk!r} ({len(paths)} utterances)")
            flat_paths.extend(paths[(utts_offset + ui) % len(paths)]
                              for ui in range(u))
        self.bank = _load_bank(flat_paths, cfg.frame_rate, n).reshape(
            len(self.speakers), u, n)

    @property
    def num_speakers(self) -> int:
        return len(self.speakers)


class StreamingTreeSampler:
    """Host-streaming variant for corpora too large for an HBM bank.

    Draws k-speaker batches by decoding just the needed utterances per batch
    (native threaded loader when built), yielding numpy batches shaped for
    `device_prefetch` + `featurize`. The bank-mode `DirTreeSampler` remains
    the fast path for WSJ0-scale data (SURVEY §2.2: whole corpus fits HBM).
    """

    def __init__(self, root, cfg: Config, split: str = "train",
                 seed: int = 1):
        self.cfg = cfg
        self.tree = scan_speaker_tree(root, split)
        self.speakers = sorted(self.tree)
        self.spk2idx = {s: i for i, s in enumerate(self.speakers)}
        self.rng = np.random.default_rng(seed)

    def batches(self, batch_size: int, num_batches: int):
        cfg = self.cfg
        k = cfg.max_mix
        for _ in range(num_batches):
            paths, spk_idx = [], np.zeros((batch_size, k), np.int32)
            for b in range(batch_size):
                spks = self.rng.choice(len(self.speakers), k, replace=False)
                spk_idx[b] = spks
                for s in spks:
                    wavs = self.tree[self.speakers[s]]
                    paths.append(wavs[self.rng.integers(len(wavs))])
            from dl4ss_tpu import native
            if native.available():
                wavs = native.load_batch(paths, cfg.frame_rate, cfg.max_len,
                                         normalize=True)
            else:
                wavs = np.stack([_load_fixed(p, cfg.frame_rate, cfg.max_len,
                                             normalize=True)
                                 for p in paths])
            wavs = wavs.reshape(batch_size, k, cfg.max_len)
            # rows arrive normalized pre-pad (reference order); re-applying
            # mean-sub/peak-norm here would re-introduce the padded-tail DC
            yield {
                "mix_wav": wavs.sum(axis=1).astype(np.float32),
                "source_wavs": wavs.astype(np.float32),
                "spk_idx": spk_idx,
                "gains": np.ones((batch_size, k), np.float32),
            }


def split_for_train_dev_test(items: List[str],
                             fractions=(0.7, 0.1, 0.2)) -> Tuple[List[str], ...]:
    """Deterministic 70/10/20 split by sorted order, the GRID convention
    (Torch_multi/predata.py:18-34)."""
    items = sorted(items)
    n = len(items)
    a = int(round(fractions[0] * n))
    b = a + int(round(fractions[1] * n))
    return items[:a], items[a:b], items[b:]
