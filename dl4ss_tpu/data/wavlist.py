"""Cocktail wavlist consumer — the deterministic list-driven eval protocol.

The reference's Keras evaluator does NOT sample random mixtures: it re-mixes
every dev/test entry from the wavlist columns — target utterance + one or
more background utterances per line, normalized and summed on the fly
(Cocktail/software/DL4SS_Keras/predict.py:104-155) — and the unk protocol
reads a supplemental-sounds column for enrollment audio
(predict.py:160-180, rows written by gen_file_list.py:103-128). This module
consumes the lists `data.layout_tools.generate_file_lists` emits (the
gen_file_list.py rebuild), so Cocktail numbers are reproducible
run-to-run instead of depending on a random bank draw:

  * train rows   `wav spk`                     -> per-speaker bank
  * dev/test rows `tar bg[,bg...] spk`          -> deterministic mixtures
  * unk rows     `tar bg unk supp[,supp...]`    -> mixtures + enrollment pool

Host work = decode the unique utterances once (native threaded loader when
built); each batch is then a device-side gather+sum like the wsj0-2mix list
path, with the reference's normalize-then-sum order (mean-sub -> peak-norm
-> pad -> sum, predict.py:118-140) reproduced by bank rows normalized
pre-pad + unit gains.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.config import Config
from dl4ss_tpu.data.synth import MixtureBatch


class WavListRow(NamedTuple):
    target: str
    bgs: Tuple[str, ...]       # background utterances (empty for train rows)
    speaker: str               # target speaker name ('unk' on unk rows)
    supps: Tuple[str, ...]     # unk supplemental-enrollment utterances


def parse_wavlist(path: str) -> List[WavListRow]:
    """Parses any of the three row formats (the column layouts of
    gen_file_list.py:41-128). Train rows have 2 columns, dev/test 3
    (bg column comma-joined), unk 4 (speaker column == 'unk')."""
    rows = []
    with open(path) as fh:
        for ln in fh:
            cols = ln.split()
            if not cols:
                continue
            if len(cols) == 2:                       # train: wav spk
                rows.append(WavListRow(cols[0], (), cols[1], ()))
            elif len(cols) == 3:                     # dev/test: tar bgs spk
                rows.append(WavListRow(cols[0], tuple(cols[1].split(",")),
                                       cols[2], ()))
            elif len(cols) == 4:                     # unk: tar bg unk supps
                rows.append(WavListRow(cols[0], tuple(cols[1].split(",")),
                                       cols[2], tuple(cols[3].split(","))))
            else:
                raise ValueError(f"{path}: unparseable row {ln!r}")
    if not rows:
        raise ValueError(f"{path}: empty wavlist")
    return rows


def _speaker_of(path: str) -> str:
    """Speaker name of a wavlist path = its parent directory (the tree
    convention gen_file_list.py walks)."""
    return os.path.basename(os.path.dirname(path))


class WavListMixer:
    """Decodes the unique utterances of a dev/test/unk wavlist into one bank
    and yields its mixtures as deterministic, list-ordered batches."""

    def __init__(self, rows: List[WavListRow], wav_root: str, cfg: Config,
                 spk2idx: Dict[str, int], max_mix: Optional[int] = None):
        self.cfg = cfg
        self.rows = rows
        # the reference mixes ([tar] + bgs)[:spk_num] (predict.py:107) —
        # extra test-row backgrounds beyond MAX_MIX-1 stay unused until a
        # higher-k evaluation asks for them
        self.k = max_mix if max_mix is not None else cfg.max_mix
        uniq = sorted({p for r in rows
                       for p in (r.target,) + r.bgs[:self.k - 1]})
        self.utt2row = {p: i for i, p in enumerate(uniq)}
        from dl4ss_tpu.data.dirtree import _load_bank
        self.bank = jnp.asarray(_load_bank(
            [os.path.join(wav_root, p) for p in uniq],
            cfg.frame_rate, cfg.max_len))
        self.spk2idx = spk2idx

    def _index_row(self, r: WavListRow):
        paths = [r.target] + list(r.bgs[:self.k - 1])
        utt = [self.utt2row[p] for p in paths]
        # channel 0 speaker comes from the row's speaker column; interferer
        # channels are named by their path's parent directory
        spks = [r.speaker] + [_speaker_of(p) for p in r.bgs[:self.k - 1]]
        spk = [self.spk2idx.get(s, 0) for s in spks]
        live = [1.0] * len(paths)
        while len(utt) < self.k:                     # short rows pad dead
            utt.append(0)
            spk.append(0)
            live.append(0.0)
        return utt, spk, live

    def batches(self, batch_size: int,
                target_rows: Optional[Dict[str, int]] = None
                ) -> Iterator[Tuple[MixtureBatch, int]]:
        """Yields (MixtureBatch, n_valid) in list order; the final partial
        batch is padded by repeating its last row (score only the first
        n_valid). `target_rows` overrides channel-0 speaker ids (the unk
        protocol's enrolled memory rows)."""
        from dl4ss_tpu.data.listsampler import mix_from_list
        n = len(self.rows)
        for start in range(0, n, batch_size):
            chunk = self.rows[start:start + batch_size]
            n_valid = len(chunk)
            while len(chunk) < batch_size:
                chunk = chunk + [chunk[-1]]
            utt = np.zeros((batch_size, self.k), np.int32)
            spk = np.zeros((batch_size, self.k), np.int32)
            live = np.zeros((batch_size, self.k), np.float32)
            for i, r in enumerate(chunk):
                u, s, lv = self._index_row(r)
                utt[i], spk[i], live[i] = u, s, lv
                if target_rows is not None:
                    spk[i, 0] = target_rows[r.target]
            # unit gains: the reference sums the normalized signals as-is
            # (predict.py:134-140); zero-dB rows through the same
            # gather+sum path as the wsj0-2mix lists
            batch = mix_from_list(self.bank, jnp.asarray(utt),
                                  jnp.zeros((batch_size, self.k), np.float32),
                                  jnp.asarray(spk), self.cfg,
                                  live=jnp.asarray(live))
            yield batch, n_valid


def train_bank_from_wavlist(path: str, wav_root: str, cfg: Config,
                            utts_per_speaker: Optional[int] = None):
    """(S, U, N) bank + {speaker: idx} from a `wav spk` train wavlist — the
    reference's training generator draws its k-speaker mixtures from
    exactly these rows (prepare_data.py:104-155). U = the smallest
    per-speaker utterance count (or `utts_per_speaker`), so the bank is
    rectangular for the device-side samplers."""
    rows = parse_wavlist(path)
    by_spk: Dict[str, List[str]] = {}
    for r in rows:
        if r.bgs:
            raise ValueError(f"{path} is not a train wavlist (bg column)")
        by_spk.setdefault(r.speaker, []).append(r.target)
    speakers = sorted(by_spk)
    u = min(len(v) for v in by_spk.values())
    if utts_per_speaker is not None:
        u = min(u, utts_per_speaker)
    paths = [p for s in speakers for p in sorted(by_spk[s])[:u]]
    from dl4ss_tpu.data.dirtree import _load_bank
    bank = _load_bank(paths, cfg.frame_rate, cfg.max_len).reshape(
        len(speakers), u, cfg.max_len)
    return bank, {s: i for i, s in enumerate(speakers)}


def enrollment_wav(row: WavListRow, wav_root: str, cfg: Config,
                   seconds: float, supp_cap: Optional[int] = None
                   ) -> np.ndarray:
    """The unk enrollment signal: concatenate the row's supplemental
    utterances (up to UNK_SPK_SUPP of them) and keep the first
    `supp_time` seconds (predict.py:160-180). Returns (cfg.max_len,)
    zero-padded."""
    from dl4ss_tpu.data.resample import resample_poly_kaiser
    from dl4ss_tpu.data.wavio import read_wav
    supps = row.supps[:supp_cap] if supp_cap else row.supps
    if not supps:
        raise ValueError("unk row carries no supplemental utterances")
    want = min(int(seconds * cfg.frame_rate), cfg.max_len)
    parts = []
    got = 0
    for p in supps:
        w, sr = read_wav(os.path.join(wav_root, p))
        if w.ndim > 1:
            w = w[:, 0]
        w = resample_poly_kaiser(w, sr, cfg.frame_rate)
        # voiceprint normalization per utterance (the enrolled query rides
        # the same normalize-then-encode path as training clean speech)
        w = w - w.mean()
        w = w / max(float(np.abs(w).max()), 1e-8)
        parts.append(w)              # RAW lengths concatenate (no padding
        got += len(w)                # between utterances, predict.py:169-178)
        if got >= want:
            break
    wav = np.concatenate(parts)[:want]
    return np.pad(wav, (0, cfg.max_len - len(wav))).astype(np.float32)
