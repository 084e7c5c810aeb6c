"""Mixture synthesis — on device, inside jit.

Rebuilds the reference's generator inner loop (SURVEY.md §3.5;
Torch_multi/predata_multiAims.py:122-214): crop to MAX_LEN -> mean-subtract
-> peak-normalize -> optional random circular shift -> zero-pad -> per-channel
dB gain -> sum into the mixture. In the reference this plus 3+ librosa STFTs
per item is the CPU hot loop #1; here the utterance bank lives in HBM and the
whole synthesis + STFT featurization is one traced XLA program keyed by a
`jax.random` key — zero host work per batch.

Also provides a synthetic "speech-like" bank (per-speaker f0, harmonic
stack, AM envelope) so every preset can train/bench without WSJ0 on disk,
mirroring the role of `prepare_data_fake` (predata_multiAims.py:63-73).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu.config import Config
from dl4ss_tpu.ops.crm import pack_ri
from dl4ss_tpu.ops.stft import spectral_feature_cfg, stft_cfg


class MixtureBatch(NamedTuple):
    mix_wav: jax.Array      # (B, N)
    source_wavs: jax.Array  # (B, K, N) gain-scaled sources (sum == mix)
    spk_idx: jax.Array      # (B, K) int32 speaker ids
    gains: jax.Array        # (B, K) linear per-channel gains
    utt_idx: Optional[jax.Array] = None  # (B, K) per-speaker utterance row
    # (bank-mode only; lets the dis-sp real pool exclude the mixed
    # utterance, predata_fromList_dis.py:37-66)


def normalize_utterance(wav: jax.Array, eps: float = 1e-8) -> jax.Array:
    """mean-subtract then peak-normalize (predata_multiAims.py:150-151)."""
    wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return wav / jnp.maximum(peak, eps)


def make_synthetic_bank(seed: int, num_speakers: int, utts_per_speaker: int,
                        num_samples: int, rate: int = 8000,
                        timbre: bool = False) -> np.ndarray:
    """(S, U, N) float32 bank of harmonic speech-like utterances.

    timbre=False (default, all historical demo numbers): a speaker's only
    cross-utterance invariant is its f0 — with ~100 speakers over the
    80-280 Hz range the +/-4% per-utterance jitter overlaps neighboring
    speakers, so exact speaker ID from HELD-OUT utterances is nearly
    unidentifiable by construction (measured: ~10% top-2 recall at 101
    speakers).
    timbre=True additionally fixes a per-speaker harmonic amplitude
    envelope (the voice's spectral signature, as real voices have), making
    speaker identity learnable across utterances — used by the rehearsal
    corpus so classifier-driven workflows are meaningful at scale.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(num_samples) / rate
    f0s = rng.uniform(80.0, 280.0, num_speakers)
    # log-uniform over [0.02, 1]: wide per-speaker spectral contrast, the
    # identity signal a nearest-neighbor probe recovers at >0.9 accuracy
    # (tests/test_data.py::test_synthetic_bank_timbre_identifiability)
    prof = (np.exp(rng.uniform(np.log(0.02), 0.0, (num_speakers, 8)))
            if timbre else None)
    bank = np.zeros((num_speakers, utts_per_speaker, num_samples), np.float32)
    for s in range(num_speakers):
        for u in range(utts_per_speaker):
            f0 = f0s[s] * (1.0 + 0.04 * rng.standard_normal())
            sig = np.zeros_like(t)
            for h in range(1, 9):
                if timbre:
                    # speaker-fixed envelope, utterance-level +/-8% shimmer
                    amp = (prof[s, h - 1]
                           * (1.0 + 0.08 * rng.standard_normal()) / h)
                else:
                    amp = rng.uniform(0.2, 1.0) / h
                vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(2, 6) * t)
                sig += amp * np.sin(2 * np.pi * h * f0 * vib * t
                                    + rng.uniform(0, 2 * np.pi))
            env = 0.55 + 0.45 * np.sin(
                2 * np.pi * rng.uniform(1.0, 3.0) * t + rng.uniform(0, 6.28))
            sig = sig * env + 0.01 * rng.standard_normal(num_samples)
            bank[s, u] = (sig / np.max(np.abs(sig))).astype(np.float32)
    return bank


@functools.partial(jax.jit, static_argnames=("cfg", "batch_size", "train"))
def sample_mixtures(key: jax.Array, bank: jax.Array, cfg: Config,
                    batch_size: Optional[int] = None,
                    train: bool = True,
                    noise_bank: Optional[jax.Array] = None) -> MixtureBatch:
    """Draw a batch of k-speaker mixtures from an (S, U, N) utterance bank.

    k is static (= cfg.max_mix); mixtures with fewer live speakers are
    expressed by zero gains when min_mix < max_mix (channel gating keeps
    shapes static, the same trick the reference's 0/1 speaker mask plays).
    """
    b = batch_size or cfg.batch_size
    k = cfg.max_mix
    s, u, n = bank.shape
    (k_spk, k_utt, k_db, k_ch, k_shift, k_live,
     k_noise) = jax.random.split(key, 7)

    # distinct speakers per item
    def pick(kk):
        return jax.random.choice(kk, s, (k,), replace=False)
    spk_idx = jax.vmap(pick)(jax.random.split(k_spk, b))          # (B, K)
    utt_idx = jax.random.randint(k_utt, (b, k), 0, u)
    wavs = bank[spk_idx, utt_idx]                                  # (B, K, N)
    wavs = normalize_utterance(wavs)

    if train and cfg.augment_data:
        shifts = jax.random.randint(k_shift, (b, k), 0, n)
        wavs = jax.vmap(jax.vmap(lambda w, sh: jnp.roll(w, sh)))(wavs, shifts)

    # variable speaker count: channels beyond the drawn live count are zeroed
    if cfg.min_mix < cfg.max_mix:
        live = jax.random.randint(k_live, (b,), cfg.min_mix, cfg.max_mix + 1)
    else:
        live = jnp.full((b,), cfg.max_mix)

    # SNR augment, per-item by live speaker count:
    #  k=2 — one of the two channels scaled by 10^(dB/20*r)
    #    (predata_multiAims_dB.py:123-130);
    #  k=3 — the large/small/normal trio: ch0 normal 10^(dB/20*0.5),
    #    ch1 large 10^(dB/20*(0.5+0.5r)), ch2 small 10^(dB/20*0.5r)
    #    (predata_multiAims_3dB.py:132-145, applied at :211-217);
    #  other k — unity (the reference has no rule beyond 3).
    gains = jnp.ones((b, k))
    if cfg.db_range > 0 and train and cfg.augment_data:
        scale = cfg.db_range / 20.0
        r_db = jax.random.uniform(k_db, (b, 3))
        ratio2 = 10.0 ** (scale * r_db[:, 0])
        chan = jax.random.randint(k_ch, (b,), 0, min(k, 2))
        gains2 = gains.at[jnp.arange(b), chan].set(ratio2)
        if k >= 3:
            trio = jnp.stack([
                jnp.full((b,), 10.0 ** (scale * 0.5)),          # normal
                10.0 ** (scale * (0.5 + 0.5 * r_db[:, 1])),     # large
                10.0 ** (scale * (0.5 * r_db[:, 2])),           # small
            ], axis=1)
            gains3 = gains.at[:, :3].set(trio)
            gains = jnp.where((live == 3)[:, None], gains3, gains)
        gains = jnp.where((live == 2)[:, None], gains2, gains)

    lane = jnp.arange(k)[None, :] < live[:, None]
    gains = gains * lane.astype(gains.dtype)

    sources = wavs * gains[..., None]
    mix = jnp.sum(sources, axis=1)

    # street-noise add: 0.3 x a randomly-circular-shifted noise wav summed
    # into the mixture only (predata_multiAims_noisedB.py:198-222)
    if cfg.add_bgd_noise and noise_bank is not None:
        k_nidx, k_nshift = jax.random.split(k_noise)
        nidx = jax.random.randint(k_nidx, (b,), 0, noise_bank.shape[0])
        nshift = jax.random.randint(k_nshift, (b,), 0, noise_bank.shape[1])
        noise = jax.vmap(lambda w, sh: jnp.roll(w, sh))(
            noise_bank[nidx][:, :n], nshift)
        mix = mix + cfg.bgd_noise_ratio * noise

    return MixtureBatch(mix_wav=mix, source_wavs=sources, spk_idx=spk_idx,
                        gains=gains, utt_idx=utt_idx)


def add_noise_to_mix(key: jax.Array, batch: MixtureBatch,
                     noise_bank: jax.Array, cfg: Config) -> MixtureBatch:
    """Eval-time background-noise add: 0.3x a randomly-circular-shifted
    noise wav summed into the MIXTURE only — the model separates under
    noise while the clean sources stay the scoring references
    (Cocktail predict.py:152-158; the noisedB eval family,
    predata_multiAims_noisedB.py:198-222)."""
    b, n = batch.mix_wav.shape
    k_nidx, k_nshift = jax.random.split(key)
    nidx = jax.random.randint(k_nidx, (b,), 0, noise_bank.shape[0])
    nshift = jax.random.randint(k_nshift, (b,), 0, noise_bank.shape[1])
    noise = jax.vmap(lambda w, sh: jnp.roll(w, sh))(
        noise_bank[nidx][:, :n], nshift)
    return batch._replace(
        mix_wav=batch.mix_wav + cfg.bgd_noise_ratio * noise)


@functools.partial(jax.jit, static_argnames=("cfg",))
def featurize(batch: MixtureBatch, cfg: Config):
    """Batch -> on-device features, mirroring the reference batch-dict keys
    (predata_multiAims.py:229-239): mix magnitude features, mixture complex
    spectrum (packed RI), per-source clean features.
    """
    b, k, n = batch.source_wavs.shape
    if (cfg.use_pallas_stft and not cfg.log_spectral
            and cfg.window == "hann" and cfg.center
            and cfg.frame_length % cfg.frame_shift == 0):
        # the fused kernel bakes the hann/centered convention and hop-row
        # framing (L % hop == 0); other configs take the XLA path below
        from dl4ss_tpu.ops.pallas_stft import pallas_spectral_feature
        mix_feat, mix_ri = pallas_spectral_feature(
            batch.mix_wav, cfg.frame_length, cfg.frame_shift)
        src_feat, src_ri = pallas_spectral_feature(
            batch.source_wavs.reshape(b * k, n),
            cfg.frame_length, cfg.frame_shift)
        src_feat = src_feat.reshape(b, k, *src_feat.shape[1:])
        src_ri = src_ri.reshape(b, k, *src_ri.shape[1:])
    else:
        mix_feat, mix_spec = spectral_feature_cfg(batch.mix_wav, cfg)
        mix_ri = pack_ri(mix_spec)
        src_spec = stft_cfg(batch.source_wavs, cfg)
        src_feat, src_ri = jnp.abs(src_spec), pack_ri(src_spec)
    out = {
        "mix_wav": batch.mix_wav,
        "mix_feas": mix_feat,                       # (B, T, F)
        "mix_ri": mix_ri,                           # (B, T, F, 2)
        "spk_idx": batch.spk_idx,                   # (B, K)
        "channel_live": (batch.gains > 0),          # (B, K)
        "source_wavs": batch.source_wavs,           # (B, K, N)
    }
    if cfg.is_complex_mask:
        out["src_ri"] = src_ri                      # (B, K, T, F, 2)
    out["src_feas"] = src_feat                      # (B, K, T, F)
    return out


def linear_target_mags(feats, batch: MixtureBatch, cfg: Config):
    """(mix_mag, target_mag) for the memory trainer: the mask's multiplicand
    and the loss target are LINEAR spectra even when the network input
    features are log-domain — output = mask (.) mix_spectrum
    (Cocktail nnet.py:95, predict.py:241-245). Target = first speaker
    (the Cocktail first-speaker-is-target convention)."""
    if not cfg.log_spectral:
        return feats["mix_feas"], feats["src_feas"][:, 0]
    from dl4ss_tpu.ops.crm import unpack_ri
    mix_mag = jnp.abs(unpack_ri(feats["mix_ri"]))
    target_mag = jnp.abs(stft_cfg(batch.source_wavs[:, 0], cfg))
    return mix_mag, target_mag


@functools.partial(jax.jit, static_argnames=("cfg",))
def same_speaker_real_specs(key: jax.Array, batch: MixtureBatch,
                            bank: jax.Array, cfg: Config) -> jax.Array:
    """dis-sp "real" pool: for each mixed speaker, the clean magnitude
    spectrogram of a DIFFERENT random utterance of the same speaker
    (predata_fromList_dis.py:37-66, consumed by main_run_sstune_dis_sp).
    Returns (B, K, T, F) for feats["real_specs"].
    """
    b, k = batch.spk_idx.shape
    u = bank.shape[1]
    if batch.utt_idx is not None and u > 1:
        # a DIFFERENT utterance of the same speaker: draw an offset in
        # [1, u-1] so the mixed utterance itself can never be the "real"
        # sample (predata_fromList_dis.py:37-66)
        off = jax.random.randint(key, (b, k), 1, u)
        utt = (batch.utt_idx + off) % u
    else:
        utt = jax.random.randint(key, (b, k), 0, u)
    wavs = normalize_utterance(bank[batch.spk_idx, utt])
    return jnp.abs(stft_cfg(wavs, cfg))
