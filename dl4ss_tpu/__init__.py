"""dl4ss_tpu — a TPU-native speech-separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of shincling/DL4SS
(the cocktail-party stack: speaker-conditioned masking, multi-speaker
self-separation, top-down auditory attention with recursive extraction,
complex-ratio-mask phase-aware separation, adversarial refinement, life-long
speaker memory, and image/video query conditioning).

Unlike the reference — Python-2 research scripts doing CPU librosa STFTs that
feed a single GPU — every stage here (mixture synthesis, STFT, the BLSTM/BiGRU
mask estimators, PIT/cRM losses, iSTFT resynthesis, SI-SDR scoring) runs inside
one jitted XLA program on TPU, data-parallel over a `jax.sharding.Mesh`.

Package layout (see SURVEY.md for the reference blueprint):
  ops/         device DSP + RNN primitives (STFT, iSTFT, cRM, scan LSTM/GRU,
               Pallas kernels)
  models/      flax.linen modules (encoder, classifier, mask heads, memory, …)
  objectives/  losses, PIT, top-k selection, dedup
  data/        mixture synthesis (on-device + host loaders, wsj0-2mix lists)
  parallel/    mesh + sharding policy
  train/       train states, jitted steps, loop, checkpointing, metrics
  eval/        SI-SDR, BSS-Eval, classifier metrics, wav export
  run/         CLI entry points mirroring the reference's main_run* semantics
"""

__version__ = "0.1.0"

from dl4ss_tpu.config import Config, preset, preset_names  # noqa: F401
