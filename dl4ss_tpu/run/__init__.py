"""CLI entry points.

The reference's 18 `main_run*.py` forks (SURVEY.md §2, A17-A27/B9-B16) reduce
to four commands over presets:

  python -m dl4ss_tpu.run.train     — joint / adversarial / classifier training
  python -m dl4ss_tpu.run.evaluate  — SI-SDR + BSS-Eval over a split (+ wavs)
  python -m dl4ss_tpu.run.separate  — separate mixture wav(s): top-k or
                                      recursive peel (the A23/B15 loop)
  python -m dl4ss_tpu.run.classify  — train/evaluate the speaker classifier
"""

from dl4ss_tpu.run.common import add_common_args, build_cfg, load_bank  # noqa: F401
