"""Evaluation: SI-SDR, BSS-Eval, classifier metrics, wav export."""

from dl4ss_tpu.eval.sisdr import si_sdr, si_sdr_pit, sdr_simple  # noqa: F401
from dl4ss_tpu.eval.bss_eval import bss_eval_sources, bss_eval_sources_numpy, nsdr  # noqa: F401
from dl4ss_tpu.eval.classifier_metrics import (  # noqa: F401
    multilabel_accuracy, topk_recall, multilabel_prf)
from dl4ss_tpu.eval.wav_export import export_batch_outputs  # noqa: F401
