"""Data pipeline: host-side decode/lists, device-side synthesis + features."""

from dl4ss_tpu.data.wavio import read_wav, write_wav  # noqa: F401
from dl4ss_tpu.data.resample import resample_poly_kaiser  # noqa: F401
from dl4ss_tpu.data.synth import (  # noqa: F401
    MixtureBatch, make_synthetic_bank, normalize_utterance, sample_mixtures,
    featurize)
from dl4ss_tpu.data.wsj0mix import parse_mix_list, Wsj0MixEntry  # noqa: F401
from dl4ss_tpu.data.dirtree import (  # noqa: F401
    scan_speaker_tree, DirTreeSampler, StreamingTreeSampler)
from dl4ss_tpu.data.listsampler import Wsj0MixSampler, mix_from_list  # noqa: F401
from dl4ss_tpu.data.loader import device_prefetch  # noqa: F401
