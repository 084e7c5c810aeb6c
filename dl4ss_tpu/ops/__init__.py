"""Device DSP + RNN primitives (JAX/XLA with Pallas fast paths)."""

from dl4ss_tpu.ops.windows import get_window, sine_window, sqrt_hann_window, hann_window  # noqa: F401
from dl4ss_tpu.ops.stft import stft, istft, frame_signal, overlap_add, magnitude_and_phase, masked_resynthesis  # noqa: F401
from dl4ss_tpu.ops.crm import crm_compress, crm_uncompress, complex_mask_apply, pack_ri, unpack_ri  # noqa: F401
from dl4ss_tpu.ops.rnn import lstm_init, gru_init, bidirectional_rnn, rnn_init  # noqa: F401
from dl4ss_tpu.ops.xcorr import xcorr, ola_conv  # noqa: F401
from dl4ss_tpu.ops.pallas_stft import (  # noqa: F401
    pallas_stft, pallas_stft_ri, pallas_istft, pallas_istft_ri,
    pallas_spectral_feature, pallas_stft_features, pallas_masked_istft)
from dl4ss_tpu.ops.pallas_rnn import pallas_gru_scan, pallas_lstm_scan  # noqa: F401
