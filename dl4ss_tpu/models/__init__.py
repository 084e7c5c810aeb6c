"""Model components (pure-functional: explicit param pytrees + apply fns).

Rebuilds the reference's inline-in-every-script model classes
(Torch_multi/main_run.py:67-356, TDAA_beta/main_run_sstune_TestVer.py:89-412,
Cocktail/.../nnet.py + extend_layers.py) as one shared library. Parameters are
plain nested dicts so sharding rules, optax, orbax, and Pallas kernel swaps
all operate on transparent pytrees.
"""

from dl4ss_tpu.models.encoder import init_encoder, apply_encoder  # noqa: F401
from dl4ss_tpu.models.classifier import init_classifier, apply_classifier  # noqa: F401
from dl4ss_tpu.models.embedding import init_embedding, apply_embedding, apply_embedding_gated  # noqa: F401
from dl4ss_tpu.models.attention import init_mask_head, apply_mask_head  # noqa: F401
from dl4ss_tpu.models.adjust import init_adjust, apply_adjust  # noqa: F401
from dl4ss_tpu.models.discriminator import init_discriminator, apply_discriminator  # noqa: F401
from dl4ss_tpu.models.memory import (  # noqa: F401
    init_memory, memory_write, memory_read, memory_write_slot, MemorySlots)
from dl4ss_tpu.models.query import (  # noqa: F401
    init_image_query, apply_image_query, init_speech_query, apply_speech_query,
    init_video_query, apply_video_query, masked_mean_pool)
from dl4ss_tpu.models.separator import (  # noqa: F401
    init_separator, separate, classify_speakers, SeparatorOutput)
