"""Utilities: profiling, determinism, timing."""

from dl4ss_tpu.utils.profiling import profile_trace, StepTimer  # noqa: F401
from dl4ss_tpu.utils.determinism import seed_everything  # noqa: F401
