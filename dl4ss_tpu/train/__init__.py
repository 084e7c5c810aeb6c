"""Training harness: states, jitted steps, schedules, checkpoints, metrics."""

from dl4ss_tpu.train.state import TrainState, create_train_state, make_schedule  # noqa: F401
from dl4ss_tpu.train.steps import (  # noqa: F401
    make_train_step, make_dense_train_step, make_classifier_step,
    make_adversarial_step, make_eval_step)
from dl4ss_tpu.train.metrics import MetricsWriter  # noqa: F401
from dl4ss_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_step  # noqa: F401
from dl4ss_tpu.train.loop import train_loop  # noqa: F401
