"""Train state and optimizer/schedule construction.

One pytree carries everything the reference scatters across objects and
files: parameters (the reference's five separately-checkpointed modules,
main_run_multi_selfSS.py:540-543), optimizer state, the non-differentiable
life-long speaker memory (the Keras out-of-graph weight write,
extend_layers.py:220-228), the RNG, and the step counter.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dl4ss_tpu.config import Config
from dl4ss_tpu.models.memory import MemorySlots, init_memory, memory_rows
from dl4ss_tpu.models.separator import init_separator


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    memory: Optional[MemorySlots]
    rng: jax.Array
    # adversarial training carries a second (discriminator) optimizer state
    d_opt_state: Optional[Any] = None


def make_schedule(cfg: Config, steps_per_epoch: int):
    """lr schedules used by the reference entry points:
      constant        — Adam 2e-4 (Torch_multi/main_run.py:443)
      halve_per_epoch — *0.5 each epoch, floor 1e-7 (TestVer:596-600)
      halve_50        — *0.5 every 50 epochs (test_multi_labels_speech.py:405-407)
      cosine          — half-cosine decay over the full cfg.max_epoch horizon
                        to lr_floor (no reference counterpart; a quality
                        lever for the oracle-gap sweep, docs/BENCHMARKS.md)
    """
    base = cfg.learning_rate
    if cfg.lr_schedule == "constant":
        return base
    if cfg.lr_schedule == "cosine":
        total = max(cfg.max_epoch * steps_per_epoch, 1)
        def sched(step):
            frac = jnp.minimum(step / total, 1.0)
            return jnp.maximum(base * 0.5 * (1.0 + jnp.cos(jnp.pi * frac)),
                               cfg.lr_floor)
        return sched
    if cfg.lr_schedule == "halve_per_epoch":
        def sched(step):
            epoch = step // steps_per_epoch
            return jnp.maximum(base * (0.5 ** epoch), cfg.lr_floor)
        return sched
    if cfg.lr_schedule == "halve_50":
        def sched(step):
            return base * (0.5 ** (step // (50 * steps_per_epoch)))
        return sched
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: Config, steps_per_epoch: int = 1):
    sched = make_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "nadam":
        # the Keras stack's Nadam(clipnorm=200) (nnet.py:23)
        opt = optax.nadam(sched)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt


def create_train_state(key: jax.Array, cfg: Config,
                       num_frames: Optional[int] = None,
                       steps_per_epoch: int = 1,
                       with_memory: bool = False) -> TrainState:
    k_model, k_rng = jax.random.split(key)
    params = init_separator(k_model, cfg, num_frames)
    opt = make_optimizer(cfg, steps_per_epoch)
    gen_params = {k: v for k, v in params.items() if k != "discriminator"}
    opt_state = opt.init(gen_params)
    d_opt_state = None
    if cfg.use_discriminator:
        d_opt_state = make_optimizer(cfg, steps_per_epoch).init(
            params["discriminator"])
    memory = (init_memory(memory_rows(cfg), cfg.query_dim)
              if with_memory else None)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, memory=memory, rng=k_rng,
                      d_opt_state=d_opt_state)
