"""Orbax checkpointing of the single train-state pytree.

Replaces the reference's per-component `torch.save(state_dict)` zoo under
`params/param_<tag>_<component>_<epoch>` (main_run_multi_selfSS.py:540-543,
TestVer:702-715) and the Keras monolithic HDF5 save (nnet.py:159-172): the
whole TrainState (params + optimizer + speaker memory + rng + step) is one
versioned checkpoint, so resume is exact — including the non-trainable
life-long memory, which the Keras stack also persists as a layer weight
(extend_layers.py:144-145).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from dl4ss_tpu.train.state import TrainState


def _manager(directory) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True))


def save_checkpoint(directory, state: TrainState, step: Optional[int] = None
                    ) -> int:
    step = int(state.step) if step is None else int(step)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return step


def latest_step(directory) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory, template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore into the structure of `template` (an abstract or concrete
    TrainState built by create_train_state with the same config)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      template)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


def load_components(state: TrainState, sources: dict,
                    step: Optional[int] = None) -> TrainState:
    """Checkpoint-zoo composition: graft individual model components from
    (possibly different) checkpoints into `state`.

    The reference hand-assembles eval models from separately-saved component
    files, filtering mismatched keys (`class_dict.pop` for cnn keys,
    TDAA_beta/main_run_sstune_TestVer.py:557-579). Here:

        state = load_components(state, {"classifier": "ck_cls",
                                        "encoder": "ck_dis_sp"})

    loads each named param subtree from its checkpoint's TrainState, leaving
    everything else (optimizer state included) untouched.
    """
    params = dict(state.params)
    for component, directory in sources.items():
        donor = restore_checkpoint(directory, state, step)
        params[component] = donor.params[component]
    return state._replace(params=params)
