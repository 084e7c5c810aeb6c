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

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from dl4ss_tpu.config import Config
from dl4ss_tpu.train.state import TrainState


def _manager(directory) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True))


def save_checkpoint(directory, state: TrainState, step: Optional[int] = None,
                    cfg: Optional[Config] = None) -> int:
    step = int(state.step) if step is None else int(step)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if cfg is not None:
        # record the training config beside the checkpoints so evaluators
        # can rebuild the exact state shapes (speaker count above all)
        with open(os.path.join(directory, "cfg.json"), "w") as f:
            f.write(cfg.to_json())
    return step


def load_cfg(directory) -> Optional[Config]:
    """The Config the checkpoints in `directory` were trained with, if the
    trainer recorded one (save_checkpoint(cfg=...)). Keys the current
    Config no longer defines are dropped so old sidecars keep restoring
    across config-schema changes."""
    import dataclasses
    path = os.path.join(directory, "cfg.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in raw.items() if k in known})


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


def init_params_from(state: TrainState, directory,
                     step: Optional[int] = None) -> TrainState:
    """Warm start: graft the WHOLE params tree from a donor checkpoint,
    keeping fresh optimizer state — the reference's fine-tune pattern of
    loading a prior run's weights into a newly-built trainer
    (TDAA_beta/main_run_sstune.py `load_state_dict` before a fresh
    optimizer). Use when the objective/schedule changes (e.g. spectral-MSE
    pretrain -> loss_mode='si_sdr' fine-tune), where `--resume` would be
    wrong: the optimizer state tree no longer matches.
    """
    mgr = _manager(directory)
    use = mgr.latest_step() if step is None else step
    # no template: the donor run may carry a different optimizer tree;
    # only its params are read, and they must match shape-for-shape
    raw = mgr.restore(use)
    mgr.close()
    donor = raw["params"] if isinstance(raw, dict) else raw.params
    want = jax.tree_util.tree_map(lambda x: x.shape, state.params)
    got = jax.tree_util.tree_map(lambda x: x.shape, donor)
    if want != got:
        raise ValueError(
            f"params from {directory!r} do not match the model being "
            f"trained: expected {want}, got {got}")
    params = jax.tree_util.tree_map(
        lambda cur, d: jax.numpy.asarray(d, cur.dtype), state.params, donor)
    return state._replace(params=params)


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
        mgr = _manager(directory)
        use = mgr.latest_step() if step is None else step
        # restore WITHOUT a template: the donor checkpoint may come from a
        # different config (other component shapes, other optimizer state),
        # so only the requested params subtree is read and validated here
        raw = mgr.restore(use)
        mgr.close()
        donor_params = raw["params"] if isinstance(raw, dict) else raw.params
        if component not in donor_params:
            raise KeyError(
                f"checkpoint {directory!r} has no component {component!r}; "
                f"available: {sorted(donor_params)}")
        donor = donor_params[component]
        want = jax.tree_util.tree_map(lambda x: x.shape,
                                      state.params[component])
        got = jax.tree_util.tree_map(lambda x: x.shape, donor)
        if want != got:
            raise ValueError(
                f"component {component!r} from {directory!r} has shapes "
                f"{got}, expected {want}")
        params[component] = jax.tree_util.tree_map(
            lambda cur, d: jax.numpy.asarray(d, cur.dtype),
            state.params[component], donor)
    return state._replace(params=params)
