"""Streaming sampler, checkpoint-zoo composition, multi-host sharding."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dl4ss_tpu import preset
from dl4ss_tpu.data import device_prefetch, write_wav
from dl4ss_tpu.data.dirtree import StreamingTreeSampler
from dl4ss_tpu.parallel import make_mesh
from dl4ss_tpu.parallel.multihost import (global_batch_from_host_shards,
                                          host_shard_list, host_shard_range)
from dl4ss_tpu.train import (create_train_state, make_train_step,
                             save_checkpoint)
from dl4ss_tpu.train.checkpoint import load_components

CFG = preset("synth_tiny")


def test_streaming_sampler(tmp_path, rng):
    cfg = CFG.replace(max_len_seconds=0.25)
    for spk in ["a", "b", "c"]:
        d = tmp_path / "train" / spk
        os.makedirs(d)
        for u in range(2):
            write_wav(d / f"{u}.wav",
                      0.3 * rng.standard_normal(1800).astype(np.float32), 8000)
    s = StreamingTreeSampler(tmp_path, cfg, "train", seed=3)
    batches = list(s.batches(batch_size=2, num_batches=3))
    assert len(batches) == 3
    b = batches[0]
    assert b["mix_wav"].shape == (2, cfg.max_len)
    np.testing.assert_allclose(b["mix_wav"], b["source_wavs"].sum(1),
                               atol=1e-5)
    # speakers distinct per item
    assert all(len(set(row)) == 2 for row in b["spk_idx"])
    # prefetch wrapper round-trips
    staged = list(device_prefetch(s.batches(2, 2), depth=2))
    assert len(staged) == 2
    assert isinstance(staged[0]["mix_wav"], jax.Array)


def test_checkpoint_zoo_composition(tmp_path):
    s1 = create_train_state(jax.random.PRNGKey(0), CFG)
    s2 = create_train_state(jax.random.PRNGKey(42), CFG)
    save_checkpoint(tmp_path / "ck1", s1)
    # graft s1's classifier into s2, keep s2's encoder
    merged = load_components(s2, {"classifier": tmp_path / "ck1"})
    np.testing.assert_array_equal(
        np.asarray(merged.params["classifier"]["out"]["w"]),
        np.asarray(s1.params["classifier"]["out"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(merged.params["encoder"]["proj"]["w"]),
        np.asarray(s2.params["encoder"]["proj"]["w"]))
    # the composed state still trains
    step = make_train_step(CFG)
    from dl4ss_tpu.data import featurize, make_synthetic_bank, sample_mixtures
    bank = jnp.asarray(make_synthetic_bank(0, CFG.num_speakers, 2,
                                           CFG.max_len))
    feats = featurize(sample_mixtures(jax.random.PRNGKey(1), bank, CFG), CFG)
    merged, m = step(merged, feats)
    assert np.isfinite(float(m["loss"]))


def test_host_shard_math():
    assert host_shard_range(10, 0, 4) == (0, 3)
    assert host_shard_range(10, 1, 4) == (3, 6)
    assert host_shard_range(10, 2, 4) == (6, 8)
    assert host_shard_range(10, 3, 4) == (8, 10)
    items = list(range(10))
    got = [host_shard_list(items, p, 4) for p in range(4)]
    assert sum(got, []) == items
    # single-process (this test env) covers everything
    assert host_shard_list(items) == items


def test_global_batch_assembly():
    mesh = make_mesh(dp=8, mp=1)
    local = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = global_batch_from_host_shards(local, mesh)
    assert out["x"].shape == (16, 2)  # single host: global == local
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
