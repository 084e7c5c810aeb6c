"""Losses / PIT / selection contracts, incl. torch parity for the classifier loss."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dl4ss_tpu.objectives import (complex_mse_loss, cosine_dedup_select,
                                  gan_d_loss, gan_g_loss, mask_mse_loss,
                                  multilabel_softmargin_loss, pit_loss,
                                  pit_permute, sum_to_one_loss, top_k_indices,
                                  top_k_mask)
from dl4ss_tpu.ops.crm import crm_compress, crm_uncompress


def test_multilabel_softmargin_matches_torch(rng):
    logits = rng.standard_normal((4, 7)).astype(np.float32)
    targets = (rng.random((4, 7)) > 0.5).astype(np.float32)
    ref = torch.nn.MultiLabelSoftMarginLoss()(
        torch.tensor(logits), torch.tensor(targets)).item()
    ours = float(multilabel_softmargin_loss(jnp.asarray(logits),
                                            jnp.asarray(targets)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_mask_mse_channel_weights(rng):
    pred = jnp.asarray(rng.standard_normal((2, 3, 5, 4)).astype(np.float32))
    target = jnp.zeros_like(pred)
    w = jnp.array([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
    full = mask_mse_loss(pred, target)
    weighted = mask_mse_loss(pred, target, w)
    assert float(weighted) < float(full)
    manual = np.mean((np.asarray(pred) ** 2) *
                     np.asarray(w)[..., None, None])
    np.testing.assert_allclose(float(weighted), manual, rtol=1e-6)


def test_sum_to_one():
    pred = jnp.full((2, 4, 3, 3), 0.25)
    np.testing.assert_allclose(float(sum_to_one_loss(pred)), 0.0, atol=1e-7)


def test_complex_mse(rng):
    pred = jnp.asarray(rng.standard_normal((2, 2, 5, 4, 2)).astype(np.float32))
    tgt = jnp.zeros_like(pred)
    want = float(jnp.mean(pred[..., 0] ** 2) + jnp.mean(pred[..., 1] ** 2))
    np.testing.assert_allclose(float(complex_mse_loss(pred, tgt)), want,
                               rtol=1e-6)


def test_gan_losses():
    real = jnp.array([1.0, 1.0])
    fake = jnp.array([0.0, 0.0])
    assert float(gan_d_loss(real, fake)) == 0.0
    assert float(gan_g_loss(fake)) == 1.0


def test_pit_finds_best_permutation(rng):
    target = jnp.asarray(rng.standard_normal((3, 2, 6, 5)).astype(np.float32))
    pred = target[:, ::-1]  # swapped channels
    loss, perm = pit_loss(pred, target)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(perm),
                                  np.tile([1, 0], (3, 1)))
    aligned = pit_permute(target, perm)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(pred))


def test_pit_mixed_batch(rng):
    t = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    pred = jnp.stack([t[0][jnp.array([2, 0, 1])], t[1]])
    loss, perm = pit_loss(pred, t)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(perm[0]), [2, 0, 1])
    np.testing.assert_array_equal(np.asarray(perm[1]), [0, 1, 2])


def test_top_k_mask_matches_reference_loop():
    """Rank-based gate == the reference's per-row Python loop
    (Torch_multi/main_run.py:340-355)."""
    probs = np.array([[0.9, 0.6, 0.4, 0.1],
                      [0.3, 0.2, 0.1, 0.05],
                      [0.9, 0.9, 0.9, 0.9]], np.float32)

    def ref_loop(p, alpha, top_k):
        out = np.zeros_like(p)
        for r in range(p.shape[0]):
            order = np.argsort(-p[r], kind="stable")[:top_k]
            n = int((np.sort(p[r])[::-1] > alpha).sum())
            for i in order[:n]:
                out[r, i] = 1
        return out

    for alpha, k in [(0.5, 2), (0.5, 3), (0.05, 2), (0.95, 2)]:
        ours = np.asarray(top_k_mask(jnp.asarray(probs), alpha, k))
        np.testing.assert_array_equal(ours, ref_loop(probs, alpha, k),
                                      err_msg=f"alpha={alpha} k={k}")


def test_top_k_indices():
    probs = jnp.array([[0.1, 0.8, 0.3, 0.6]])
    idx, vals = top_k_indices(probs, 2)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 3]])


def test_cosine_dedup_select():
    # speakers 0 and 1 have (nearly) identical embeddings; 2 is orthogonal
    emb = jnp.array([[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [0.5, 0.5]])
    probs = jnp.array([[0.9, 0.8, 0.7, 0.1]])
    picked = np.asarray(cosine_dedup_select(probs, emb, alpha=0.15, top_k=2))
    # 1 is a duplicate of 0 -> must pick 0 then 2
    np.testing.assert_array_equal(sorted(picked[0].tolist()), [0, 2])


def test_cosine_dedup_fallback():
    # all candidates identical: fallback picks the farthest from top-1
    emb = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.9, 0.1], [0.0, 1.0]])
    probs = jnp.array([[0.9, 0.8, 0.7, 0.01]])
    picked = np.asarray(cosine_dedup_select(probs, emb, alpha=0.9, top_k=2))
    assert picked[0, 0] == 0 and picked[0, 1] == 3


def test_candidate_pools_and_restricted_select():
    """aim_pro protocol (predata_multiSpeechTest.py:89-115): pools contain
    every live true speaker plus distractors up to N; restricted top-k never
    leaves the pool and prefers in-pool high-prob speakers."""
    import jax
    from dl4ss_tpu.objectives.select import (candidate_pools,
                                             candidate_restricted_select)
    spk = jnp.array([[0, 1], [2, 3]])
    live = jnp.array([[1.0, 1.0], [1.0, 0.0]])
    pools = np.asarray(candidate_pools(jax.random.PRNGKey(0), spk, live,
                                       n_candidates=4, num_speakers=10))
    assert pools.shape == (2, 10)
    assert pools[0, 0] and pools[0, 1]          # true speakers always in
    assert pools[1, 2] and not pools[1, 3]      # dead channel is NOT forced
    np.testing.assert_array_equal(pools.sum(axis=1), [4, 4])
    # selection: probs favor an out-of-pool speaker -> it cannot be picked
    probs = np.full((2, 10), 0.01, np.float32)
    out_of_pool = int(np.flatnonzero(~pools[0])[0])
    probs[0, out_of_pool] = 0.99
    probs[0, 0] = 0.5
    probs[0, 1] = 0.4
    sel = np.asarray(candidate_restricted_select(jnp.asarray(probs),
                                                 jnp.asarray(pools), 2))
    assert out_of_pool not in sel[0].tolist()
    np.testing.assert_array_equal(sorted(sel[0].tolist()), [0, 1])
    for b in range(2):
        assert all(pools[b, s] for s in sel[b].tolist())


def test_crm_roundtrip(rng):
    x = jnp.asarray(5.0 * rng.standard_normal((4, 4)).astype(np.float32))
    rt = crm_uncompress(crm_compress(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), rtol=1e-3,
                               atol=1e-3)
    # compressed range is bounded by K
    assert np.abs(np.asarray(crm_compress(100.0 * x))).max() <= 10.0
