"""Model component shape/behavior contracts (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu import preset
from dl4ss_tpu.models import (apply_adjust, apply_classifier,
                              apply_discriminator, apply_embedding,
                              apply_embedding_gated, apply_encoder,
                              apply_image_query, apply_mask_head,
                              apply_speech_query, apply_video_query,
                              classify_speakers, init_adjust, init_classifier,
                              init_discriminator, init_embedding,
                              init_encoder, init_image_query, init_memory,
                              init_mask_head, init_separator,
                              init_speech_query, init_video_query,
                              masked_mean_pool, memory_read, memory_write,
                              separate)
from dl4ss_tpu.models.separator import recursive_separate, separate_dense

CFG = preset("synth_tiny")
B, T, F = 2, 37, CFG.freq_bins
KEY = jax.random.PRNGKey(0)


def _feat(rng):
    return jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))


def test_encoder_shapes(rng):
    p = init_encoder(KEY, CFG)
    emb, hidden = apply_encoder(p, _feat(rng), CFG)
    assert emb.shape == (B, T, F, CFG.embedding_size)
    assert hidden.shape == (B, T, 2 * CFG.hidden_units)
    assert np.abs(np.asarray(emb)).max() <= 1.0  # tanh bounded


def test_classifier_probs(rng):
    p = init_classifier(KEY, CFG)
    probs = apply_classifier(p, _feat(rng), CFG)
    assert probs.shape == (B, CFG.num_speakers)
    assert (np.asarray(probs) > 0).all() and (np.asarray(probs) < 1).all()


def test_embedding_gather_and_gated():
    p = init_embedding(KEY, CFG)
    idx = jnp.array([[0, 3], [1, 2]])
    e = apply_embedding(p, idx)
    assert e.shape == (2, 2, CFG.query_dim)
    np.testing.assert_allclose(np.asarray(e[0, 1]),
                               np.asarray(p["table"][3]))
    gate = jnp.zeros((2, CFG.num_speakers)).at[0, 3].set(1.0)
    g = apply_embedding_gated(p, gate)
    assert g.shape == (2, CFG.num_speakers, CFG.query_dim)
    np.testing.assert_allclose(np.asarray(g[0, 3]), np.asarray(p["table"][3]))
    assert np.abs(np.asarray(g[0, 1])).max() == 0.0  # gated off -> zero
    assert np.abs(np.asarray(g[1])).max() == 0.0


@pytest.mark.parametrize("head", ["dot", "align"])
@pytest.mark.parametrize("complex_mask", [False, True])
def test_mask_head_modes(rng, head, complex_mask):
    cfg = CFG.replace(mask_head=head, is_complex_mask=complex_mask)
    p = init_mask_head(KEY, cfg)
    emb_map = jnp.asarray(
        rng.standard_normal((B, T, F, cfg.embedding_size)).astype(np.float32))
    q = jnp.asarray(
        rng.standard_normal((B, 2, cfg.query_dim)).astype(np.float32))
    m = apply_mask_head(p, emb_map, q, cfg)
    if complex_mask:
        assert m.shape == (B, 2, T, F, 2)
        assert np.abs(np.asarray(m)).max() <= cfg.crm_k  # K*tanh bounded
    else:
        assert m.shape == (B, 2, T, F)
        assert (np.asarray(m) >= 0).all() and (np.asarray(m) <= 1).all()


def test_dot_head_matches_manual(rng):
    """sigmoid(<emb_map, query>) — the reference's baddbmm formulation."""
    cfg = CFG.replace(mask_head="dot")
    emb_map = rng.standard_normal((B, T, F, cfg.embedding_size)).astype(np.float32)
    q = rng.standard_normal((B, 2, cfg.embedding_size)).astype(np.float32)
    m = apply_mask_head({}, jnp.asarray(emb_map), jnp.asarray(q), cfg)
    manual = 1.0 / (1.0 + np.exp(-np.einsum("btfe,bke->bktf", emb_map, q)))
    np.testing.assert_allclose(np.asarray(m), manual, atol=1e-5)


def test_adjust_residual(rng):
    p = init_adjust(KEY, CFG)
    hidden = jnp.asarray(
        rng.standard_normal((B, T, 2 * CFG.hidden_units)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, 2, CFG.query_dim)).astype(np.float32))
    out = apply_adjust(p, hidden, q)
    assert out.shape == q.shape
    # zero weights -> identity (residual form)
    p0 = jax.tree_util.tree_map(jnp.zeros_like, p)
    np.testing.assert_allclose(np.asarray(apply_adjust(p0, hidden, q)),
                               np.asarray(q))


def test_discriminator_reference_flatten():
    """At the reference workload shape the conv stack flattens to 36480 —
    the hard-coded Linear(36480,1) (TestVer:341)."""
    cfg = preset("torch_multi")
    p = init_discriminator(jax.random.PRNGKey(1), cfg, num_frames=313)
    assert p["out"]["w"].shape[0] == 36480
    specs = jnp.ones((1, 2, 313, 129))
    score = apply_discriminator(p, specs, cfg)
    assert score.shape == (2, 1)
    assert (np.asarray(score) > 0).all() and (np.asarray(score) < 1).all()


def test_memory_write_read():
    mem = init_memory(5, 8)
    vec = jnp.ones((2, 8))
    idx = jnp.array([1, 3])
    mem2 = memory_write(mem, idx, vec)
    out = memory_read(mem2, idx)
    # rows are unit-norm after keras-mode write
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)
    assert int(mem2.age[1, 0]) == 1 and int(mem2.age[0, 0]) == 0
    # untouched rows stay zero
    assert np.abs(np.asarray(mem2.vectors[0])).max() == 0.0
    # second write accumulates and stays unit-norm
    mem3 = memory_write(mem2, idx, -vec)
    assert int(mem3.age[1, 0]) == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(memory_read(mem3, idx)), axis=-1),
        1.0, atol=1e-5)


def test_memory_torch_mode():
    mem = init_memory(4, 6)
    vec = jnp.arange(6, dtype=jnp.float32)[None, :]
    mem2 = memory_write(mem, jnp.array([2]), vec, mode="torch")
    got = np.asarray(memory_read(mem2, jnp.array([2])))
    want = np.arange(6) / np.linalg.norm(np.arange(6))
    np.testing.assert_allclose(got, want[None], atol=1e-6)


def test_query_encoders(rng):
    sq = init_speech_query(KEY, CFG)
    v = apply_speech_query(sq, _feat(rng))
    assert v.shape == (B, 2 * max(CFG.embedding_size // 2, 1))

    iq = init_image_query(KEY, CFG)
    img = jnp.asarray(rng.standard_normal((B, 28, 28, 1)).astype(np.float32))
    assert apply_image_query(iq, img).shape == (B, CFG.embedding_size)

    vq = init_video_query(KEY, CFG, frame_hw=(48, 48))
    frames = jnp.asarray(
        rng.standard_normal((B, 3, 48, 48, 3)).astype(np.float32))
    logits, q = apply_video_query(vq, frames)
    assert logits.shape == (B, CFG.num_speakers)
    assert q.shape == (B, CFG.embedding_size)


def test_masked_mean_pool():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    mask = jnp.array([[1, 1, 0, 0]])
    out = masked_mean_pool(x, mask)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray((x[0, 0] + x[0, 1]) / 2))


def test_separator_topk_and_dense(rng):
    p = init_separator(KEY, CFG, num_frames=T)
    feat = jnp.abs(_feat(rng))
    idx = jnp.array([[0, 1], [2, 3]])
    out = separate(p, feat, CFG, spk_idx=idx)
    assert out.masks.shape == (B, 2, T, F)
    assert out.pred.shape == (B, 2, T, F)
    assert out.probs.shape == (B, CFG.num_speakers)
    # pred = mask * mixture
    np.testing.assert_allclose(
        np.asarray(out.pred),
        np.asarray(out.masks) * np.asarray(feat)[:, None], atol=1e-6)

    gate = jnp.zeros((B, CFG.num_speakers)).at[:, :2].set(1.0)
    dense = separate_dense(p, feat, CFG, gate)
    assert dense.masks.shape == (B, CFG.num_speakers, T, F)
    assert np.abs(np.asarray(dense.pred[:, 3:])).max() == 0.0


def test_separator_crm(rng):
    cfg = CFG.replace(is_complex_mask=True)
    p = init_separator(KEY, cfg, num_frames=T)
    feat = jnp.abs(_feat(rng))
    mix_ri = jnp.asarray(rng.standard_normal((B, T, F, 2)).astype(np.float32))
    out = separate(p, feat, cfg, spk_idx=jnp.array([[0, 1], [2, 3]]),
                   mix_ri=mix_ri)
    assert out.masks.shape == (B, 2, T, F, 2)
    assert out.pred.shape == (B, 2, T, F, 2)
    assert np.isfinite(np.asarray(out.pred)).all()


def test_recursive_separate(rng):
    cfg = CFG.replace(batch_size=1, recursive_max_steps=2)
    p = init_separator(KEY, cfg, num_frames=T)
    feat = jnp.abs(_feat(rng))
    extracted, spks = recursive_separate(p, feat, cfg)
    assert extracted.shape == (B, 2, T, F)
    assert spks.shape == (B, 2)
    # the two steps must extract different speakers
    assert (np.asarray(spks[:, 0]) != np.asarray(spks[:, 1])).all()


def test_recursive_separate_candidate_roster(rng):
    """`allowed` restricts every peel step to the aim_pro candidate pool
    (predata_multiSpeechTest.py:89-115) on top of the loop's own
    already-extracted exclusion."""
    cfg = CFG.replace(batch_size=1, recursive_max_steps=2)
    p = init_separator(KEY, cfg, num_frames=T)
    feat = jnp.abs(_feat(rng))
    allowed = np.zeros((B, cfg.num_speakers), bool)
    roster = [1, 3, 5]
    allowed[:, roster] = True
    _, spks = recursive_separate(p, feat, cfg, allowed=jnp.asarray(allowed))
    spks = np.asarray(spks)
    assert np.isin(spks, roster).all()               # never leaves the pool
    assert (spks[:, 0] != spks[:, 1]).all()          # exclusion still holds


def test_separator_jit_and_grads(rng):
    p = init_separator(KEY, CFG, num_frames=T)
    feat = jnp.abs(_feat(rng))
    idx = jnp.array([[0, 1], [2, 3]])
    target = jnp.abs(_feat(rng))[:, None] * jnp.ones((1, 2, 1, 1))

    @jax.jit
    def loss_fn(p):
        out = separate(p, feat, CFG, spk_idx=idx)
        return jnp.mean((out.pred - target) ** 2)

    g = jax.grad(loss_fn)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder + embedding + classifier all receive gradient
    assert np.abs(np.asarray(g["embedding"]["table"])).max() > 0
    assert np.abs(np.asarray(g["encoder"]["proj"]["w"])).max() > 0


def test_separator_bf16_close_to_f32(rng):
    """The bf16 inference path (bench throughput config) stays within
    bf16-expected tolerance of f32."""
    p = init_separator(KEY, CFG, num_frames=T)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    feat = jnp.abs(_feat(rng))
    idx = jnp.array([[0, 1], [2, 3]])
    ref = separate(p, feat, CFG, spk_idx=idx)
    out = separate(p16, feat.astype(jnp.bfloat16), CFG, spk_idx=idx)
    m16 = np.asarray(out.masks, dtype=np.float32)
    np.testing.assert_allclose(m16, np.asarray(ref.masks), atol=0.05)
    assert np.abs(m16 - np.asarray(ref.masks)).mean() < 0.01
