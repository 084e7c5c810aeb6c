"""Scan-RNN parity vs torch.nn.LSTM/GRU (CPU reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dl4ss_tpu.ops.rnn import (bidirectional_rnn, gru_init, lstm_init,
                               rnn_init, _run_layer)

B, T, D, H = 3, 11, 7, 5


def _copy_to_torch_cell(params, t_rnn, layer=0, direction=0, cell="lstm"):
    sfx = "_reverse" if direction else ""
    getattr(t_rnn, f"weight_ih_l{layer}{sfx}").data = torch.tensor(
        np.asarray(params["wx"]).T.copy())
    getattr(t_rnn, f"weight_hh_l{layer}{sfx}").data = torch.tensor(
        np.asarray(params["wh"]).T.copy())
    getattr(t_rnn, f"bias_ih_l{layer}{sfx}").data = torch.tensor(
        np.asarray(params["bx"]).copy())
    getattr(t_rnn, f"bias_hh_l{layer}{sfx}").data = torch.tensor(
        np.asarray(params["bh"]).copy())


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_unidirectional_matches_torch(rng, cell):
    key = jax.random.PRNGKey(0)
    init = lstm_init if cell == "lstm" else gru_init
    params = init(key, D, H)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    t_rnn = (torch.nn.LSTM if cell == "lstm" else torch.nn.GRU)(
        D, H, 1, batch_first=True)
    _copy_to_torch_cell(params, t_rnn, cell=cell)
    with torch.no_grad():
        ref, _ = t_rnn(torch.tensor(x))

    ours = _run_layer(params, jnp.asarray(x), cell)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
@pytest.mark.parametrize("layers", [1, 2])
def test_bidirectional_stack_matches_torch(rng, cell, layers):
    key = jax.random.PRNGKey(42)
    stack = rnn_init(key, cell, D, H, layers, bidirectional=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    t_rnn = (torch.nn.LSTM if cell == "lstm" else torch.nn.GRU)(
        D, H, layers, batch_first=True, bidirectional=True)
    for li in range(layers):
        _copy_to_torch_cell(stack[li]["fwd"], t_rnn, li, 0, cell)
        _copy_to_torch_cell(stack[li]["bwd"], t_rnn, li, 1, cell)
    with torch.no_grad():
        ref, _ = t_rnn(torch.tensor(x))

    ours = bidirectional_rnn(stack, jnp.asarray(x), cell)
    assert ours.shape == (B, T, 2 * H)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_remat_matches(rng):
    key = jax.random.PRNGKey(7)
    stack = rnn_init(key, "gru", D, H, 2, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    base = bidirectional_rnn(stack, x, "gru", remat=False)
    rem = bidirectional_rnn(stack, x, "gru", remat=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rem), atol=1e-6)


def test_grad_flows(rng):
    key = jax.random.PRNGKey(3)
    stack = rnn_init(key, "lstm", D, H, 1, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    def loss(p):
        return jnp.sum(bidirectional_rnn(p, x, "lstm") ** 2)

    g = jax.grad(loss)(stack)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
