"""Inception-v3 parity vs torchvision (random weights ported both ways)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu.models.inception import (apply_inception_v3, init_inception_v3,
                                        load_torch_state_dict)

def test_inception_matches_torchvision(rng):
    torchvision = pytest.importorskip("torchvision")
    import torch
    t_model = torchvision.models.inception_v3(weights=None, aux_logits=True,
                                              init_weights=False)
    t_model.eval()
    params = load_torch_state_dict(t_model.state_dict())
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_logits = t_model(torch.tensor(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    logits, aux, hidden = apply_inception_v3(params, jnp.asarray(x))
    assert hidden.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-3,
                               rtol=1e-3)


def test_inception_shapes_random_init(rng):
    params = init_inception_v3(jax.random.PRNGKey(0), num_classes=10)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    logits, aux, hidden = apply_inception_v3(params, x, aux=True)
    assert logits.shape == (1, 10)
    assert aux.shape == (1, 10)
    assert hidden.shape == (1, 2048)
    assert np.isfinite(np.asarray(logits)).all()
