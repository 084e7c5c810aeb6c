"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation (the supported way to test
`jax.sharding.Mesh` programs without real chips).

Note: jax is pre-imported at interpreter startup in this image, so env vars
are too late — use config updates, which work as long as no backend has been
initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1)
