"""Matmul-DFT overlap-save correlation vs direct numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from dl4ss_tpu.ops.xcorr import xcorr


def _direct(a, b, lo, hi):
    ka, na = a.shape
    kb, nb = b.shape
    out = np.zeros((kb, ka, hi - lo + 1))
    for bi in range(kb):
        for ai in range(ka):
            for li, l in enumerate(range(lo, hi + 1)):
                u0, u1 = max(0, -l), min(na, nb - l)
                if u1 > u0:
                    out[bi, ai, li] = np.dot(a[ai, u0:u1], b[bi, u0 + l:u1 + l])
    return out


@pytest.mark.parametrize("lo,hi", [(0, 63), (-63, 63), (-127, 0), (-5, 200)])
def test_xcorr_matches_direct(rng, lo, hi):
    a = rng.standard_normal((2, 700)).astype(np.float32)
    b = rng.standard_normal((3, 700)).astype(np.float32)
    got = np.asarray(xcorr(jnp.asarray(a), jnp.asarray(b), lo, hi))
    want = _direct(a, b, lo, hi)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_xcorr_unequal_lengths(rng):
    a = rng.standard_normal((1, 500)).astype(np.float32)
    b = rng.standard_normal((1, 900)).astype(np.float32)
    got = np.asarray(xcorr(jnp.asarray(a), jnp.asarray(b), -10, 10))
    want = _direct(a, b, -10, 10)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_xcorr_long_signal_many_chunks(rng):
    a = rng.standard_normal((1, 9000)).astype(np.float32)
    got = np.asarray(xcorr(jnp.asarray(a), jnp.asarray(a), -100, 100))
    want = _direct(a, a, -100, 100)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)
    # zero-lag equals the energy
    np.testing.assert_allclose(got[0, 0, 100], np.sum(a * a), rtol=1e-5)
