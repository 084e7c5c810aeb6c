"""Native C++ loader vs the numpy/scipy host path."""

import numpy as np
import pytest
import scipy.signal

from dl4ss_tpu import native
from dl4ss_tpu.data.resample import resample_poly_kaiser
from dl4ss_tpu.data.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"no native build: {native.build_error()}")


def test_decode_matches_numpy(tmp_path, rng):
    x = (0.7 * np.sin(np.arange(5000) * 0.03)).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 16000)
    ours, rate = native.decode_wav(p)
    ref, ref_rate = read_wav(p)
    assert rate == ref_rate == 16000
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resample_matches_scipy(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    ours = native.resample_poly(x, 1, 2)
    ref = resample_poly_kaiser(x, 16000, 8000)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_resample_up(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    ours = native.resample_poly(x, 2, 1)
    ref = scipy.signal.resample_poly(
        x.astype(np.float64), 2, 1,
        window=("kaiser", 14.769656459379492)).astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_load_utterance_crop_pad_normalize(tmp_path, rng):
    x = rng.standard_normal(3000).astype(np.float32) * 0.5 + 0.1
    p = tmp_path / "u.wav"
    write_wav(p, x, 8000)
    # pad case
    out = native.load_utterance(p, 8000, 4000, normalize=True)
    assert out.shape == (4000,)
    assert np.abs(out[3000:]).max() == 0.0
    got = out[:3000]
    assert abs(got.mean()) < 1e-3          # mean-subtracted
    assert abs(np.abs(got).max() - 1.0) < 1e-5  # peak-normalized
    # crop case
    out2 = native.load_utterance(p, 8000, 2000, normalize=False)
    y, _ = read_wav(p)
    np.testing.assert_allclose(out2, y[:2000], atol=1e-6)


def test_load_batch_threaded(tmp_path, rng):
    paths = []
    for i in range(6):
        x = rng.standard_normal(2000 + 100 * i).astype(np.float32) * 0.3
        p = tmp_path / f"{i}.wav"
        write_wav(p, x, 8000)
        paths.append(p)
    bank = native.load_batch(paths, 8000, 2500, num_threads=3)
    assert bank.shape == (6, 2500)
    one = native.load_utterance(paths[4], 8000, 2500)
    np.testing.assert_array_equal(bank[4], one)


def test_load_batch_resampling(tmp_path, rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.4
    p = tmp_path / "hi.wav"
    write_wav(p, x, 16000)
    bank = native.load_batch([p], 8000, 8000)
    ref = resample_poly_kaiser(read_wav(p)[0], 16000, 8000)
    np.testing.assert_allclose(bank[0], ref[:8000], atol=2e-4)


def test_load_batch_failure(tmp_path):
    with pytest.raises(ValueError):
        native.load_batch([tmp_path / "missing.wav"], 8000, 100)
