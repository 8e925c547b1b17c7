"""Partial/sparse FFT primitives vs jnp.fft."""

import numpy as np

from passiveradar_tpu.ops.zoomfft import partial_ifft, sparse_fft


def _cnoise(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_partial_ifft_matches_full(rng):
    n, m = 4096, 185
    x = _cnoise(rng, n)
    got = np.asarray(partial_ifft(x, m))
    want = np.fft.ifft(x)[:m]
    assert np.max(np.abs(got - want)) < 1e-5 * np.max(np.abs(want))


def test_partial_ifft_batched(rng):
    n, m = 2048, 100
    x = _cnoise(rng, (3, n))
    got = np.asarray(partial_ifft(x, m))
    want = np.fft.ifft(x, axis=-1)[:, :m]
    assert np.max(np.abs(got - want)) < 1e-5 * np.max(np.abs(want))


def test_sparse_fft_matches_full(rng):
    n, m = 4096, 185
    s = _cnoise(rng, m)
    got = np.asarray(sparse_fft(s, n))
    want = np.fft.fft(s, n)
    assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want))


def test_sparse_fft_batched(rng):
    n, m = 1024, 60
    s = _cnoise(rng, (4, m))
    got = np.asarray(sparse_fft(s, n))
    want = np.fft.fft(s, n, axis=-1)
    assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want))
