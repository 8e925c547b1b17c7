"""MXU matmul DFT vs jnp.fft — exactness across sizes, axes, batches."""

import jax.numpy as jnp
import numpy as np
import pytest

from passiveradar_tpu.ops import mxufft


def _rand_c(shape, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("n", [8, 256, 1024, 4096, 32768])
def test_fft_matches_jnp(n):
    x = _rand_c((3, n), seed=n)
    got = mxufft.fft(jnp.asarray(x))
    want = jnp.fft.fft(x)
    scale = np.sqrt(n)          # rms of the transform output
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("n", [256, 4096, 32768])
def test_ifft_matches_jnp(n):
    x = _rand_c((2, n), seed=n + 1)
    got = mxufft.ifft(jnp.asarray(x))
    want = jnp.fft.ifft(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)


def test_roundtrip_large():
    n = 1 << 18
    x = _rand_c((n,), seed=7)
    back = mxufft.ifft(mxufft.fft(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, atol=5e-5, rtol=0)


def test_axis_argument():
    x = _rand_c((512, 5), seed=3)
    got = mxufft.fft(jnp.asarray(x), axis=0)
    want = jnp.fft.fft(x, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * np.sqrt(512), rtol=0)


def test_real_input():
    x = np.random.default_rng(0).standard_normal(1024).astype(np.float32)
    got = mxufft.fft(jnp.asarray(x))
    want = jnp.fft.fft(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * 32, rtol=0)


def test_non_pow2_rejected():
    with pytest.raises(ValueError):
        mxufft.fft(jnp.zeros(12, jnp.complex64))


def test_pipeline_parity_mxu_forced(monkeypatch):
    """Clutter + CAF produce the same maps through the MXU DFT routing.

    On CPU the call sites default to jnp.fft; forcing PASSIVERADAR_MXU_FFT=1
    (and clearing trace caches, since the routing choice is baked in at trace
    time) exercises the exact integration the TPU build runs.
    """
    import jax

    from passiveradar_tpu.ops.caf import fast_xambg
    from passiveradar_tpu.ops.clutter import ls_filter_multiple

    n = 4096
    rng = np.random.default_rng(5)
    ref = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    srv = (0.3 * np.roll(ref, 7) + 0.1 * rng.standard_normal(n)
           ).astype(np.complex64)

    def run():
        clean = ls_filter_multiple(jnp.asarray(ref), jnp.asarray(srv), 22,
                                   4000.0, (0.0, 1.0, -1.0))
        maps = fast_xambg(jnp.asarray(ref), clean, 15, 64)
        return np.asarray(clean), np.asarray(maps)

    base_clean, base_maps = run()
    monkeypatch.setenv("PASSIVERADAR_MXU_FFT", "1")
    monkeypatch.setattr(mxufft, "AUTO_MIN", 4)
    jax.clear_caches()
    try:
        assert mxufft.use_mxu()
        mxu_clean, mxu_maps = run()
    finally:
        monkeypatch.delenv("PASSIVERADAR_MXU_FFT")
        jax.clear_caches()

    np.testing.assert_allclose(mxu_clean, base_clean, atol=2e-4, rtol=0)
    scale = np.abs(base_maps).max()
    np.testing.assert_allclose(mxu_maps, base_maps, atol=1e-4 * scale, rtol=0)


# ------------------------------------------------- fused Pallas four-step

@pytest.mark.parametrize("n", [16384, 32768, 65536])
def test_fused_fft_matches_jnp(n, monkeypatch):
    """The fused single-kernel four-step (ops/fft_pallas) must match jnp.fft
    to f32 round-off, forward and inverse, batched (interpret mode on CPU)."""
    monkeypatch.setenv("PASSIVERADAR_PALLAS_FFT", "1")
    from passiveradar_tpu.ops import fft_pallas
    x = _rand_c((3, n), seed=n + 7)
    got = fft_pallas.fft_fused(jnp.asarray(x))
    want = jnp.fft.fft(x)
    scale = np.sqrt(n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale, rtol=0)
    gi = fft_pallas.fft_fused(jnp.asarray(x), inverse=True)
    wi = jnp.fft.ifft(x)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                               atol=2e-5, rtol=0)
    # the mxufft entry points route through the fused kernel under the env
    got2 = mxufft.fft(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=2e-5 * scale, rtol=0)


def test_fused_fft_full_length_and_leading_dims(monkeypatch):
    monkeypatch.setenv("PASSIVERADAR_PALLAS_FFT", "1")
    from passiveradar_tpu.ops import fft_pallas
    n = 262144                      # the FM geometry's full chunk length
    x = _rand_c((2, n), seed=42)
    got = np.asarray(fft_pallas.fft_fused(jnp.asarray(x)))
    want = np.asarray(jnp.fft.fft(x))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.sqrt(n), rtol=0)
    # leading dims flatten into the frame grid
    x3 = x.reshape(2, 1, n)
    got3 = np.asarray(fft_pallas.fft_fused(jnp.asarray(x3)))
    np.testing.assert_allclose(got3[:, 0], want, atol=2e-5 * np.sqrt(n),
                               rtol=0)
