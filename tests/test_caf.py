"""CAF kernels vs a scipy oracle implementing the reference math.

The oracle reproduces the computation the reference performs per frame
(range_doppler_processing.py:52-90): per-lag rolled product, windowing,
zero-phase decimation through scipy.signal.decimate, and a Doppler FFT.
"""

import numpy as np
import pytest
from scipy import signal as sps

from passiveradar_tpu.ops.caf import direct_xambg, fast_xambg


def caf_oracle(ref, srv, range_bins, freq_bins, window=None, short_filt=True):
    n = len(ref)
    d = n // freq_bins
    if short_filt:
        dtaps = np.ones(d + 1)
    else:
        dtaps = sps.firwin(10 * d + 1, 1.0 / d, window="flattop")
    dfilt = sps.dlti(dtaps, 1)
    if isinstance(window, (str, tuple)):
        window = sps.get_window(window, n)
    out = np.zeros((freq_bins, range_bins + 1), dtype=np.complex64)
    sc = np.conj(srv)
    for k, lag in enumerate(np.arange(-range_bins, 1)):
        prod = np.roll(sc, lag) * ref
        if window is not None:
            prod = prod * window
        out[:, k] = sps.decimate(prod, d, ftype=dfilt)[:freq_bins]
    return np.fft.fftshift(np.fft.fft(out, axis=0), axes=0)


def _cnoise(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


@pytest.mark.parametrize("window", [None, ("kaiser", 5.0)])
def test_fast_xambg_matches_oracle(rng, window):
    n, nf, r = 8192, 128, 20
    ref, srv = _cnoise(rng, n), _cnoise(rng, n)
    got = np.asarray(fast_xambg(ref, srv, r, nf, window=window))
    want = caf_oracle(ref, srv, r, nf, window=window)
    assert got.shape == (nf, r + 1)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5


def test_fast_xambg_wide_lag_span(rng):
    # R+1 > ndecim exercises the multi-row segment windows
    n, nf, r = 4096, 256, 40
    ref, srv = _cnoise(rng, n), _cnoise(rng, n)
    got = np.asarray(fast_xambg(ref, srv, r, nf))
    want = caf_oracle(ref, srv, r, nf)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5


def test_fast_xambg_mxu_nonpow2_corr_len(rng, monkeypatch):
    """MXU branch with a 128-grid correlation length below the pow2 length.

    d + r + 1 = 327 rounds to a 384-point dense DFT (vs pow2 512) — the
    sliced-matmul path must stay alias-free and exact at non-pow2 lengths.
    """
    import jax

    from passiveradar_tpu.ops import mxufft

    n, nf, r = 4096, 16, 70          # d = 256, d + r + 1 = 327
    ref, srv = _cnoise(rng, n), _cnoise(rng, n)
    want = caf_oracle(ref, srv, r, nf)
    monkeypatch.setenv("PASSIVERADAR_MXU_FFT", "1")
    jax.clear_caches()
    try:
        got = np.asarray(fast_xambg(ref, srv, r, nf))
    finally:
        monkeypatch.delenv("PASSIVERADAR_MXU_FFT")
        jax.clear_caches()
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5


def test_fast_xambg_zero_pad_short_input(rng):
    n, nf, r = 4096, 64, 10
    ref, srv = _cnoise(rng, n - 5), _cnoise(rng, n - 5)
    got = np.asarray(fast_xambg(ref, srv, r, nf, input_len=n))
    want = caf_oracle(np.pad(ref, (0, 5)), np.pad(srv, (0, 5)), r, nf)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5


def test_fast_xambg_flattop_mode(rng):
    n, nf, r = 2048, 32, 8
    ref, srv = _cnoise(rng, n), _cnoise(rng, n)
    got = np.asarray(fast_xambg(ref, srv, r, nf, short_filt=False))
    want = caf_oracle(ref, srv, r, nf, short_filt=False)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-4


def test_point_target_lands_in_correct_cell(rng):
    """A delayed, Doppler-shifted echo must appear at its (range, Doppler) cell."""
    n, nf, r = 16384, 64, 24
    fs = 16384.0  # 1 s CPI → Doppler bins are integer Hz
    delay, doppler_hz = 9, 5.0
    ref = _cnoise(rng, n)
    t = np.arange(n) / fs
    echo = np.roll(ref, delay) * np.exp(1j * 2 * np.pi * doppler_hz * t)
    srv = (echo + 0.01 * _cnoise(rng, n)).astype(np.complex64)
    m = np.abs(np.asarray(fast_xambg(ref, srv, r, nf)))
    fbin, rbin = np.unravel_index(np.argmax(m), m.shape)
    # column k corresponds to lag -(R - k): echo delayed by `delay` peaks at
    # k = R - delay. The raw fast-CAF Doppler axis is inverted (srv is
    # conjugated before the Doppler FFT, a reference convention its plotting
    # scripts undo with fliplr): +doppler lands at fftshifted index
    # nf/2 - doppler.
    assert rbin == r - delay
    assert fbin == nf // 2 - int(doppler_hz)


def test_direct_xambg_agrees_with_fast(rng):
    """Time-domain and frequency-domain CAFs must localise the same target.

    Note the reference pair's mutually inverted Doppler axes: direct_xambg
    scans ref shifted by +df so a +3 Hz target peaks at nf/2 + 3, while the
    raw fast CAF (conjugated srv before the FFT) peaks at nf/2 - 3.
    """
    n, nf, r = 4096, 32, 12
    fs = 4096.0
    ref = _cnoise(rng, n)
    t = np.arange(n) / fs
    srv = (np.roll(ref, 4) * np.exp(1j * 2 * np.pi * 3.0 * t)).astype(np.complex64)
    md = np.abs(np.asarray(direct_xambg(ref, srv, r, nf, fs)))
    mf = np.abs(np.asarray(fast_xambg(ref, srv, r, nf)))
    df, dr = np.unravel_index(np.argmax(md), md.shape)
    ff, fr = np.unravel_index(np.argmax(mf), mf.shape)
    assert (df, dr) == (nf // 2 + 3, r - 4)
    assert (ff, fr) == (nf // 2 - 3, r - 4)


def test_fast_xambg_tp_matches_single_device(rng):
    """Tensor-parallel CAF over an 8-device mesh == single-device CAF."""
    from passiveradar_tpu.ops.caf import fast_xambg_tp
    from passiveradar_tpu.parallel.mesh import make_mesh

    n, nf, r = 8192, 128, 15  # r+1 = 16 divides 8
    ref, srv = _cnoise(rng, n), _cnoise(rng, n)
    mesh = make_mesh(8, axis_name="tp")
    got = np.asarray(fast_xambg_tp(ref, srv, r, nf, mesh,
                                   window=("kaiser", 5.0)))
    want = np.asarray(fast_xambg(ref, srv, r, nf, window=("kaiser", 5.0)))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-5 * np.max(np.abs(want))


def test_fast_xambg_tp_fm_geometry(rng):
    """TP CAF at the real FM frame geometry (1024x176, 524288-sample CPI)
    over the 8-device mesh, with a target check against the single-device
    path. r+1 = 176 divides 8."""
    from passiveradar_tpu.ops.caf import fast_xambg_tp
    from passiveradar_tpu.parallel.mesh import make_mesh

    n, nf, r = 524288, 1024, 175
    fs = float(n) / 2.0          # 2 s CPI, 0.5 Hz Doppler cells
    ref = _cnoise(rng, n)
    t = np.arange(n) / fs
    srv = (0.05 * np.roll(ref, 40) * np.exp(1j * 2 * np.pi * 20.0 * t)
           + 0.01 * _cnoise(rng, n)).astype(np.complex64)
    mesh = make_mesh(8, axis_name="tp")
    got = np.asarray(fast_xambg_tp(ref, srv, r, nf, mesh,
                                   window=("kaiser", 5.0)))
    want = np.asarray(fast_xambg(ref, srv, r, nf, window=("kaiser", 5.0)))
    assert got.shape == (nf, r + 1)
    assert np.max(np.abs(got - want)) < 1e-5 * np.max(np.abs(want))
    fbin, rbin = np.unravel_index(np.argmax(np.abs(got)), got.shape)
    assert rbin == r - 40
    assert abs(fbin - (nf // 2 - 40)) <= 1   # 20 Hz / 0.5 Hz cells
