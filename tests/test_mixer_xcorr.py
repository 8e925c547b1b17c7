"""Frequency shifting and cross-correlation vs numpy/scipy oracles."""

import numpy as np
import pytest
from scipy import signal as sps

from passiveradar_tpu.ops.mixer import block_phase_offsets, frequency_shift
from passiveradar_tpu.ops.util import deinterleave_iq, normalize
from passiveradar_tpu.ops.xcorr import apply_offset, find_channel_offset, xcorr


def _shift_oracle(x, fc, fs, phase=0.0):
    n = np.arange(x.shape[0], dtype=np.float64)
    return x * np.exp(1j * (2 * np.pi * fc * n / fs + phase))


def test_frequency_shift_small(rng):
    n = 4096
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(frequency_shift(x, 2.0, 262144.0))
    want = _shift_oracle(x.astype(np.complex128), 2.0, 262144.0)
    assert np.max(np.abs(got - want)) < 1e-5 * np.max(np.abs(want))


def test_frequency_shift_long_ramp_precision(rng):
    # phase ramp reaches ~6e4 rad — float32 naive computation would be off by
    # ~5e-3 rad; the split-phase scheme must stay well below that.
    n = 240_000
    x = np.ones(n, dtype=np.complex64)
    fc, fs = 100_000.0, 2_400_000.0
    got = np.asarray(frequency_shift(x, fc, fs))
    want = _shift_oracle(x.astype(np.complex128), fc, fs)
    phase_err = np.abs(np.angle(got * np.conj(want)))
    assert np.max(phase_err) < 1e-4


def test_frequency_shift_phase_offset_batched(rng):
    n = 1024
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    phases = np.array([0.1, 1.5, -2.0], dtype=np.float32)
    got = np.asarray(frequency_shift(x, 5.0, 1000.0, phases))
    for b in range(3):
        want = _shift_oracle(x[b].astype(np.complex128), 5.0, 1000.0, phases[b])
        assert np.max(np.abs(got[b] - want)) < 1e-5 * np.max(np.abs(want))


def test_block_phase_continuity(rng):
    """Chunked mixing with block phases == one-shot mixing of the whole signal
    (the reference's continuity requirement, main.py:122-130)."""
    fs, fc = 2_400_000, 100_000
    block = 7502  # not a multiple of fs//fc so the correction is nontrivial
    nblocks = 5
    x = (rng.standard_normal(block * nblocks)
         + 1j * rng.standard_normal(block * nblocks)).astype(np.complex64)
    whole = _shift_oracle(x.astype(np.complex128), fc, fs)
    phases = block_phase_offsets(nblocks, block, fc, fs)
    xb = x.reshape(nblocks, block)
    got = np.asarray(frequency_shift(xb, fc, fs, phases)).reshape(-1)
    phase_err = np.abs(np.angle(got * np.conj(whole)))
    assert np.max(phase_err) < 1e-3


def test_deinterleave_iq(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    got = np.asarray(deinterleave_iq(x))
    want = (x[0:-1:2] + 1j * x[1::2]).astype(np.complex64)
    assert np.array_equal(got, want)


def test_normalize(rng):
    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100))
    got = np.asarray(normalize(x.astype(np.complex64)))
    assert np.isclose(np.mean(np.abs(got)), 1.0, rtol=1e-5)


@pytest.mark.parametrize("nlead,nlag", [(0, 5), (3, 3), (7, 0)])
def test_xcorr_matches_reference_convention(rng, nlead, nlag):
    n = 256
    s1 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    s2 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(xcorr(s1, s2, nlead, nlag))
    want = sps.correlate(s1.astype(np.complex128),
                         np.pad(s2.astype(np.complex128), (nlag, nlead)),
                         mode="valid")
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want))


def test_find_channel_offset_recovers_known_shift(rng):
    n = 20000
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    true_offset = 137
    # srv is a delayed copy of ref: ref[t] = base[t+off] matches srv[t]
    ref = base[true_offset:true_offset + 16000]
    srv = base[:16000] + 0.01 * (rng.standard_normal(16000)
                                 + 1j * rng.standard_normal(16000)).astype(np.complex64)
    est = find_channel_offset(ref, srv, 1, 1000)
    assert est == -true_offset
    r2, s2 = apply_offset(ref, srv, est)
    assert r2.shape == s2.shape
    # after alignment the channels should correlate at zero lag
    peak = int(np.argmax(np.abs(np.asarray(xcorr(r2, s2, 50, 50)))))
    assert peak == 50


def test_find_channel_offset_decimated(rng):
    n = 40000
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    # lowpass so decimation by 4 preserves the correlation peak
    base = np.convolve(base, np.ones(8) / 8, mode="same").astype(np.complex64)
    off = 24  # multiple of the decimation factor
    ref = base[off:off + 30000]
    srv = base[:30000]
    est = find_channel_offset(ref, srv, 4, 500)
    assert abs(est - (-off)) <= 4


def test_shift_matches_reference_semantics(rng):
    from passiveradar_tpu.ops.util import shift
    x = (rng.standard_normal(32) + 1j * rng.standard_normal(32)).astype(np.complex64)
    for n in (0, 3, -4):
        got = np.asarray(shift(x, n))
        want = np.empty_like(x)
        if n == 0:
            want = x
        elif n > 0:
            want[:n] = 0
            want[n:] = x[:-n]
        else:
            want[n:] = 0
            want[:n] = x[-n:]
        assert np.array_equal(got, want)


def test_offset_compensation_aligns(rng):
    from passiveradar_tpu.ops.xcorr import offset_compensation
    n = 20000
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    x1 = base[100:16100]
    x2 = base[:16000]  # x2 leads x1 by 100 samples
    x2s = np.asarray(offset_compensation(x1, x2, 8000, 1, 500))
    # after compensation the channels correlate at zero lag
    peak = int(np.argmax(np.abs(np.asarray(xcorr(x1, x2s, 50, 50)))))
    assert peak == 50


def test_channel_preprocessing_shapes(rng):
    from passiveradar_tpu.ops.xcorr import channel_preprocessing
    sig = rng.standard_normal(8192).astype(np.float32)
    out = np.asarray(channel_preprocessing(sig, 4, 100.0, 8192.0))
    assert out.shape == (1024,)
    assert out.dtype == np.complex64


def test_find_channel_offset_hierarchical(rng):
    """Large-lag searches split into coarse+fine and still find the offset."""
    n = 200_000
    base = np.convolve(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)),
        np.ones(6) / 6, "same").astype(np.complex64)
    off = 1234
    ref = base[off:off + 150_000]
    srv = base[:150_000]
    # force the hierarchical path with a small max_fft
    est = find_channel_offset(ref, srv, 1, 100_000, max_fft=1 << 16)
    assert est == -off
