"""FIR/resampling kernels vs scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from passiveradar_tpu.ops.fir import (
    decimate_taps,
    fir_decimate,
    mix_resample_poly,
    resample_poly,
    upfirdn,
)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)


@pytest.mark.parametrize("up,down", [(1, 1), (3, 1), (1, 4), (13, 119), (7, 5)])
@pytest.mark.parametrize("n", [257, 1024])
def test_upfirdn_constant_real(rng, up, down, n):
    x = rng.standard_normal(n).astype(np.float32)
    h = rng.standard_normal(31)
    got = np.asarray(upfirdn(h, x, up, down))
    want = sps.upfirdn(h, x.astype(np.float64), up, down)
    assert got.shape == want.shape
    assert _rel(got, want) < 2e-6


def test_upfirdn_complex(rng):
    n = 500
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    h = rng.standard_normal(21)
    got = np.asarray(upfirdn(h, x, 2, 3))
    want = sps.upfirdn(h, x.astype(np.complex128), 2, 3)
    assert got.shape == want.shape
    assert _rel(got, want) < 2e-6


@pytest.mark.parametrize("up,down", [(13, 119), (2, 1), (1, 8), (5, 7)])
def test_upfirdn_line_mode(rng, up, down):
    n = 613
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    h = rng.standard_normal(41)
    got = np.asarray(upfirdn(h, x, up, down, mode="line"))
    want = sps.upfirdn(h, x.astype(np.complex128), up, down, mode="line")
    assert got.shape == want.shape
    assert _rel(got, want) < 3e-6


@pytest.mark.parametrize("padtype", ["constant", "line"])
def test_resample_poly_matches_scipy(rng, padtype):
    # same factors as the FM pipeline's IF conversion (reference main.py:152)
    n = 11900
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(resample_poly(x, 13, 119, padtype=padtype))
    want = sps.resample_poly(x.astype(np.complex128), 13, 119, padtype=padtype)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-4


def test_resample_poly_odd_length(rng):
    x = rng.standard_normal(997).astype(np.float32)
    got = np.asarray(resample_poly(x, 3, 7, padtype="line"))
    want = sps.resample_poly(x.astype(np.float64), 3, 7, padtype="line")
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-4


@pytest.mark.parametrize("padtype", ["constant", "line"])
@pytest.mark.parametrize("up,down", [(13, 119), (3, 7), (5, 2)])
def test_mix_resample_fused_matches_two_step(rng, up, down, padtype):
    # fused oscillator-folded resampler vs the float64 scipy composition of
    # mixer + resample_poly (the two stages of reference main.py:122-166)
    n = 11900
    fc, fs, phase = 190e3, 2.4e6, 1.2345
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(mix_resample_poly(x, fc, fs, phase, up, down,
                                       padtype=padtype))
    osc = np.exp(1j * (2 * np.pi * fc / fs * np.arange(n) + phase))
    want = sps.resample_poly(x.astype(np.complex128) * osc, up, down,
                             padtype=padtype)
    assert got.shape == want.shape
    assert _rel(got, want) < 2e-5


def test_mix_resample_iq_pair_input(rng):
    # (n, 2) float32 IQ-pair input — the host-transfer format — must match
    # the complex input path exactly
    n = 4096
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    pairs = np.stack([x.real, x.imag], axis=-1)
    a = np.asarray(mix_resample_poly(x, 1e5, 2.4e6, 0.5, 13, 119,
                                     padtype="line"))
    b = np.asarray(mix_resample_poly(pairs, 1e5, 2.4e6, 0.5, 13, 119,
                                     padtype="line"))
    assert _rel(a, b) < 1e-7


@pytest.mark.parametrize("q", [2, 5, 8])
def test_fir_decimate_matches_scipy(rng, q):
    n = 2048
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(fir_decimate(x, q))
    want = sps.decimate(x, q, 20 * q, ftype="fir")
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-4


def test_decimate_with_explicit_taps(rng):
    # the CAF's all-ones boxcar decimator (reference
    # range_doppler_processing.py:69-72,86)
    n, q = 4096, 64
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    taps = np.ones(q + 1)
    got = np.asarray(decimate_taps(x, taps, q))
    want = sps.decimate(x, q, ftype=sps.dlti(taps, 1))
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_mix_resample_batch_pallas_matches_vmap(rng, monkeypatch):
    """The Pallas regroup+matmul batch path (interpret mode on CPU) must
    match the vmapped einsum path frame-for-frame at the FM ratio."""
    from passiveradar_tpu.ops.fir import mix_resample_poly_batch

    up, down = 13, 119
    n_in, frames = 119 * 160, 3
    fc, fs = 100_000.0, 2_400_000.0
    x = (rng.standard_normal((frames, n_in, 2))).astype(np.float32)
    phases = rng.standard_normal(frames).astype(np.float32)

    want = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))

    monkeypatch.setenv("PASSIVERADAR_PALLAS_RESAMPLE", "1")
    got = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) < 2e-6 * scale


def test_mix_resample_batch_falls_back_for_pure_upsample(rng, monkeypatch):
    """down=1 violates the Pallas kernel's lookahead constraint — the batch
    entry must fall back to the vmapped path, not crash."""
    from passiveradar_tpu.ops.fir import mix_resample_poly_batch

    monkeypatch.setenv("PASSIVERADAR_PALLAS_RESAMPLE", "1")
    x = rng.standard_normal((2, 1024, 2)).astype(np.float32)
    phases = np.zeros(2, np.float32)
    got = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), 1e5, 2.4e6, 2, 1,
        padtype="line"))
    want = np.asarray(jax.vmap(
        lambda v, p: mix_resample_poly(v, 1e5, 2.4e6, p, 2, 1,
                                       padtype="line"))(
        jnp.asarray(x), jnp.asarray(phases)))
    assert np.max(np.abs(got - want)) < 1e-6 * np.max(np.abs(want))


@pytest.mark.parametrize("fold", [2, 4, 8])
def test_mix_resample_batch_pallas_fold_matches(rng, monkeypatch, fold):
    """The phase-folded kernel factorisations ((fold*up)/(fold*down) with
    the shifted wider bank — ops/fir.py:_mix_resample_fold) must match the
    unfolded einsum path exactly at the FM ratio, including the
    padtype='line' edge corrections applied on the flat output."""
    from passiveradar_tpu.ops.fir import mix_resample_poly_batch

    up, down = 13, 119
    n_in, frames = 119 * 160, 3
    fc, fs = 100_000.0, 2_400_000.0
    x = rng.standard_normal((frames, n_in, 2)).astype(np.float32)
    phases = rng.standard_normal(frames).astype(np.float32)

    want = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))
    monkeypatch.setenv("PASSIVERADAR_PALLAS_RESAMPLE", "1")
    monkeypatch.setenv("PASSIVERADAR_RESAMPLE_FOLD", str(fold))
    got = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) < 2e-6 * scale


@pytest.mark.parametrize("up,down,frames", [(13, 119, 2), (1, 3, 2),
                                            (2, 7, 10), (3, 17, 2),
                                            (5, 32, 2)])
def test_mix_resample_batch_pallas_geometries(rng, monkeypatch, up, down,
                                              frames):
    """The Pallas batch path must match the vmapped einsum path across
    rational ratios (different bank widths, lookahead tile counts, phases)
    and across the frames>8 row-chunk split (the (2,7,10) case)."""
    from passiveradar_tpu.ops.fir import mix_resample_poly_batch

    n_in = down * 140
    fc, fs = 5_000.0, 96_000.0
    x = rng.standard_normal((frames, n_in, 2)).astype(np.float32)
    phases = rng.standard_normal(frames).astype(np.float32)

    want = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))
    monkeypatch.setenv("PASSIVERADAR_PALLAS_RESAMPLE", "1")
    got = np.asarray(mix_resample_poly_batch(
        jnp.asarray(x), jnp.asarray(phases), fc, fs, up, down,
        padtype="line"))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) < 2e-6 * scale


def test_mix_regroup_matmul_pad_left_matches_explicit_pad(rng):
    """pad_left staging (zero pad folded into the kernel's staging copy)
    must equal explicitly pre-padded planes."""
    from passiveradar_tpu.ops.resample_pallas import mix_regroup_matmul

    up, down, groups, pad = 13, 119, 40, 37
    n = down * groups - pad - 100
    pr = rng.standard_normal((3, n)).astype(np.float32)
    pi = rng.standard_normal((3, n)).astype(np.float32)
    bank = rng.standard_normal((2 * up, 240)).astype(np.float32)
    want = mix_regroup_matmul(
        jnp.asarray(np.pad(pr, ((0, 0), (pad, 0)))),
        jnp.asarray(np.pad(pi, ((0, 0), (pad, 0)))),
        jnp.asarray(bank), down, groups, up, interpret=True)
    got = mix_regroup_matmul(jnp.asarray(pr), jnp.asarray(pi),
                             jnp.asarray(bank), down, groups, up,
                             interpret=True, pad_left=pad)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-6, atol=1e-6)


def test_mix_regroup_matmul_rejects_bad_geometry(rng):
    """The kernel wrapper must fail loudly (not wrong-answer) when the
    lookahead exceeds the grid block span or the left pad overflows the
    staging buffer."""
    from passiveradar_tpu.ops.resample_pallas import mix_regroup_matmul

    pr = rng.standard_normal((2, 256)).astype(np.float32)
    pi = rng.standard_normal((2, 256)).astype(np.float32)
    # down=2 -> gs capped at 128 -> span 256 lanes < (kw+1)*128 for kw>=2
    wide_bank = rng.standard_normal((2, 200)).astype(np.float32)
    with pytest.raises(ValueError, match="lookahead"):
        mix_regroup_matmul(jnp.asarray(pr), jnp.asarray(pi),
                           jnp.asarray(wide_bank), 2, 128, 1,
                           interpret=True)
    bank = rng.standard_normal((2, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="staging"):
        mix_regroup_matmul(jnp.asarray(pr), jnp.asarray(pi),
                           jnp.asarray(bank), 119, 10, 1,
                           interpret=True, pad_left=10 ** 6)


# ---------------------------------------------------------------------------
# IIR decimation (scipy.signal.decimate default path) — ops/iir.py
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q,tol", [(1, 5e-6), (2, 5e-6), (4, 1e-5),
                                   (8, 5e-5), (16, 5e-4)])
def test_iir_decimate_matches_scipy(rng, q, tol):
    """iir_decimate must match scipy.signal.decimate's default zero-phase
    cheby1 IIR (incl. the pure filtering pass at q=1) — both the
    partial-fraction parallel-scan path (q<=8) and the biquad-cascade
    matrix-scan path (q=16)."""
    from passiveradar_tpu.ops.iir import iir_decimate

    n = 30_000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    if q == 1:
        want = sps.filtfilt(*sps.cheby1(8, 0.05, 0.8), x)
    else:
        want = sps.decimate(x, q)
    got = np.asarray(iir_decimate(jnp.asarray(x), q))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < tol * np.max(np.abs(want))

    xr = rng.standard_normal(n).astype(np.float32)
    wantr = (sps.decimate(xr, q) if q > 1
             else sps.filtfilt(*sps.cheby1(8, 0.05, 0.8), xr))
    gotr = np.asarray(iir_decimate(jnp.asarray(xr), q))
    assert gotr.dtype == np.float32
    assert np.max(np.abs(gotr - wantr)) < tol * np.max(np.abs(wantr))


def test_find_channel_offset_iir_matches_reference_math(rng):
    """The offset search with the IIR anti-alias (default) must agree with
    a literal numpy/scipy transcription of the reference's
    find_channel_offset (signal_utils.py:73-78) — same argmax, exactly."""
    from passiveradar_tpu.ops.xcorr import find_channel_offset

    n, true_off, nd, nl = 60_000, 37, 4, 500
    base = (rng.standard_normal(n + 200)
            + 1j * rng.standard_normal(n + 200)).astype(np.complex64)
    ref = base[100:100 + n]
    srv = 0.7 * base[100 - true_off:100 - true_off + n] \
        + 0.05 * (rng.standard_normal(n)
                  + 1j * rng.standard_normal(n)).astype(np.complex64)

    def reference_find_offset(s1, s2):
        b1 = sps.decimate(s1, nd)
        b2 = np.pad(sps.decimate(s2, nd), (nl, nl), "constant")
        xc = np.abs(sps.correlate(b1, b2, mode="valid"))
        return (np.argmax(xc) - nl) * nd

    want = reference_find_offset(ref, srv)
    got = find_channel_offset(jnp.asarray(ref), jnp.asarray(srv), nd, nl)
    assert got == want
