"""Clutter cancellation filters vs scipy/numpy oracles.

Each oracle implements the reference's published math (clutter_removal.py)
directly with scipy/numpy so our FFT-domain reformulations are checked
against the original linear-algebra formulations.
"""

import numpy as np
import pytest
from scipy import signal as sps
from scipy.linalg import solve_toeplitz

from passiveradar_tpu.ops.clutter import (
    gal_jpe,
    gs_apply,
    gs_generators,
    levinson_first_col,
    ls_filter,
    ls_filter_multiple,
    ls_filter_svd,
    ls_filter_toeplitz,
    nlms_filter,
    toeplitz_solve,
)


def _cnoise(rng, n, dtype=np.complex64):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(dtype)


def _xcorr_ref(s1, s2, nlead, nlag):
    return sps.correlate(s1, np.pad(s2, (nlag, nlead)), mode="valid")


def toeplitz_oracle(ref, srv, filter_len, peek=10):
    ref = ref.astype(np.complex128)
    srv = srv.astype(np.complex128)
    rs = np.roll(ref, -peek)
    ac = _xcorr_ref(rs, rs, 0, filter_len + peek - 1)
    cc = _xcorr_ref(srv, rs, 0, filter_len + peek - 1)
    taps = solve_toeplitz(ac, cc)
    clutter = np.convolve(rs, taps, mode="full")[:len(srv)]
    return srv - clutter, taps


def lag_matrix(ref, filter_len, peek):
    lags = np.arange(-peek, filter_len)
    a = np.zeros((len(ref), filter_len + peek), dtype=np.complex128)
    for k, lag in enumerate(lags):
        a[:, k] = np.roll(ref, lag)
    return a


def test_toeplitz_solve_matches_scipy(rng):
    m = 32
    c = _cnoise(rng, m, np.complex128)
    c[0] = np.abs(c[0]) + m  # diagonally dominant → well-conditioned
    b = _cnoise(rng, m, np.complex128)
    got = np.asarray(toeplitz_solve(c.astype(np.complex64), b.astype(np.complex64)))
    want = solve_toeplitz(c, b)
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


def test_ls_filter_toeplitz_matches_oracle(rng):
    n, flen = 4096, 24
    ref = _cnoise(rng, n)
    srv = (0.8 * np.roll(ref, 3) + 0.1 * _cnoise(rng, n)).astype(np.complex64)
    got = np.asarray(ls_filter_toeplitz(ref, srv, flen))
    want, _ = toeplitz_oracle(ref, srv, flen)
    assert np.max(np.abs(got - want)) < 2e-3 * np.max(np.abs(srv))


def test_ls_filter_toeplitz_suppresses_direct_path(rng):
    n, flen = 8192, 32
    ref = _cnoise(rng, n)
    clutter = 1.0 * np.roll(ref, 2) + 0.5 * np.roll(ref, 7)
    srv = (clutter + 0.001 * _cnoise(rng, n)).astype(np.complex64)
    out = np.asarray(ls_filter_toeplitz(ref, srv, flen))
    # interior samples (edge transients excluded) must drop by > 30 dB
    sl = slice(flen + 16, n - flen - 16)
    supp = 10 * np.log10(np.mean(np.abs(out[sl]) ** 2)
                         / np.mean(np.abs(srv[sl]) ** 2))
    assert supp < -30


def test_levinson_gs_matches_direct_inverse(rng):
    # batched Hermitian PD Toeplitz systems from colored-noise
    # autocorrelations — the clutter precompute's actual regime
    m, n, batch = 48, 16384, 6
    xs, vs = [], []
    for _ in range(batch):
        sig = sps.lfilter([1, 0.6, 0.25], [1], _cnoise(rng, n, np.complex128))
        ac = np.array([np.vdot(sig[:n - l], sig[l:]) for l in range(m)]).conj()
        ac[0] = ac[0].real + 0j
        xs.append(ac)
        vs.append(_cnoise(rng, m, np.complex128) * np.abs(ac[0]))
    c = np.stack(xs).astype(np.complex64)
    v = np.stack(vs).astype(np.complex64)
    x = levinson_first_col(c)
    fx, fy, delta = gs_generators(x, 128)
    got = np.asarray(gs_apply(fx, fy, delta, v))
    for b in range(batch):
        want = solve_toeplitz(xs[b], vs[b])
        err = np.max(np.abs(got[b] - want)) / np.max(np.abs(want))
        assert err < 2e-3, (b, err)


def test_ls_filter_multiple_solver_equivalence(rng):
    # levinson/G-S path must agree with the dense Cholesky path
    n, flen = 8192, 24
    fs = 8192.0
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 2) + 0.05 * _cnoise(rng, n)).astype(np.complex64)
    a = np.asarray(ls_filter_multiple(ref, srv, flen, fs, (0, 1, -1),
                                      solver="levinson"))
    b = np.asarray(ls_filter_multiple(ref, srv, flen, fs, (0, 1, -1),
                                      solver="cholesky"))
    assert np.max(np.abs(a - b)) < 2e-3 * np.max(np.abs(srv))
    for sv in ("gs_dense", "gs_matrix"):
        c = np.asarray(ls_filter_multiple(ref, srv, flen, fs, (0, 1, -1),
                                          solver=sv))
        assert np.max(np.abs(a - c)) < 2e-3 * np.max(np.abs(srv)), sv


def test_ls_filter_multiple_zero_frame_guard():
    # all-zero frames (batch padding) must stay finite through the
    # Levinson/G-S path, as they did through the guarded Cholesky
    n, flen = 2048, 16
    z = np.zeros(n, np.complex64)
    out = np.asarray(ls_filter_multiple(z, z, flen, 2048.0, (0, 1, -1)))
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out)) == 0.0


@pytest.mark.parametrize("solver", ["levinson", "cholesky", "gs_dense", "gs_matrix"])
def test_ls_filter_multiple_matches_sequential_oracle(rng, solver):
    n, flen = 4096, 16
    fs = 4096.0
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 2) + 0.05 * _cnoise(rng, n)).astype(np.complex64)
    got = np.asarray(ls_filter_multiple(ref, srv, flen, fs, (0, 1, -1),
                                        solver=solver))

    cur = srv.astype(np.complex128)
    t = np.arange(n) / fs
    for dop in (0, 1, -1):
        r = ref.astype(np.complex128)
        if dop:
            r = r * np.exp(1j * 2 * np.pi * dop * t)
        cur, _ = toeplitz_oracle(r.astype(np.complex64), cur.astype(np.complex64), flen)
    assert np.max(np.abs(got - cur)) < 5e-3 * np.max(np.abs(srv))


@pytest.mark.parametrize("impl", ["segment", "coupled"])
def test_ls_filter_multiple_impls_match_carry(rng, impl):
    """The segment-Gram and precoupled formulations must reproduce the
    production carry impl (same unrolled algebra, different evaluation)."""
    n, flen = 4096, 16
    fs = n / 0.9998442            # FM-like fractional bins (order-1 ramp)
    bins = (0, 1, -1, 2, -2)
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 2) + 0.05 * _cnoise(rng, n)).astype(np.complex64)
    want = np.asarray(ls_filter_multiple(ref, srv, flen, fs, bins,
                                         impl="carry"))
    got = np.asarray(ls_filter_multiple(ref, srv, flen, fs, bins, impl=impl))
    assert np.max(np.abs(got - want)) < 2e-3 * np.max(np.abs(srv))
    # all-zero frames (batch padding) stay finite in every impl
    z = np.zeros(2048, np.complex64)
    out = np.asarray(ls_filter_multiple(z, z, 16, 2048.0, (0, 1, -1),
                                        impl=impl))
    assert np.all(np.isfinite(out)) and np.max(np.abs(out)) == 0.0


@pytest.mark.parametrize("stretch", [0.9998442, 1.002, 1.024])
def test_ls_filter_multiple_fractional_bins(rng, stretch):
    """Chunk durations off integer seconds: bins land at fractional DFT bins.

    stretch=0.9998442 mirrors the FM geometry (order-1 ramp expansion),
    1.002 forces the order-2 path, 1.024 the exact per-bin-FFT fallback —
    all three must match the float64 sequential oracle.
    """
    n, flen = 4096, 16
    fs = n / stretch
    bins = (0, 1, -1, 2, -2)
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 2) + 0.05 * _cnoise(rng, n)).astype(np.complex64)
    got = np.asarray(ls_filter_multiple(ref, srv, flen, fs, bins))

    cur = srv.astype(np.complex128)
    t = np.arange(n) / fs
    for dop in bins:
        r = ref.astype(np.complex128)
        if dop:
            r = r * np.exp(1j * 2 * np.pi * dop * t)
        cur, _ = toeplitz_oracle(r.astype(np.complex64),
                                 cur.astype(np.complex64), flen)
    assert np.max(np.abs(got - cur)) < 5e-3 * np.max(np.abs(srv))


def test_ls_filter_direct_matches_roll_matrix_oracle(rng):
    n, flen, peek, reg = 512, 12, 4, 1.0
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 3) + 0.1 * _cnoise(rng, n)).astype(np.complex64)
    got = np.asarray(ls_filter(ref, srv, flen, reg=reg, peek=peek))
    a = lag_matrix(ref.astype(np.complex128), flen, peek)
    ata = a.conj().T @ a
    taps = np.linalg.solve(ata + reg * np.eye(ata.shape[0]),
                           a.conj().T @ srv.astype(np.complex128))
    want = srv - a @ taps
    assert np.max(np.abs(got - want)) < 2e-3 * np.max(np.abs(srv))


def test_ls_filter_svd_matches_pinv_oracle(rng):
    n, flen, peek = 512, 10, 3
    ref = _cnoise(rng, n)
    srv = (np.roll(ref, 1) + 0.2 * _cnoise(rng, n)).astype(np.complex64)
    got = np.asarray(ls_filter_svd(ref, srv, flen, peek=peek))
    a = lag_matrix(ref.astype(np.complex128), flen, peek)
    u, s, vh = np.linalg.svd(a, full_matrices=False)
    sinv = np.where(s < 1e-10, 0.0, 1.0 / s)
    taps = vh.conj().T @ np.diag(sinv) @ u.conj().T @ srv.astype(np.complex128)
    want = srv - a @ taps
    assert np.max(np.abs(got - want)) < 5e-3 * np.max(np.abs(srv))


def nlms_oracle(ref, srv, filter_len, mu, peek=10):
    ref = ref.astype(np.complex128)
    srv = srv.astype(np.complex128)
    m = filter_len + peek
    w = np.zeros(m, dtype=np.complex128)
    out = np.zeros(len(srv), dtype=np.complex128)
    u = np.flip(ref[0:m])
    for k in range(len(srv) - m):
        u = np.append(ref[m + k], u[:-1])
        e = srv[k + filter_len] - w.conj().T @ u
        w = w + mu * u * np.conj(e) / (u.conj().T @ u)
        out[filter_len + k] = e
    return out, w


def test_nlms_matches_per_sample_oracle(rng):
    n, flen, mu = 600, 12, 0.05
    ref = _cnoise(rng, n)
    srv = (0.5 * np.roll(ref, 2) + 0.1 * _cnoise(rng, n)).astype(np.complex64)
    got, taps = nlms_filter(ref, srv, flen, mu, return_filter=True)
    want, wtaps = nlms_oracle(ref, srv, flen, mu)
    assert np.max(np.abs(np.asarray(got) - want)) < 1e-3 * np.max(np.abs(srv))
    assert np.max(np.abs(np.asarray(taps) - wtaps)) < 1e-3


def test_nlms_converges_on_stationary_clutter(rng):
    n, flen, mu = 20000, 8, 0.1
    ref = _cnoise(rng, n)
    srv = (0.9 * np.roll(ref, 1)).astype(np.complex64)
    out = np.asarray(nlms_filter(ref, srv, flen, mu, peek=2))
    tail = out[-4000:]
    head = srv[-4000:]
    supp = 10 * np.log10(np.mean(np.abs(tail) ** 2)
                         / np.mean(np.abs(head) ** 2))
    assert supp < -25


def test_nlms_warm_start(rng):
    n, flen, mu, peek = 400, 6, 0.05, 3
    ref = _cnoise(rng, n)
    srv = _cnoise(rng, n)
    _, taps = nlms_filter(ref, srv, flen, mu, peek=peek, return_filter=True)
    out2 = np.asarray(nlms_filter(ref, srv, flen, mu, peek=peek,
                                  initial_taps=np.asarray(taps)))
    assert out2.shape == (n,)


def gal_oracle_real(ref, srv, lattice_len, delay_line_len, mu1, mu2, peek=10):
    """Reference GAL-JPE semantics for real float signals."""
    n = len(ref)
    dl = delay_line_len
    f = np.zeros(dl)
    b = np.zeros(dl)
    k = np.zeros(dl)
    p = np.zeros(dl) + 1e-8
    h = np.zeros(dl)
    beta, gamma, delta = 0.9, 0.999, 1e-8
    out = np.zeros(n)
    for t in range(n - peek - 1):
        bo = b.copy()
        f[0] = ref[t + peek]
        b[0] = ref[t + peek]
        for m in range(1, lattice_len):
            f[m] = f[m - 1] - k[m] * bo[m - 1]
            b[m] = bo[m - 1] - k[m] * f[m - 1]
        for m in range(1, lattice_len):
            em = f[m - 1] ** 2 + bo[m - 1] ** 2
            p[m - 1] = beta * p[m - 1] + (1 - beta ** 2) * em
            grad = f[m - 1] * b[m] + bo[m - 1] * f[m]
            k[m] = k[m] + mu1 * grad / (p[m - 1] + 1e-10)
        if lattice_len < dl:
            b[lattice_len:] = bo[lattice_len - 1:-1]
        e = srv[t] - h @ b
        h = h + mu2 * e * b / (b @ b + 1e-10)
        out[t] = e
        mu1 = min(gamma * mu1 + delta * e ** 2, 5e-3)
    return out


@pytest.mark.parametrize("lattice,delay", [(6, 6), (4, 8)])
def test_gal_jpe_matches_real_oracle(rng, lattice, delay):
    n = 400
    ref = rng.standard_normal(n).astype(np.float32)
    srv = (0.5 * np.roll(ref, 1) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    got = np.asarray(gal_jpe(ref.astype(np.complex64), srv.astype(np.complex64),
                             lattice, delay, 1e-3, 1e-2))
    want = gal_oracle_real(ref.astype(np.float64), srv.astype(np.float64),
                           lattice, delay, 1e-3, 1e-2)
    assert np.max(np.abs(np.real(got) - want)) < 1e-2
    assert np.max(np.abs(np.imag(got))) < 1e-4


def test_gs_apply_large_filter_mxu_routing(monkeypatch, rng):
    import jax.numpy as jnp

    """m > 2048 pushes the G-S fft_len past dft_matmul's 4096 ceiling: the
    MXU routing must fall back to the FFT path instead of raising (the
    sliced-matmul branch is a small-transform optimisation only)."""
    from passiveradar_tpu.ops.clutter import (gs_apply, gs_generators,
                                              levinson_first_col)

    m = 2100
    seq = (rng.standard_normal(4 * m) + 1j * rng.standard_normal(4 * m)
           ).astype(np.complex64)
    ac = np.correlate(seq, seq, "full")[len(seq) - 1:len(seq) - 1 + m]
    ac[0] += 10.0 * abs(ac[0])          # well-conditioned PD system
    x = levinson_first_col(jnp.asarray(ac.astype(np.complex64))[None])[0]
    fft_len = 8192
    fx, fy, delta = gs_generators(x, fft_len)
    v = (rng.standard_normal(m) + 1j * rng.standard_normal(m)
         ).astype(np.complex64)

    want = np.asarray(gs_apply(fx, fy, delta, jnp.asarray(v)))
    monkeypatch.setenv("PASSIVERADAR_MXU_FFT", "1")
    got = np.asarray(gs_apply(fx, fy, delta, jnp.asarray(v)))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) < 1e-4 * scale
