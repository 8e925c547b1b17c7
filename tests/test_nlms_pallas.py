"""Pallas NLMS kernel vs the exact lax.scan NLMS (interpret mode on CPU)."""

import numpy as np

from passiveradar_tpu.ops.clutter import nlms_filter
from passiveradar_tpu.ops.nlms_pallas import nlms_filter_pallas


def _cnoise(rng, shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_pallas_nlms_matches_scan_single(rng):
    n, flen, mu, peek = 700, 12, 0.05, 4
    ref = _cnoise(rng, n)
    srv = (0.5 * np.roll(ref, 2) + 0.1 * _cnoise(rng, n)).astype(np.complex64)
    got, gtaps = nlms_filter_pallas(ref, srv, flen, mu, peek=peek, block=256,
                                    return_filter=True, interpret=True)
    want, wtaps = nlms_filter(ref, srv, flen, mu, peek=peek, return_filter=True)
    scale = np.max(np.abs(np.asarray(want)))
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) < 2e-3 * scale
    assert np.max(np.abs(np.asarray(gtaps) - np.asarray(wtaps))) < 2e-3


def test_pallas_nlms_batched(rng):
    b, n, flen, mu = 3, 520, 8, 0.08
    ref = _cnoise(rng, (b, n))
    srv = (0.7 * np.roll(ref, 1, axis=1)
           + 0.05 * _cnoise(rng, (b, n))).astype(np.complex64)
    got = np.asarray(nlms_filter_pallas(ref, srv, flen, mu, block=256,
                                        interpret=True))
    for i in range(b):
        want = np.asarray(nlms_filter(ref[i], srv[i], flen, mu))
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got[i] - want)) < 2e-3 * scale


def test_pallas_nlms_zero_window_is_finite(rng):
    """All-zero windows must not poison the taps (divergence from the
    reference's NaN behavior, documented in the module)."""
    n, flen, mu = 600, 8, 0.1
    ref = _cnoise(rng, n)
    ref[:200] = 0  # zero region → zero windows early on
    srv = (0.5 * np.roll(ref, 1) + 0.01 * _cnoise(rng, n)).astype(np.complex64)
    out = np.asarray(nlms_filter_pallas(ref, srv, flen, mu, block=256,
                                        interpret=True))
    assert np.all(np.isfinite(out))
