"""FFT-domain cross-correlation and channel time-offset estimation.

Replaces the reference's scipy.signal.correlate calls (signal_utils.py:29-32,
73-78) with a single batched FFT formulation; the 10M-lag one-shot offset
search in particular becomes three large power-of-two FFTs on device.

Lag convention (matches the reference's ``xcorr(s1, s2, nlead, nlag)``, which
is ``correlate(s1, pad(s2, (nlag, nlead)), 'valid')``):

    out[j] = sum_t s1[t] * conj(s2[t - (j - nlead)]),   j = 0 .. nlag+nlead
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.ops.fir import fir_decimate


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("nlead", "nlag"))
def xcorr(s1: jnp.ndarray, s2: jnp.ndarray, nlead: int, nlag: int) -> jnp.ndarray:
    """Cross-correlate s1 against delayed copies of s2 (see module docstring)."""
    n = s1.shape[0]
    fft_len = _next_pow2(n + max(nlag, nlead) + 1)
    f1 = jnp.fft.fft(s1, fft_len)
    f2 = jnp.fft.fft(s2, fft_len)
    full = jnp.fft.ifft(f1 * jnp.conj(f2))
    # lag λ = j - nlead lives at circular index λ mod fft_len
    idx = np.mod(np.arange(-nlead, nlag + 1), fft_len)
    out = full[jnp.asarray(idx)]
    if jnp.iscomplexobj(s1) or jnp.iscomplexobj(s2):
        return out.astype(jnp.complex64)
    return jnp.real(out).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("nd", "nl", "antialias"))
def _offset_core(p1, p2, nd: int, nl: int, antialias: str = "iir"):
    """Offset argmax from float32 IQ-pair inputs (n, 2).

    Everything — complexification, decimation, correlation, argmax — runs in
    one compiled program: remote backends may support complex dtypes only
    inside compiled code and may not transfer them at all.
    """
    b1 = jax.lax.complex(p1[:, 0], p1[:, 1])
    b2 = jax.lax.complex(p2[:, 0], p2[:, 1])
    if antialias == "iir":
        # scipy.signal.decimate's default cheby1 filtfilt, exactly as the
        # reference calls it (signal_utils.py:75-77) — including the pure
        # 0.8-Nyquist filtering pass at nd == 1 (main.py:54 uses nd=1).
        # TPU-native: per-pole/biquad associative scans (ops/iir.py).
        from passiveradar_tpu.ops.iir import iir_decimate
        b1 = iir_decimate(b1, nd)
        b2 = iir_decimate(b2, nd)
    elif nd > 1:
        b1 = fir_decimate(b1, nd)
        b2 = fir_decimate(b2, nd)
    m = b1.shape[0]
    nl = min(nl, m)
    fft_len = _next_pow2(m + nl + 1)
    f1 = jnp.fft.fft(b1, fft_len)
    f2 = jnp.fft.fft(b2, fft_len)
    full = jnp.fft.ifft(f1 * jnp.conj(f2))
    idx = np.mod(np.arange(-nl, nl + 1), fft_len)
    return jnp.argmax(jnp.abs(full[jnp.asarray(idx)]))


def find_channel_offset(s1: jnp.ndarray, s2: jnp.ndarray, nd: int,
                        nl: int, max_fft: int = 1 << 22,
                        antialias: str = "iir") -> int:
    """Estimate the constant sample offset between two channels.

    Reference semantics (signal_utils.py:73-78): decimate both channels by
    ``nd`` with scipy.signal.decimate's default zero-phase IIR cheby1
    filter (run here as parallel per-pole associative scans, ops/iir.py —
    including the pure filtering pass at nd == 1), take |xcorr| over lags
    -nl..+nl, return (argmax - nl) * nd. ``antialias="fir"`` selects the
    20·q-tap FIR decimator instead (cheaper; same argmax). Divergence:
    searches whose FFT would exceed ``max_fft`` points (e.g. the
    reference's one-shot ±5M-lag correlation, main.py:54) run as a coarse
    FIR-decimated pass refined by a narrow exact pass at the caller's nd
    and filter — same answer, bounded memory.
    """
    # All slicing/assembly happens host-side in numpy: some remote backends
    # implement complex dtypes only inside compiled programs, so eager
    # complex ops must never touch the device (jitted kernels are fine).
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    nd = int(nd)
    n = int(s1.shape[0])
    needed = _next_pow2(n // max(nd, 1) + int(nl) + 1)
    if needed > max_fft:
        # decimate enough that the coarse search fits, then refine
        extra = 1
        while _next_pow2(n // (nd * extra) + int(nl) // extra + 1) > max_fft:
            extra *= 2
        # internal coarse pass: FIR anti-alias regardless of the caller's
        # choice (robust and cheap at the large nd·extra factor; the refine
        # below re-runs at the caller's nd and filter, so the result keeps
        # the requested semantics)
        coarse = find_channel_offset(s1, s2, nd * extra, int(nl) // extra,
                                     max_fft, antialias="fir")
        r1, r2 = apply_offset(s1, s2, coarse)
        # refine on a truncated slice — only a ±4·nd·extra window of lags is
        # left, so a bounded stretch of signal suffices
        window = 4 * nd * extra
        keep = min(int(r1.shape[0]), max(8 * window, (max_fft // 2) * nd))
        fine = find_channel_offset(r1[:keep], r2[:keep], nd,
                                   max(window // nd, 1), max_fft,
                                   antialias=antialias)
        return coarse + fine

    def pairs(x):
        x = np.ascontiguousarray(x.astype(np.complex64, copy=False))
        return x.view(np.float32).reshape(-1, 2)

    nl = int(min(nl, s1.shape[0] // max(nd, 1)))
    # out[j] = sum b1[t] conj(b2[t - (j - nl)]): argmax j means b2 lags b1 by
    # (j - nl) samples, matching the reference's (argmax - nl) * nd.
    return int(_offset_core(pairs(s1), pairs(s2), nd, nl,
                            antialias=antialias)) * nd - nl * nd


def offset_compensation(x1: jnp.ndarray, x2: jnp.ndarray, ns: int, ndec: int,
                        nlag: int = 2000) -> jnp.ndarray:
    """Find and correct a constant time offset between two signals
    (reference signal_utils.py:49-71): estimate the offset from the first
    ``ns`` samples via decimated cross-correlation, then shift ``x2`` into
    alignment with zero-filled edges."""
    from passiveradar_tpu.ops.util import shift

    os_ = find_channel_offset(x1[:int(ns)], x2[:int(ns)], ndec, nlag)
    if os_ == 0:
        return jnp.asarray(x2)
    return shift(jnp.asarray(x2), os_)


def channel_preprocessing(sig: jnp.ndarray, dec: int, fc: float,
                          fs: float) -> jnp.ndarray:
    """Deinterleave, tune to the channel frequency and decimate
    (reference signal_utils.py:80-85)."""
    from passiveradar_tpu.ops.fir import fir_decimate
    from passiveradar_tpu.ops.mixer import frequency_shift
    from passiveradar_tpu.ops.util import deinterleave_iq

    iq = deinterleave_iq(jnp.asarray(sig))
    return fir_decimate(frequency_shift(iq, fc, fs), dec)


def apply_offset(ref, srv, offset: int):
    """Trim two channels so they align given ``offset`` = find_channel_offset.

    Matches the slicing in the reference orchestration (main.py:67-72,87-102):
    positive offset drops the first ``offset`` samples of ref and the last of
    srv, negative offset the converse. Works on numpy or jax arrays (pure
    slicing — on numpy inputs nothing touches the device).
    """
    if offset > 0:
        return ref[offset:], srv[:-offset]
    if offset < 0:
        return ref[:offset], srv[-offset:]
    return ref, srv
