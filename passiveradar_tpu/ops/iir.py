"""IIR filtering as blocked parallel first-order scans (TPU-native filtfilt).

``scipy.signal.decimate``'s default anti-alias filter — which the reference's
channel-offset search uses via ``signal.decimate(s, nd)`` (reference
signal_utils.py:75-77) — is an order-8 Chebyshev-I IIR run forward-backward
(``filtfilt``): a doubly-recursive computation with no direct XLA analog.
The transfer function is split host-side into first-order partial fractions
(``scipy.signal.residuez``):

    H(z) = k0 + Σ_i r_i / (1 - p_i z⁻¹)

so each pole contributes the recurrence w_i[n] = p_i·w_i[n-1] + r_i·x[n].
Every recurrence runs through ONE primitive, ``_first_order_blocked``: the
signal is chunked into fixed blocks, a ``lax.scan`` of `block` steps runs
all (pole, chunk) lanes in parallel with zero chunk ICs, a tiny scan over
chunk count stitches the carries (chunk coupling decays as p^block), and a
host-precomputed float64 power table broadcasts the carry into each chunk.
This keeps both compile time (scan = one while loop, vs an
``associative_scan`` whose log-depth unrolling at multi-million-sample
lengths took >20 min to compile through the remote-compile relay) and
runtime (O(block) sequential steps over thousands of parallel lanes)
bounded at any signal length.

At narrow cutoffs (large q) the flat 8-pole split is ill-conditioned in
complex64, so the filter instead runs as the cheby1 biquad cascade with
each SECTION split into its own 2-pole partial fractions — per-section
residues stay O(1/(2·Im λ)), benign where the global split explodes.

filtfilt's edge handling is reproduced exactly (not approximately):

* odd-symmetric extension of 3·max(len(a), len(b)) = 27 samples per side
  (scipy's default padtype='odd'/padlen), and
* ``lfilter_zi`` steady-state initial conditions: zi is *defined* as the
  filter state for which a constant input yields a constant output, and the
  per-pole steady state for constant drive level u0 is w[-1] = u0/(1-p) in
  closed form — seeding the recurrence with it matches
  ``lfilter(b, a, x, zi=zi*x[0])`` exactly in exact arithmetic.

Verified against scipy.signal.decimate/filtfilt in tests/test_fir.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _spsignal

# scipy.signal.decimate's IIR design: cheby1(8, 0.05, 0.8/q)
_ORDER = 8
_PADLEN = 3 * (_ORDER + 1)   # scipy filtfilt default: 3*max(len(a), len(b))
# sequential steps per scan; chunk lanes run in parallel. 4096 keeps the
# carry coupling p^block below f32 round-off for every cheby1 pole radius
# that routes here while the scan stays a few ms
_BLOCK = 4096


def _first_order_blocked(u, p64, w0):
    """w[n] = p·w[n-1] + u[n] with w[-1] = w0, batched over poles.

    u: (P, n) complex64 drive; p64: (P,) float64-precision poles (host);
    w0: (P,) complex64 initial carries. Returns (P, n) complex64.
    """
    P, n = u.shape
    p = jnp.asarray(p64.astype(np.complex64))
    u = u.at[:, 0].add(p * w0)
    c = -(-n // _BLOCK)
    u = jnp.pad(u, ((0, 0), (0, c * _BLOCK - n)))
    uc = u.reshape(P, c, _BLOCK)

    def step(w, ui):
        w = w * p[:, None] + ui
        return w, w

    # (block, P, c) scan: all pole/chunk lanes advance together
    _, w_local = jax.lax.scan(step, jnp.zeros((P, c), u.dtype),
                              jnp.moveaxis(uc, 2, 0), unroll=4)
    w_local = jnp.moveaxis(w_local, 0, 2)            # (P, c, block)

    # cross-chunk carry: W_k = p^B · W_{k-1} + w_local[:, k, -1]
    pB = jnp.asarray((p64 ** _BLOCK).astype(np.complex64))

    def cstep(W, e):
        W = W * pB + e
        return W, W

    _, Wc = jax.lax.scan(cstep, w0 * pB * 0, w_local[:, :, -1].T)
    # w_prev[k] = exact end-of-chunk-(k-1) state; chunk 0's carry is w0,
    # already folded into u[:, 0] above, so its w_prev is zero. Later
    # chunks broadcast the stitched carry through a float64-exact power
    # table.
    w_prev = jnp.concatenate(
        [w0[None, :] * 0, Wc[:-1]], axis=0).T        # (P, c)
    pow64 = p64[:, None] ** np.arange(1, _BLOCK + 1)[None, :]
    powers = jnp.asarray(pow64.astype(np.complex64))  # (P, block)
    w = w_local + w_prev[:, :, None] * powers[:, None, :]
    return w.reshape(P, c * _BLOCK)[:, :n]


@functools.lru_cache(maxsize=32)
def _cheby1_partial_fractions(q: int):
    """Host-side float64 design: residues, poles, direct term for factor q."""
    b, a = _spsignal.cheby1(_ORDER, 0.05, 0.8 / q)
    r, p, k = _spsignal.residuez(b, a)
    k0 = complex(k[0]) if len(k) else 0.0
    return (np.asarray(r, np.complex128), np.asarray(p, np.complex128), k0)


@functools.lru_cache(maxsize=32)
def _cheby1_sections(q: int):
    """Biquad cascade, each section split into 2-pole partial fractions.

    Returns a tuple of (b_taps(3,), poles(2,), residues(2,)) per section,
    all float64/complex128 host arrays: section transfer =
    (b0 + b1 z⁻¹ + b2 z⁻²)·[ A/(1-λz⁻¹) + B/(1-μz⁻¹) ] with
    A = λ/(λ-μ), B = μ/(μ-λ).
    """
    sos = _spsignal.cheby1(_ORDER, 0.05, 0.8 / q, output="sos")
    out = []
    for b0, b1, b2, _, a1, a2 in sos:
        lam, mu = np.roots([1.0, a1, a2])
        a_r = lam / (lam - mu)
        b_r = mu / (mu - lam)
        out.append((np.array([b0, b1, b2], np.float64),
                    np.array([lam, mu], np.complex128),
                    np.array([a_r, b_r], np.complex128)))
    return tuple(out)


def _plfilter_flat(x, q: int):
    """lfilter(b, a, x, zi=lfilter_zi(b,a)*x[0]) via the flat 8-pole split."""
    r64, p64, k0 = _cheby1_partial_fractions(q)
    r = jnp.asarray(r64.astype(np.complex64))
    u = r[:, None] * x[None, :]
    # steady-state history for constant input x[0] (the lfilter_zi contract)
    w0 = x[0] * jnp.asarray((r64 / (1.0 - p64)).astype(np.complex64))
    w = _first_order_blocked(u, p64, w0)
    return np.complex64(k0) * x + jnp.sum(w, axis=0)


def _plfilter_cascade(x, q: int):
    """Same contract via the biquad cascade (well-conditioned at narrow
    cutoffs): each section's recursive part is its own 2-pole split, with
    constant-history ICs — upstream sections at steady state emit their
    constant level from sample 0, so each section's x[0] IS its history
    level."""
    y = x
    for b_t, p64, r64 in _cheby1_sections(q):
        x0 = y[0]
        ym1 = jnp.concatenate([jnp.full((1,), x0, y.dtype), y[:-1]])
        ym2 = jnp.concatenate([jnp.full((2,), x0, y.dtype), y[:-2]])
        f = (np.float32(b_t[0]) * y + np.float32(b_t[1]) * ym1
             + np.float32(b_t[2]) * ym2)
        r = jnp.asarray(r64.astype(np.complex64))
        u = r[:, None] * f[None, :]
        f_ss = x0 * np.complex64(b_t.sum())
        w0 = f_ss * jnp.asarray((r64 / (1.0 - p64)).astype(np.complex64))
        w = _first_order_blocked(u, p64, w0)
        y = jnp.sum(w, axis=0)
    return y


@functools.partial(jax.jit, static_argnames=("q",))
def iir_decimate(x: jnp.ndarray, q: int) -> jnp.ndarray:
    """scipy.signal.decimate(x, q) with the default IIR cheby1 zero-phase
    filter, as a jit-compiled blocked-parallel-scan program (see module
    docstring).

    Note scipy applies the 0.8·Nyquist filter even at q == 1 (pure
    filtering, no downsampling) — reproduced here because the reference's
    offset search calls it with nd=1 (reference main.py:54).
    """
    n = x.shape[0]
    if n <= _PADLEN:
        raise ValueError(f"input too short for filtfilt padlen {_PADLEN}")
    q = int(q)
    _, p64, _ = _cheby1_partial_fractions(q)
    # At narrow cutoffs the poles cluster near z = 1 and the flat
    # partial-fraction split becomes ill-conditioned in complex64
    # (measured: q=16 → 1e-1 relative error flat vs 6.5e-5 cascade;
    # q ≤ 8 → ~1e-6 either way). Gate on pole distance from z = 1; the
    # cascade still degrades gracefully at extreme factors (q=64 → ~5e-3,
    # the f32 pole-rounding bound — the reference never exceeds q = 4).
    flat = float(np.min(np.abs(1.0 - p64))) >= 0.1
    fwd = (lambda v: _plfilter_flat(v, q)) if flat else (
        lambda v: _plfilter_cascade(v, q))
    is_complex = jnp.iscomplexobj(x)
    xc = x.astype(jnp.complex64)
    # odd-symmetric extension (scipy.signal._arraytools.odd_ext)
    left = 2.0 * xc[0] - xc[_PADLEN:0:-1]
    right = 2.0 * xc[-1] - xc[-2:-(_PADLEN + 2):-1]
    ext = jnp.concatenate([left, xc, right])
    y = fwd(ext)
    y = jnp.flip(fwd(jnp.flip(y)))
    y = y[_PADLEN:_PADLEN + n]
    y = y[::q]
    if not is_complex:
        return jnp.real(y).astype(jnp.float32)
    return y.astype(jnp.complex64)
