"""FIR filtering, polyphase rational resampling and decimation.

TPU-native reimplementation of the resampling semantics the reference gets
from scipy's compiled ``upfirdn`` core (reference: signal_utils.py:11-17 via
``scipy.signal.resample_poly`` / ``scipy.signal.decimate``). Filter *design*
(tap computation) is static host-side setup using scipy; the *compute* path
reformulates upfirdn as a phase-grouped matmul (see _polyphase_bank) so the
resampling runs on the MXU.

The output-sample alignment, edge handling (including the ``padtype='line'``
linear-trend extension) and tap normalisation reproduce scipy's behavior
sample-for-sample, because the reference pipeline's per-chunk resampling edge
effects flow into the final range-Doppler maps.
"""

from __future__ import annotations

import functools
import hashlib
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _spsignal


def design_lowpass(numtaps: int, cutoff: float, window) -> np.ndarray:
    """Windowed-sinc lowpass design (host-side, static).

    Thin wrapper over ``scipy.signal.firwin``; cutoff is in Nyquist units as
    in scipy. Returns float64 taps.
    """
    return _spsignal.firwin(numtaps, cutoff, window=window)


def _upfirdn_output_len(len_h: int, n_in: int, up: int, down: int) -> int:
    """Number of output samples of upfirdn (full conv of dilated input)."""
    return ((n_in - 1) * up + len_h - 1) // down + 1


def _as_planes(x: jnp.ndarray):
    """Split a 1-D (possibly complex) array into real rows; returns (planes, is_complex)."""
    if jnp.iscomplexobj(x):
        return jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32), True
    return x.astype(jnp.float32)[None, :], False


def _from_planes(p: jnp.ndarray, is_complex: bool) -> jnp.ndarray:
    if is_complex:
        return jax.lax.complex(p[0], p[1]).astype(jnp.complex64)
    return p[0]


@functools.lru_cache(maxsize=256)
def _polyphase_bank(h_key, up: int, down: int):
    """Phase-grouped tap bank for the matmul formulation of upfirdn.

    upfirdn's output satisfies

        out[g*up + p] = Σ_wi B[p, wi] · x[g*down + q_min + wi],
        B[p, wi] = h[p*down - (wi + q_min)*up]   (0 where out of range)

    i.e. the tap pattern depends only on the output phase p, never on the
    group index g — so the whole resampling is one (G, W) × (W, up) matmul
    on the MXU instead of a dilated convolution.
    """
    h = _TAP_CACHE[h_key]
    len_h = len(h)
    # valid q for phase p: 0 <= p*down - q*up < len_h
    q_min = min((p * down - (len_h - 1)) // up for p in range(up))
    q_max = max((p * down) // up for p in range(up))
    w = q_max - q_min + 1
    bank = np.zeros((up, w), dtype=np.float32)
    for p in range(up):
        for qi in range(w):
            j = p * down - (qi + q_min) * up
            if 0 <= j < len_h:
                bank[p, qi] = h[j]
    return bank, q_min, w


def _upfirdn_matmul(planes: jnp.ndarray, h_key, up: int, down: int) -> jnp.ndarray:
    """upfirdn core as polyphase row-block matmuls. planes: (B, n) real rows.

    out[g·up+p] = Σ_wi B[p, wi]·xp[g·down + wi] is evaluated as
    Σ_i (row-block g+i of the reshaped input) @ Bᵢᵀ with Bᵢ the i-th
    down-sized column slab of the bank — the input is only ever *reshaped*
    (never materialised as an im2col window matrix).
    """
    h = _TAP_CACHE[h_key]
    n_in = planes.shape[1]
    n_out = _upfirdn_output_len(len(h), n_in, up, down)
    bank, q_min, w = _polyphase_bank(h_key, up, down)
    groups = -(-n_out // up)
    n_slabs = -(-w // down)
    # x index of window element (g, wi) is g*down + q_min + wi; q_min <= 0
    # always (the p=0 phase reaches back len_h-1 taps), so left-padding by
    # -q_min aligns window row g with padded index g*down.
    pad_l = -q_min
    assert q_min <= 0
    total = (groups + n_slabs) * down
    pad_r = max(0, total - (n_in + pad_l))
    xp = jnp.pad(planes, ((0, 0), (pad_l, pad_r)))[:, :total]
    r = xp.reshape(planes.shape[0], groups + n_slabs, down)
    bank_pad = np.zeros((up, n_slabs * down), np.float32)
    bank_pad[:, :w] = bank
    out = None
    for i in range(n_slabs):
        slab = jnp.asarray(bank_pad[:, i * down:(i + 1) * down])
        part = jnp.einsum("bgc,pc->bgp", r[:, i:i + groups], slab,
                          preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out.reshape(planes.shape[0], groups * up)[:, :n_out]


@functools.partial(jax.jit, static_argnames=("h_key", "up", "down", "mode"))
def _upfirdn_jit(x, h_key, up, down, mode):
    h = _TAP_CACHE[h_key]
    planes, is_c = _as_planes(x)
    n_in = x.shape[0]
    if mode == "line":
        # Linear-trend extension defined by the first and last samples
        # (scipy upfirdn mode='line'): slope = (x[-1] - x[0]) / (n - 1).
        need = -(-len(h) // up)                  # ceil(len_h / up)
        ext = down * (-(-need // down))          # multiple of down >= need
        slope = (planes[:, -1] - planes[:, 0]) / max(n_in - 1, 1)
        kl = jnp.arange(ext, 0, -1, dtype=jnp.float32)
        kr = jnp.arange(1, ext + 1, dtype=jnp.float32)
        left = planes[:, :1] - slope[:, None] * kl[None, :]
        right = planes[:, -1:] + slope[:, None] * kr[None, :]
        planes = jnp.concatenate([left, planes, right], axis=1)
        out = _upfirdn_matmul(planes, h_key, up, down)
        shift = ext * up // down
        n_out = _upfirdn_output_len(len(h), n_in, up, down)
        out = out[:, shift:shift + n_out]
    else:
        out = _upfirdn_matmul(planes, h_key, up, down)
    return _from_planes(out, is_c)


# Taps are static design-time constants; they are keyed into a host-side cache
# so the jit cache sees a hashable key instead of an array.
_TAP_CACHE: dict = {}


def _tap_key(h: np.ndarray) -> tuple:
    h = np.ascontiguousarray(h, dtype=np.float64)
    key = (len(h), hashlib.sha1(h.tobytes()).hexdigest())
    _TAP_CACHE[key] = h
    return key


def upfirdn(h: np.ndarray, x: jnp.ndarray, up: int = 1, down: int = 1,
            mode: str = "constant") -> jnp.ndarray:
    """Upsample by ``up``, FIR filter with ``h``, downsample by ``down``.

    Matches scipy.signal.upfirdn for 1-D input with modes 'constant' (zero)
    and 'line'. ``h`` must be a host-side numpy array (static).
    """
    return _upfirdn_jit(x, _tap_key(np.asarray(h)), int(up), int(down), mode)


def resample_poly(x: jnp.ndarray, up: int, down: int,
                  window=("kaiser", 5.0), padtype: str = "constant") -> jnp.ndarray:
    """Rational polyphase resampling, matching scipy.signal.resample_poly.

    Used for the IF-rate conversion stage (reference: signal_utils.py:15-17,
    main.py:151-166 — called per chunk with padtype='line').
    """
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        return jnp.asarray(x)
    n_in = x.shape[0]
    n_out = n_in * up // down + bool((n_in * up) % down)

    if isinstance(window, np.ndarray):
        h = np.array(window, dtype=np.float64)
        half_len = (len(h) - 1) // 2
    else:
        max_rate = max(up, down)
        half_len = 10 * max_rate
        h = design_lowpass(2 * half_len + 1, 1.0 / max_rate, window)
    h = h * up

    # Zero-pad the taps so output samples land at the centre of the filter
    # (same alignment arithmetic as scipy.signal.resample_poly).
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while _upfirdn_output_len(len(h) + n_pre_pad + n_post_pad, n_in,
                              up, down) < n_out + n_pre_remove:
        n_post_pad += 1
    h_pad = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])

    y = upfirdn(h_pad, x, up, down, mode=padtype)
    return y[n_pre_remove:n_pre_remove + n_out]


def fir_decimate(x: jnp.ndarray, q: int, numtaps: int | None = None,
                 window: str = "hamming") -> jnp.ndarray:
    """Zero-phase FIR decimation by integer factor ``q``.

    Matches scipy.signal.decimate(x, q, n=numtaps, ftype='fir',
    zero_phase=True), which the reference uses with n = 20*q
    (reference: signal_utils.py:11-13). numtaps here is the filter *order* n;
    the filter has numtaps+1 taps, default 20*q.
    """
    q = int(q)
    if q == 1:
        return jnp.asarray(x)
    if numtaps is None:
        numtaps = 20 * q
    taps = design_lowpass(numtaps + 1, 1.0 / q, window)
    return resample_poly(x, 1, q, window=taps)


def decimate_taps(x: jnp.ndarray, taps: np.ndarray, q: int) -> jnp.ndarray:
    """Zero-phase decimation with explicit FIR taps.

    Matches scipy.signal.decimate(x, q, ftype=dlti(taps, 1)) for FIR taps —
    the code path the CAF's Doppler-decimation uses in the reference
    (range_doppler_processing.py:69-86).
    """
    return resample_poly(x, 1, int(q), window=np.asarray(taps, dtype=np.float64))
