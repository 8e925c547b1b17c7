"""Polyphase filter-bank channelizer for wideband illuminators.

Splits a wideband capture (e.g. an 8 MHz DVB-T-class band, or a band holding
several FM stations) into K critically-sampled channels in one MXU-friendly
operation, so each channel can run its own clutter-cancellation + CAF chain
(the per-illuminator / "expert" parallel axis of SURVEY §2.3).

Math: with a prototype lowpass h of length K·T (T taps per branch), channel k
of the critically-sampled PFB equals ``decimate-by-K(x · e^{-j2πkn/K})`` with
h as the anti-alias filter:

    y[m, k] = Σ_p e^{-j2πkp/K} Σ_t h[tK+p] · x[(m-t)K + p]
            = FFT_k( branch-filtered polyphase components )

i.e. per-branch FIR filtering (a small matmul) followed by a length-K FFT
across branches — both batched over the whole capture.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.ops.fir import design_lowpass


def design_prototype(n_channels: int, taps_per_branch: int = 12,
                     window=("kaiser", 9.0)) -> np.ndarray:
    """Prototype lowpass for a critically sampled K-channel PFB."""
    return design_lowpass(n_channels * taps_per_branch,
                          1.0 / n_channels, window)


@functools.partial(jax.jit, static_argnames=("n_channels", "taps_per_branch"))
def _channelize(x, proto, n_channels: int, taps_per_branch: int):
    k = n_channels
    t = taps_per_branch
    n = x.shape[0]
    m_out = n // k
    xp = x[:m_out * k]

    # polyphase components: branch p holds samples p, p+K, p+2K, ...
    xb = xp.reshape(m_out, k)                       # [m, p] = x[mK + p]
    # branch filters: h_p[t'] = h[t'K + p]
    hb = proto.reshape(t, k)                        # [t', p]

    # y_branch[m, p] = Σ_t' h_p[t'] x[(m-t')K + p]  — per-branch causal FIR
    # as an accumulated chain of shifted elementwise multiplies: XLA fuses
    # the t' terms into ~one pass over the signal, where the former
    # stack+einsum materialised a (m, t', K) copy of the whole capture
    # (measured 8.6x slower); elementwise multiplies are full f32, so no
    # matmul precision pin is needed here
    hbf = hb.astype(jnp.float32)
    yb = xb * hbf[0]
    for i in range(1, t):
        yb = yb + jnp.pad(xb, ((i, 0), (0, 0)))[:m_out] * hbf[i]

    # channel k (centred at +k·fs/K): Σ_p e^{-j2πkp/K} y_branch[m, p]
    return jnp.fft.fft(yb, axis=1).astype(jnp.complex64)


def channelize(x: jnp.ndarray, n_channels: int, taps_per_branch: int = 12,
               window=("kaiser", 9.0)) -> jnp.ndarray:
    """Split x into K critically-sampled channels.

    Returns (N//K, K) complex64; channel k is centred at +k·fs/K (negative
    frequencies at k > K/2, FFT ordering), sampled at fs/K.
    """
    proto = design_prototype(n_channels, taps_per_branch, window)
    return _channelize(jnp.asarray(x), jnp.asarray(proto, jnp.float32),
                       int(n_channels), int(taps_per_branch))


def channelize_pair(ref: jnp.ndarray, srv: jnp.ndarray, n_channels: int,
                    **kw):
    """Channelize both radar channels identically (phase-matched banks)."""
    return (channelize(ref, n_channels, **kw),
            channelize(srv, n_channels, **kw))
