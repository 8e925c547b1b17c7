"""Wideband / multi-illuminator processing.

For wideband captures (DVB-T-class bands, or a band spanning several FM
stations) the capture is first split by the polyphase channelizer
(ops/channelizer.py); each channel then runs its own clutter-cancellation +
CAF chain, vmapped over the channel axis — the per-illuminator parallel axis.
On a pod, channels (or channel groups) map naturally onto mesh devices.

This is a capability extension over the reference (which processes one FM
channel per run); the per-channel chain itself is the standard pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from passiveradar_tpu.ops.caf import fast_xambg, resolve_window
from passiveradar_tpu.ops.channelizer import channelize_pair
from passiveradar_tpu.ops.clutter import ls_filter_multiple


@functools.partial(
    jax.jit, static_argnames=("n_channels", "range_bins", "freq_bins",
                              "filter_len", "sample_rate", "doppler_bins",
                              "window"))
def process_wideband_frame(ref: jnp.ndarray, srv: jnp.ndarray,
                           n_channels: int, range_bins: int, freq_bins: int,
                           filter_len: int, sample_rate: float,
                           doppler_bins: tuple = (0,),
                           window=None) -> jnp.ndarray:
    """One wideband CPI → per-channel range-Doppler maps (K, nf, R+1).

    ref/srv: (N,) wideband complex64 at ``sample_rate``. Each of the K
    critically-sampled channels is clutter-cancelled against its own
    reference channel and correlated into a CAF frame. The per-channel
    sample count N//K must be divisible by freq_bins.
    """
    refc, srvc = channelize_pair(ref, srv, n_channels)
    m = refc.shape[0]
    ch_rate = float(sample_rate) / n_channels
    usable = (m // freq_bins) * freq_bins
    refc = refc[:usable].T          # (K, M)
    srvc = srvc[:usable].T
    win = resolve_window(window, usable)
    win_j = None if win is None else jnp.asarray(win)

    def per_channel(r, s):
        clean = ls_filter_multiple(r, s, filter_len, ch_rate, doppler_bins)
        return fast_xambg(r, clean, range_bins, freq_bins, window=win_j)

    return jax.vmap(per_channel)(refc, srvc)


def integrate_channels(maps: jnp.ndarray) -> jnp.ndarray:
    """Noncoherent multi-illuminator integration: Σ_k |CAF_k| over channels.

    Valid when the channels share the bistatic geometry (same transmitter
    site); range cells are in per-channel sample units, identical across
    channels because all channels share one sample rate.
    """
    return jnp.sum(jnp.abs(maps), axis=0)
