"""Candidate-measurement extraction from range-Doppler frames.

Fixed-shape re-architecture of the reference's percentile thresholding
(target_detection.py:164-229): instead of a data-dependent nonzero() over
pixels above the 99.8th percentile, a static top-k is taken and masked by the
same percentile threshold — identical candidates in strength-sorted order,
but jit/vmap/scan-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k_max",))
def get_measurements(frame: jnp.ndarray, frame_extent, k_max: int = 384,
                     percentile: float = 99.8):
    """Extract strength-sorted candidate (range, Doppler, strength) triples.

    frame: (num_doppler, num_range) CFAR map in the raw pipeline orientation.
    frame_extent: (doppler_extent_hz, range_extent_km) — reference order.

    Matches the reference's geometry: the frame is normalised, reoriented with
    fliplr(frame.T), its persistent-clutter zones zeroed (8 edge range rows
    and ±4 Doppler columns around zero), thresholded at the 99.8th percentile
    of the (zeroed) frame. Note the reference ignores its ``p`` argument and
    hard-codes 99.8 (target_detection.py:211); here the parameter is honoured
    with the same default.

    Returns (cand, valid): cand is (3, k_max) rows [range_km, doppler_hz,
    strength]; valid marks entries above threshold.
    """
    doppler_extent, range_extent = frame_extent[0], frame_extent[1]
    nf, nr = frame.shape

    rpts = jnp.linspace(range_extent, 0.0, nr)
    dpts = jnp.linspace(-doppler_extent, doppler_extent, nf)

    x = frame / jnp.mean(jnp.abs(frame))
    x = jnp.fliplr(x.T)                      # (range rows, doppler cols)
    x = x.at[:8, :].set(0.0)
    x = x.at[-8:, :].set(0.0)
    dc = nf // 2
    x = x.at[:, dc - 4:dc + 4].set(0.0)

    threshold = jnp.percentile(x, percentile)

    strength, flat = jax.lax.top_k(x.reshape(-1), k_max)
    row = flat // nf                         # range row
    col = flat % nf                          # doppler col
    cand_range = rpts[row]
    cand_doppler = dpts[col]
    valid = strength >= threshold

    cand = jnp.stack([cand_range.astype(jnp.float32),
                      cand_doppler.astype(jnp.float32),
                      strength.astype(jnp.float32)])
    return cand, valid
