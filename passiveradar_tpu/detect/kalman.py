"""Kalman filtering for radar target tracks.

Functional float32 re-implementation of the reference's structured-dtype
Kalman machinery (target_detection.py:9-148). The filter state is a pytree
(dict of arrays) so it vmaps over track tables and scans over frames; the
reference's float64 numpy records become float32 on TPU (the 4-state filters
are numerically benign at single precision).

The two-transition-model quirk is deliberate and preserved: the state vector
advances with F1 (which couples range-rate to Doppler) while the covariance
advances with F2 (reference target_detection.py:40-42, 375-382).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Default filter matrices (reference target_detection.py:375-382)
F1_DEFAULT = np.array([[1, 0, -0.003, 0], [0, 0, -0.003, -0.003],
                       [0, 0, 1, 1], [0, 0, 0, 1]], np.float32)
F2_DEFAULT = np.array([[1, 1, 0, 0], [0, 1, 0, 0],
                       [0, 0, 1, 1], [0, 0, 0, 1]], np.float32)
H_DEFAULT = np.array([[1, 0, 0, 0], [0, 0, 1, 0]], np.float32)


def default_kalman_state(r=0.0, f=0.0):
    """Fresh track filter state at measurement (r, f)
    (reference initialize_track, target_detection.py:375-382)."""
    return dict(
        x=jnp.asarray(jnp.stack([jnp.asarray(r, jnp.float32), 0.0,
                                 jnp.asarray(f, jnp.float32), -1.0])),
        P=jnp.asarray(np.diag([5.0, 0.0225, 0.04, 0.1]).astype(np.float32)),
        F1=jnp.asarray(F1_DEFAULT),
        F2=jnp.asarray(F2_DEFAULT),
        Q=jnp.asarray(np.diag([4.0, 0.03, 0.2, 0.08]).astype(np.float32)),
        H=jnp.asarray(H_DEFAULT),
        R=jnp.asarray(np.diag([5.0, 2.0]).astype(np.float32)),
        S=jnp.asarray(np.eye(2, dtype=np.float32)),
    )


def _inv2(m):
    """Explicit 2x2 inverse (cheaper and more stable than general solve)."""
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    inv = jnp.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det
    return inv


def _advance(st, r_scale):
    x = st["F1"] @ st["x"]
    p = st["F2"] @ st["P"] @ st["F2"].T + st["Q"]
    s = st["H"] @ p @ st["H"].T + st["R"] * r_scale
    return x, p, s


def _measurement_update(st, x, p, s, z):
    k = p @ st["H"].T @ _inv2(s)
    y = z - st["H"] @ x
    x = x + k @ y
    p = (jnp.eye(4, dtype=p.dtype) - k @ st["H"]) @ p
    return x, p


def kalman_update(measurement, state):
    """Textbook update (reference target_detection.py:19-61)."""
    x, p, s = _advance(state, 1.0)
    x, p = _measurement_update(state, x, p, s, measurement)
    new = dict(state, x=x, P=p, S=s)
    return state["H"] @ x, new


def adaptive_kalman_update(measurement, last_measurement, state):
    """Update with ad-hoc adaptive R scaling by the squared distance between
    consecutive measurements (reference target_detection.py:63-114)."""
    d = measurement - last_measurement
    r_scale = d[0] ** 2 + d[1] ** 2
    x, p, s = _advance(state, r_scale)
    x, p = _measurement_update(state, x, p, s, measurement)
    new = dict(state, x=x, P=p, S=s)
    return state["H"] @ x, new


def kalman_extrapolate(state):
    """Predict-only step for coasting tracks (reference target_detection.py:116-148)."""
    x, p, s = _advance(state, 1.0)
    new = dict(state, x=x, P=p, S=s)
    return state["H"] @ x, new
