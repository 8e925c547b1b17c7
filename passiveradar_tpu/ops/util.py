"""Small signal utilities shared across the pipeline."""

from __future__ import annotations

import jax.numpy as jnp


def deinterleave_iq(x: jnp.ndarray) -> jnp.ndarray:
    """Convert interleaved real IQ samples [I0, Q0, I1, Q1, ...] to complex64.

    Reproduces the reference's indexing (signal_utils.py:19-22) including its
    ``[0:-1:2]`` quirk, which drops the final even-indexed sample; for
    even-length inputs this yields exactly len(x)//2 complex samples and the
    reference behavior is identical.
    """
    i = x[0:-1:2]
    q = x[1::2]
    n = min(i.shape[0], q.shape[0])
    return (i[:n] + 1j * q[:n]).astype(jnp.complex64)


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize an array to unit mean magnitude (signal_utils.py:7-9)."""
    return x / jnp.mean(jnp.abs(x))


def shift(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Shift x by n samples, zero-filling the vacated edge
    (signal_utils.py:34-47)."""
    n = int(n)
    if n == 0:
        return jnp.asarray(x)
    if n > 0:
        return jnp.concatenate([jnp.zeros(n, x.dtype), x[:-n]])
    return jnp.concatenate([x[-n:], jnp.zeros(-n, x.dtype)])
