"""Small signal utilities shared across the pipeline."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_c2pair = jax.jit(lambda x: jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1))


def to_host_complex(x) -> np.ndarray:
    """Fetch a complex device array to host numpy.

    Some remote backends cannot transfer complex dtypes device→host; the
    value is split into a float32 re/im pair on device (jitted) and
    reinterpreted on the host — bit-identical to a direct fetch.
    """
    if isinstance(x, np.ndarray):
        return x
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    pair = np.ascontiguousarray(np.asarray(_c2pair(x), np.float32))
    return pair.view(np.complex64)[..., 0]


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
