"""Digital-phosphor persistence effect.

Reference semantics (plotting_tools.py:9-30): display frame k is the decayed
sum of the last ``hold`` frames, frame k-i weighted by decay**i. Instead of
re-summing ``hold`` frames per output frame, the whole stack is produced at
once as a single depthwise convolution along the time axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def persistence(x: jnp.ndarray, k: int, hold: int, decay: float) -> jnp.ndarray:
    """Single output frame k of the persistence effect.

    x: (H, W, F) frame stack (the reference's layout). Matches
    plotting_tools.persistence(X, k, hold, decay).
    """
    n = min(k + 1, hold)
    weights = decay ** jnp.arange(n, dtype=jnp.float32)
    sl = lax.dynamic_slice_in_dim(x, k - n + 1, n, axis=2)
    return jnp.tensordot(sl, weights[::-1], axes=([2], [0]))


@functools.partial(jax.jit, static_argnames=("hold",))
def persistence_stack(frames: jnp.ndarray, hold: int, decay) -> jnp.ndarray:
    """All persistence frames at once. frames: (F, H, W) → (F, H, W).

    out[k] = Σ_{i<min(k+1,hold)} frames[k-i]·decay^i — a causal depthwise
    convolution over the frame axis with kernel decay^i.
    """
    f, h, w = frames.shape
    kern = (jnp.asarray(decay, jnp.float32)
            ** jnp.arange(hold, dtype=jnp.float32))[::-1]
    x = frames.reshape(f, h * w).T[:, None, :]        # (HW, 1, F) — pixels batched
    x = jnp.pad(x, ((0, 0), (0, 0), (hold - 1, 0)))
    out = lax.conv_general_dilated(
        x, kern.reshape(1, 1, hold),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return out[:, 0, :].T.reshape(f, h, w)
