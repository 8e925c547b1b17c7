"""2-D cell-averaging CFAR normalisation.

Reference semantics (target_detection.py:683-703): the frame is divided by
the wrap-padded 2-D convolution of itself with an fw×fw averaging kernel that
has a (gw+1)-wide guard hole. Implemented as a batched NCHW convolution so a
whole stack of frames runs in one XLA conv op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def cfar_kernel(fw: int, gw: int) -> np.ndarray:
    """The reference's CFAR averaging kernel (target_detection.py:694-697)."""
    t = np.ones((fw, fw)) / (fw ** 2 - gw ** 2)
    e1 = (fw - gw) // 2
    e2 = fw - e1 + 1
    t[e1:e2, e1:e2] = 0
    return t


@functools.partial(jax.jit, static_argnames=("fw", "gw"))
def _cfar_core(x: jnp.ndarray, fw: int, gw: int) -> jnp.ndarray:
    """x: (F, H, W) float32 stack of frames → CFAR ratio, same shape."""
    t = cfar_kernel(fw, gw)
    c = (fw - 1) // 2
    # scipy 'same'+'wrap' convolution: y[i,j] = Σ_{a,b} T[a,b]·X[(i+c-a)%H, ...]
    pl, pr = fw - 1 - c, c
    xp = jnp.pad(x, ((0, 0), (pl, pr), (pl, pr)), mode="wrap")
    rhs = jnp.asarray(t[::-1, ::-1].copy(), jnp.float32)[None, None]
    background = lax.conv_general_dilated(
        xp[:, None], rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,   # TPU default bf16-rounds f32 convs
        preferred_element_type=jnp.float32)[:, 0]
    norm = x / jnp.mean(jnp.abs(x), axis=(1, 2), keepdims=True)
    return norm / (background + 1e-10)


def cfar_2d(x: jnp.ndarray, fw: int, gw: int, thresh: float | None = None):
    """CFAR-normalise one frame (H, W) or a stack (F, H, W).

    With ``thresh`` set, returns the boolean detection map instead
    (reference target_detection.py:700-703).
    """
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    cr = _cfar_core(x, int(fw), int(gw))
    if squeeze:
        cr = cr[0]
    if thresh is None:
        return cr
    return cr > thresh
