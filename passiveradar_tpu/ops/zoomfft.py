"""Partial/sparse FFT primitives (Cooley–Tukey split, "zoom FFT" style).

The clutter-cancellation loop only ever needs the first m ≈ 185 lags of its
N-point inverse transforms, and only ever transforms tap vectors with m
nonzero entries — a full N-point FFT wastes a factor ~log(N)/log(block) of
work and, more importantly on TPU, a full HBM pass. Splitting N = rows·block
(k = d·rows + c) turns each case into one batched block-sized FFT plus a
small twiddle contraction:

  ifft_N(x)[j]  = (block/N)·Σ_c e^{+2πijc/N} · IFFT_block(x.reshape(block, rows))[j, c]
  fft_N(s)[d·rows + c] = FFT_block( s[j]·e^{-2πijc/N}, over j )[c, d]

Both are exact (they are just a radix decomposition of the DFT) and verified
against jnp.fft in the tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.ops.mxufft import dft_matmul, fft_auto, ifft_auto, use_mxu


def _pick_block(m: int) -> int:
    b = 1
    while b < m:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("m_out", "block"))
def partial_ifft(x: jnp.ndarray, m_out: int, block: int | None = None):
    """First ``m_out`` outputs of ifft(x) along the last axis.

    Requires len(x) divisible by the block (any power of two ≥ m_out works;
    default the smallest).
    """
    n = x.shape[-1]
    if block is None:
        block = _pick_block(m_out)
    rows = n // block
    if rows * block != n:
        raise ValueError(f"{n} not divisible by block {block}")
    xr = x.reshape(x.shape[:-1] + (block, rows))   # [.., d, c] = x[d·rows + c]
    if use_mxu():
        # only m_out of the block outputs are kept: a sliced DFT matmul does
        # m_out/block of the work on the MXU instead of a full VPU FFT
        y = dft_matmul(xr, axis=-2, inverse=True, out_len=m_out)
    else:
        y = ifft_auto(xr, axis=-2)[..., :m_out, :]  # IFFT over d
    j = np.arange(m_out)[:, None]
    c = np.arange(rows)[None, :]
    tw = jnp.asarray(np.exp(2j * np.pi * j * c / n).astype(np.complex64))
    # scale: ifft_N carries 1/N = (1/block)·(1/rows); IFFT_block supplied
    # 1/block, the Σ_c needs the remaining 1/rows
    return (jnp.sum(tw * y, axis=-1) / rows).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("n", "block"))
def sparse_fft(s: jnp.ndarray, n: int, block: int | None = None):
    """Full n-point FFT of a signal whose support is the first len(s) samples.

    len(s) must be ≤ block (a power of two dividing n).
    """
    m = s.shape[-1]
    if block is None:
        block = _pick_block(m)
    rows = n // block
    if rows * block != n:
        raise ValueError(f"{n} not divisible by block {block}")
    j = np.arange(m)[None, :]
    c = np.arange(rows)[:, None]
    tw = jnp.asarray(np.exp(-2j * np.pi * j * c / n).astype(np.complex64))
    z = tw * s[..., None, :]                        # (.., rows, m)
    if use_mxu():
        # m-sample support: the sliced DFT matmul reads only the m nonzero
        # inputs (m/block of the full transform's work), no padding pass
        f = dft_matmul(z, axis=-1, n=block)         # (.., rows, block) over j
    else:
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, block - m)])
        f = fft_auto(z, axis=-1)                    # (.., rows, block) over j
    # F[d·rows + c] = f[c, d]
    out = jnp.swapaxes(f, -1, -2)                   # (.., block, rows)
    return out.reshape(s.shape[:-1] + (n,)).astype(jnp.complex64)
