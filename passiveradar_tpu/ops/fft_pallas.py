"""Fused Pallas four-step FFT: one kernel, one HBM round-trip.

The XLA four-step formulation (ops/mxufft.py) runs each stage — DFT-R
matmul, twiddle multiply, DFT-C matmul, transpose — as separate HLO ops,
so a 2^18-point batch makes ~4 full passes through HBM and measures
~1.7-2.0 ms for 8×262144 on v5e, far above both its MXU arithmetic
(~65 us at bf16x3) and its minimal memory traffic (~80 us). This kernel
fuses the whole decomposition per frame inside VMEM:

    x.reshape(R, C)                          n = c + C*r  (c fast)
    A[k1, c] = sum_r  D_R[r, k1] * x[r, c]           (MXU, contract dim 0)
    Z[k1, c] = A[k1, c] * W_N^{k1 c}                 (VPU twiddle)
    Y[k1,k2] = sum_c  Z[k1, c] * D_C[c, k2]          (MXU)
    out[k1 + R*k2] = Y[k1, k2]                       (transpose store)

so HBM sees exactly one read of x and one write of out. The DFT matrices
and the twiddle plane are kernel inputs with constant index maps (fetched
once, resident across the frame grid). Complex arithmetic runs on f32
re/im planes with the 3-multiplication (zgemm3m) product at
``mxufft.PRECISION`` (bf16x3 by default — measured f32-faithful for DFT
sums, see ops/mxufft.py); the inverse folds its 1/N (a power of two, so
exact) into D_C.

Matches jnp.fft.(i)fft to float32 round-off (tests/test_mxufft.py). VMEM
budget at N=2^18 (R=C=512): D 2 MB (shared between stages) + twiddle 2 MB
+ double-buffered in/out blocks 8 MB + live intermediates ~2 MB ≈ 14 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from passiveradar_tpu.ops import mxufft

# N -> (R, C) splits with everything VMEM-resident. Larger N would need
# either a >16 MB VMEM budget (D_1024 alone is 8 MB) or column blocking.
_SPLITS = {
    16384: (128, 128),
    32768: (128, 256),
    65536: (256, 256),
    131072: (256, 512),
    262144: (512, 512),
}


def supported(n: int) -> bool:
    return n in _SPLITS


@functools.lru_cache(maxsize=16)
def _tables(n: int, inverse: bool):
    """(D_R re/im, D_C re/im, twiddle re/im) float32 host tables.

    Reduced-argument float64 angles (mod n before exp) so the f32 cast is
    the only rounding; the inverse's 1/n rides D_C (n is a power of two,
    so the scale is exact in f32).
    """
    r, c = _SPLITS[n]
    sgn = 2j if inverse else -2j

    def dmat(m, scale=1.0):
        k = np.arange(m, dtype=np.float64)
        w = np.exp(sgn * np.pi * ((np.outer(k, k) % m) / m)) * scale
        return w.real.astype(np.float32), w.imag.astype(np.float32)

    k1 = np.arange(r, dtype=np.float64)[:, None]
    cc = np.arange(c, dtype=np.float64)[None, :]
    tw = np.exp(sgn * np.pi * ((k1 * cc % n) / n))
    dr = dmat(r)
    dc = dmat(c, scale=(1.0 / n if inverse else 1.0))
    return (dr[0], dr[1], dc[0], dc[1],
            tw.real.astype(np.float32), tw.imag.astype(np.float32))


def _kernel(drr, dri, dcr, dci, twr, twi, xr, xi, outr, outi):
    # Mosaic supports DEFAULT/HIGHEST dot precision only (no HIGH/bf16x3).
    # Measured on v5e (exp sweep 2026-08-19, 8x2^18): HIGHEST 1.26 ms,
    # DEFAULT 0.98 — the kernel is structure-bound, not MXU-bound, so the
    # accuracy-safe HIGHEST costs little and keeps the jnp.fft-parity
    # tolerance of the XLA-staged form.
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    # step 1: contract r -> (k1, c). D_R is SYMMETRIC, so the (r, k1)
    # contraction over dim 0 equals a standard (1,0)x(0) matmul — measured
    # ~10% faster than the dim-0/dim-0 form (no lhs relayout).
    dn = (((1,), (0,)), ((), ()))
    ar_, ai_, asum = xr[0], xi[0], xr[0] + xi[0]
    m1 = dot(drr[:], ar_, dimension_numbers=dn)
    m2 = dot(dri[:], ai_, dimension_numbers=dn)
    m3 = dot(drr[:] + dri[:], asum, dimension_numbers=dn)
    ar = m1 - m2
    ai = m3 - m1 - m2
    # step 2: twiddle (k1, c)
    zr = ar * twr[:] - ai * twi[:]
    zi = ar * twi[:] + ai * twr[:]
    # step 3: (k1, c) @ (c, k2) -> (k1, k2)
    dn2 = (((1,), (0,)), ((), ()))
    m1 = dot(zr, dcr[:], dimension_numbers=dn2)
    m2 = dot(zi, dci[:], dimension_numbers=dn2)
    m3 = dot(zr + zi, dcr[:] + dci[:], dimension_numbers=dn2)
    yr = m1 - m2
    yi = m3 - m1 - m2
    # step 4: out[k1 + R*k2] = Y[k1, k2] -> out viewed (C, R) takes Y^T
    outr[0] = yr.T
    outi[0] = yi.T


@functools.partial(jax.jit, static_argnames=("inverse",))
def _fft_fused_planes(xr: jnp.ndarray, xi: jnp.ndarray, inverse: bool):
    """(B, N) f32 planes -> (B, N) f32 planes, DFT along the last axis."""
    b, n = xr.shape
    r, c = _SPLITS[n]
    tabs = [jnp.asarray(t) for t in _tables(n, inverse)]

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    frame3 = lambda s1, s2: pl.BlockSpec(
        (1, s1, s2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    outr, outi = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[const((r, r)), const((r, r)), const((c, c)), const((c, c)),
                  const((r, c)), const((r, c)),
                  frame3(r, c), frame3(r, c)],
        out_specs=[frame3(c, r), frame3(c, r)],
        out_shape=[jax.ShapeDtypeStruct((b, c, r), jnp.float32),
                   jax.ShapeDtypeStruct((b, c, r), jnp.float32)],
        # live set at N=2^18 is ~21 MB (tables 6 + double-buffered IO 8 +
        # intermediates); the default 16 MB scoped-vmem budget OOMs the
        # compile (and when it squeaked through, DMA serialization made the
        # kernel 2.7x slower) — raise it, v5e VMEM accommodates this
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*tabs, xr.reshape(b, r, c), xi.reshape(b, r, c))
    return outr.reshape(b, n), outi.reshape(b, n)


def fft_fused(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """DFT along the last axis via the fused kernel. x: (..., N) complex64
    (or real) with N in the supported split table; leading dims flatten
    into the frame grid. Matches jnp.fft.(i)fft to f32 round-off."""
    n = x.shape[-1]
    if not supported(n):
        raise ValueError(f"fft_fused: unsupported length {n}")
    lead = x.shape[:-1]
    if jnp.iscomplexobj(x):
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
    else:
        xr = x.astype(jnp.float32)
        xi = jnp.zeros_like(xr)
    yr, yi = _fft_fused_planes(xr.reshape(-1, n), xi.reshape(-1, n), inverse)
    return jax.lax.complex(yr, yi).astype(jnp.complex64).reshape(lead + (n,))


def use_fused() -> bool:
    """Route mxufft's full-length transforms through the fused kernel?

    Default OFF — opt in with ``PASSIVERADAR_PALLAS_FFT=1``. Measured on the
    v5e headline (2026-08-20, fresh processes, same session): fused ON
    414.0 frames/s vs OFF 431.4 — in the full fused pipeline XLA overlaps
    the staged four-step's passes with neighbouring stages, which the
    single-kernel form serialises, so the kernel's one-HBM-round-trip
    advantage does not survive composition. Kept for standalone use (a lone
    2^18 FFT with nothing to overlap) and as the Mosaic reference kernel;
    parity is tested either way (tests/test_mxufft.py).

    Note: the env is read at trace time; pipeline-level jits key on it via
    pipeline._routing_key, so flipping it between calls retraces correctly.
    """
    import os
    env = os.environ.get("PASSIVERADAR_PALLAS_FFT")
    if env is None:
        return False
    if env in ("0", "", "false"):
        return False
    # opt-in: legal in single-device TPU programs and shard_map bodies
    # (per-device programs); an AUTO-sharded multi-device program cannot
    # partition the Mosaic call along the batch axis
    if jax.default_backend() != "tpu":
        return True  # explicit opt-in on CPU runs interpreted (tests)
    from passiveradar_tpu.ops import resample_pallas
    return jax.device_count() == 1 or resample_pallas._IN_MANUAL_REGION
