"""Power-of-two DFTs as MXU matmuls (Bailey/four-step decomposition).

XLA's native TPU FFT runs on the VPU at ~130-220 GFLOP/s (measured through
this pipeline) and is the throughput floor of both the clutter canceller and
the CAF. A radix-R four-step decomposition turns the same exact transform
into dense matmuls on the systolic array:

    x.reshape(R, C);  Y[u, c] = sum_r x[r, c] * W_R^{ru}       (DFT-R matmul)
    Z[u, v] = sum_c (W_N^{uc} * Y[u, c]) * W_C^{cv}            (DFT-C, recurse)
    X[u + R*v] = Z[u, v]   ->   out = Z.swapaxes(-1, -2).reshape(N)

One level costs N*(R+C) complex MACs instead of ~5*N*log2(N) real flops —
roughly 10-100x the arithmetic, but it runs at MXU speed (tens of TFLOP/s at
Precision.HIGHEST) instead of VPU speed, a net ~4-10x wall-clock win for the
transform sizes this pipeline uses (256..2^20, heavily batched).

All matmuls run on float32 re/im planes at ``PRECISION`` (default
``Precision.HIGH``, bf16x3 passes — for DFT sums this measured
f32-faithful against jnp.fft on TPU at 2x the throughput of HIGHEST's
bf16x6; see the PRECISION comment below); twiddle factors are computed
host-side in float64. Verified against jnp.fft to float32 round-off in
tests/test_mxufft.py.

Use ``use_mxu`` to decide at trace time whether to route a call site here:
on CPU (the test backend) the matmul formulation's extra arithmetic is a
severe slowdown, so call sites fall back to jnp.fft unless
``PASSIVERADAR_MXU_FFT=1`` forces the MXU path (small-geometry parity tests
do this to exercise the integration).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# largest transform evaluated as a single DFT matmul; larger sizes split
# into a base-R matmul plus a recursive transform of N/R
_BASE = 1024

# matmul precision for the f32 re/im planes. HIGH = bf16x3 passes — for DFT
# sums this is f32-faithful per product with f32 accumulation (verified
# against jnp.fft on TPU) at 2x the throughput of HIGHEST (bf16x6).
# Module-level so benchmarks can override.
PRECISION = jax.lax.Precision.HIGH

# fft_auto routes to the matmul formulation only above this length: measured
# on v5e, the four-step matmul form beats XLA's VPU FFT ~1.5x at 2^18 but is
# only at parity by 1024 (the decomposition's flop overhead eats the MXU
# speed advantage at small N — see docs/PERFORMANCE.md).
AUTO_MIN = 65536


def use_mxu() -> bool:
    """Route hot FFT call sites to the MXU formulation? (trace-time static)"""
    env = os.environ.get("PASSIVERADAR_MXU_FFT")
    if env is not None:
        return env not in ("0", "", "false")
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=64)
def _dft_mat(n: int, inverse: bool):
    k = np.arange(n, dtype=np.float64)
    # reduced-argument twiddles: outer(k,k) mod n keeps every angle in
    # [0, 2pi) before the float64 exp, so the f32 cast loses nothing
    ang = (np.outer(k, k) % n) / n
    w = np.exp((2j if inverse else -2j) * np.pi * ang)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _twiddle(n: int, r: int, inverse: bool):
    u = np.arange(r, dtype=np.float64)[:, None]
    c = np.arange(n // r, dtype=np.float64)[None, :]
    ang = (u * c % n) / n
    w = np.exp((2j if inverse else -2j) * np.pi * ang)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _mm(xr, xi, dr, di):
    """(..., k) complex planes @ (k, m) complex matrix -> (..., m) planes.

    3-multiplication (Karatsuba / zgemm3m) form: yr = m1 - m2 and
    yi = m3 - m1 - m2 with m1 = xr·dr, m2 = xi·di, m3 = (xr+xi)·(dr+di) —
    25% fewer MXU MACs than the textbook 4-matmul complex product for two
    cheap VPU adds (dr+di is a compile-time constant fold). Accuracy:
    ABSOLUTE error for DFT sums stays in the same f32 round-off envelope
    as the 4-mult form (|m1|,|m2| ~ |y|, no catastrophic growth), verified
    in test_mxufft at absolute tolerances. RELATIVE error of individual
    outputs whose imaginary (or real) part is small vs the cross terms —
    e.g. near-real spectra — can be worse than 4-mult, since yi = m3-m1-m2
    cancels; the pipeline only consumes these bins at f32 absolute scale.
    """
    ein = functools.partial(jnp.einsum, precision=PRECISION,
                            preferred_element_type=jnp.float32)
    m1 = ein("...k,km->...m", xr, dr)
    m2 = ein("...k,km->...m", xi, di)
    m3 = ein("...k,km->...m", xr + xi, dr + di)
    return m1 - m2, m3 - m1 - m2


# per-level radix for large transforms. MAC count is N·ΣRᵢ (ΠRᵢ = N), so
# small radices minimise arithmetic — but measured on v5e (bench_fftsweep.py,
# 8×2^18: radix 64→2.16 ms, 128→2.06, 256→1.65, 512→1.73) the winner is 256:
# below that the extra twiddle/transpose passes and thinner contractions cost
# more than the saved MACs. Module-level so benchmarks can sweep it.
RADIX = 256


def _split_radix(n: int) -> int:
    """Base factor R for one four-step level (see RADIX).

    Levels peel RADIX until the remainder is a single direct matmul of at
    most RADIX points (n = RADIX^k · tail), so the per-sample MAC count is
    k·RADIX + tail instead of the balanced split's ~2·√n."""
    r = max(2, min(RADIX, _BASE))
    if n <= r * r:
        # last split: balance the two remaining factors (8·32 beats 128·2)
        s = 1
        while s * s < n:
            s *= 2
        return s
    return r


def _core(xr, xi, inverse: bool):
    """DFT along the last axis of float32 re/im planes (no 1/N scaling)."""
    n = xr.shape[-1]
    if n <= _BASE:
        dr, di = _dft_mat(n, inverse)
        return _mm(xr, xi, jnp.asarray(dr), jnp.asarray(di))
    r = _split_radix(n)
    c = n // r
    shp = xr.shape[:-1]
    xr = xr.reshape(shp + (r, c))
    xi = xi.reshape(shp + (r, c))
    dr, di = _dft_mat(r, inverse)
    ein = functools.partial(jnp.einsum, precision=PRECISION,
                            preferred_element_type=jnp.float32)
    # DFT-R along axis -2 (D_R is symmetric: W^{ru}); 3-mult complex
    # product as in _mm
    m1 = ein("...rc,ru->...uc", xr, jnp.asarray(dr))
    m2 = ein("...rc,ru->...uc", xi, jnp.asarray(di))
    m3 = ein("...rc,ru->...uc", xr + xi, jnp.asarray(dr + di))
    yr = m1 - m2
    yi = m3 - m1 - m2
    tr, ti = _twiddle(n, r, inverse)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    zr = yr * tr - yi * ti
    zi = yr * ti + yi * tr
    zr, zi = _core(zr, zi, inverse)
    zr = zr.swapaxes(-1, -2).reshape(shp + (n,))
    zi = zi.swapaxes(-1, -2).reshape(shp + (n,))
    return zr, zi


def _planes(x):
    if jnp.iscomplexobj(x):
        return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    return x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32)


@functools.partial(jax.jit, static_argnames=("axis", "inverse", "fused"))
def _transform(x, axis: int, inverse: bool, fused: bool = False):
    xr, xi = _planes(x)
    if axis not in (-1, x.ndim - 1):
        xr = jnp.moveaxis(xr, axis, -1)
        xi = jnp.moveaxis(xi, axis, -1)
    n = xr.shape[-1]
    if n & (n - 1):
        raise ValueError(f"mxufft supports power-of-two lengths only, got {n}")
    if fused:
        # fused single-kernel four-step (one HBM round-trip); carries the
        # inverse 1/n inside its D_C table
        from passiveradar_tpu.ops import fft_pallas
        lead = xr.shape[:-1]
        yr, yi = fft_pallas._fft_fused_planes(
            xr.reshape(-1, n), xi.reshape(-1, n), inverse)
        yr = yr.reshape(lead + (n,))
        yi = yi.reshape(lead + (n,))
    else:
        yr, yi = _core(xr, xi, inverse)
        if inverse:
            yr = yr / n
            yi = yi / n
    out = jax.lax.complex(yr, yi).astype(jnp.complex64)
    if axis not in (-1, x.ndim - 1):
        out = jnp.moveaxis(out, -1, axis)
    return out


def _fused_route(x, axis: int) -> bool:
    """Trace-time: route this transform through the fused Pallas kernel?"""
    from passiveradar_tpu.ops import fft_pallas
    n = x.shape[axis]
    return fft_pallas.supported(n) and fft_pallas.use_fused()


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Forward DFT along ``axis`` (power-of-two length), MXU matmul form."""
    return _transform(x, axis, False, _fused_route(x, axis))


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse DFT along ``axis`` (power-of-two length), MXU matmul form."""
    return _transform(x, axis, True, _fused_route(x, axis))


@functools.lru_cache(maxsize=128)
def _dft_mat_sliced(n: int, k: int, out_len: int, inverse: bool):
    """(k, out_len) slice of the n-point DFT matrix (input padded to n,
    first out_len outputs kept); inverse carries the 1/n scale."""
    dr, di = _dft_mat(n, inverse)
    dr = dr[:k, :out_len]
    di = di[:k, :out_len]
    if inverse:
        dr = dr / n
        di = di / n
    return np.ascontiguousarray(dr), np.ascontiguousarray(di)


def dft_matmul(x: jnp.ndarray, axis: int = -1, inverse: bool = False,
               n: int | None = None, out_len: int | None = None):
    """DFT along ``axis`` as ONE sliced matmul — for small transforms whose
    input support (k ≤ n) or needed outputs (out_len ≤ n) are a fraction of
    the transform: the matmul does exactly k·out_len work on the MXU, where
    an FFT must run all n points on the VPU. Matches
    jnp.fft.(i)fft(x, n, axis)[..first out_len..] to f32 round-off.
    """
    k = x.shape[axis]
    n_total = int(n) if n is not None else k
    m_out = int(out_len) if out_len is not None else n_total
    if n_total > 4096:
        raise ValueError("dft_matmul is for small transforms (n <= 4096)")
    dr, di = _dft_mat_sliced(n_total, k, m_out, inverse)
    xr, xi = _planes(x)
    if axis not in (-1, x.ndim - 1):
        xr = jnp.moveaxis(xr, axis, -1)
        xi = jnp.moveaxis(xi, axis, -1)
    yr, yi = _mm(xr, xi, jnp.asarray(dr), jnp.asarray(di))
    out = jax.lax.complex(yr, yi).astype(jnp.complex64)
    if axis not in (-1, x.ndim - 1):
        out = jnp.moveaxis(out, -1, axis)
    return out


def _pad_to(x, n: int, axis: int):
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        return jax.lax.slice_in_dim(x, 0, n, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(x, pad)


def fft_auto(x: jnp.ndarray, n: int | None = None, axis: int = -1):
    """jnp.fft.fft-compatible forward transform that routes power-of-two
    lengths to the MXU formulation on TPU (see ``use_mxu``)."""
    if n is not None:
        x = _pad_to(x, n, axis)
    m = x.shape[axis]
    if use_mxu() and m & (m - 1) == 0 and m >= AUTO_MIN:
        return fft(x, axis=axis)
    return jnp.fft.fft(x, axis=axis)


def ifft_auto(x: jnp.ndarray, n: int | None = None, axis: int = -1):
    """jnp.fft.ifft-compatible inverse transform with MXU routing on TPU."""
    if n is not None:
        x = _pad_to(x, n, axis)
    m = x.shape[axis]
    if use_mxu() and m & (m - 1) == 0 and m >= AUTO_MIN:
        return ifft(x, axis=axis)
    return jnp.fft.ifft(x, axis=axis)
