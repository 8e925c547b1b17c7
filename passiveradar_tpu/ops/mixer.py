"""Digital down-conversion: frequency shifting with high-precision phase.

The reference multiplies by ``exp(j 2π fc n / Fs + j phase0)`` with the phase
ramp computed in complex64 (signal_utils.py:24-27), which loses up to ~0.05 rad
of phase accuracy by the end of a 2.4M-sample chunk. Here the phase ramp is
computed by a split-precision scheme that keeps the error below ~1e-6 cycles
for arbitrarily long chunks while staying entirely in float32 on device:

  cycles(n) = frac(c * K * n1)  [float64 host table]  +  c_hi*n0  +  c_lo*n0

with n = n1*K + n0, c = fc/Fs, and c_hi a 12-bit truncation of c so that
c_hi*n0 is exact in float32.

Cross-chunk phase continuity is handled analytically via per-chunk starting
phases, exactly like the reference's block trick (main.py:122-130) — there is
no serial dependency between chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT_K = 4096


@functools.lru_cache(maxsize=64)
def _phase_tables(c: float, n: int):
    """Host-side oscillator factor tables for e^{j2πc·n}.

    With n = n1·K + n0, the oscillator factors exactly into
    coarse[n1]·fine[n0]; both tables are tiny and computed in float64 here,
    so the on-device per-sample work is a single complex multiply with
    ~float32-quantisation phase error regardless of chunk length.
    """
    n1_max = -(-n // _SPLIT_K)
    coarse_cycles = np.mod(c * _SPLIT_K * np.arange(n1_max, dtype=np.float64),
                           1.0)
    fine_cycles = np.mod(c * np.arange(_SPLIT_K, dtype=np.float64), 1.0)
    coarse = np.exp(2j * np.pi * coarse_cycles).astype(np.complex64)
    fine = np.exp(2j * np.pi * fine_cycles).astype(np.complex64)
    return coarse, fine


@functools.partial(jax.jit, static_argnames=("fc", "fs"))
def _freq_shift_jit(x, phase_offset, fc: float, fs: float):
    n = x.shape[-1]
    coarse_np, fine_np = _phase_tables(float(fc) / float(fs), n)
    # the oscillator is an outer product of two small host-precomputed
    # complex tables — one complex multiply per sample, no per-sample
    # transcendentals, no gathers
    n1_max = len(coarse_np)
    osc_c = jnp.asarray(coarse_np)
    osc_f = jnp.asarray(fine_np)
    osc = (osc_c[:, None] * osc_f[None, :]).reshape(n1_max * _SPLIT_K)[:n]
    ph = jnp.asarray(phase_offset, jnp.float32)[..., None]
    osc_p = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    return (x * osc * osc_p).astype(jnp.complex64)


def frequency_shift(x: jnp.ndarray, fc: float, fs: float,
                    phase_offset=0.0) -> jnp.ndarray:
    """Shift ``x`` in frequency by ``fc`` (sample rate ``fs``).

    Equivalent to the reference's ``x * exp(j*2π*fc*n/Fs + j*phase_offset)``
    (signal_utils.py:24-27) with better phase accuracy. ``fc`` and ``fs`` are
    static host-side scalars; ``phase_offset`` may be a traced scalar or, for
    batched input ``x`` of shape (B, N), a length-B array of per-chunk
    starting phases.
    """
    phase_offset = jnp.asarray(phase_offset, jnp.float32)
    return _freq_shift_jit(jnp.asarray(x), phase_offset, float(fc), float(fs))


def block_phase_offsets(num_blocks: int, block_len: int, fc: float,
                        fs: float) -> np.ndarray:
    """Per-block starting phases for phase-continuous block-wise mixing.

    Reproduces the reference's analytic continuity correction
    (main.py:122-130): block k starts with phase
    2π * k * ((block_len mod (fs // fc)) * fc / fs), reduced mod 2π in exact
    host arithmetic. Returns float32 radians of shape (num_blocks,).
    """
    if fc == 0:
        return np.zeros(num_blocks, dtype=np.float32)
    mod_period = int(fs) // int(fc)
    osb = block_len % mod_period
    k = np.arange(num_blocks, dtype=np.float64)
    cycles = np.mod(k * (osb * float(fc) / float(fs)), 1.0)
    return (2.0 * np.pi * cycles).astype(np.float32)
