"""Pallas TPU kernel for the polyphase regroup+matmul of the mix-resampler.

The XLA formulation (ops/fir.py:_mix_resample_jit) evaluates the fused
mixer+polyphase resample (reference semantics: signal_utils.py:15-17 +
frequency_shift at main.py:122-166) as a phase-grouped matmul whose operand
is ``xp.reshape(rows, groups, down)``. With ``down`` = 119 that regroup is
an unaligned lane restructuring: XLA lowers it as a relayout that moves the
whole IQ stream through HBM at a fraction of bandwidth — measured as the
dominant cost of the preprocess stage (several ms per 8-frame batch vs a
~0.2 ms bandwidth bound).

This kernel performs the regroup inside VMEM instead. Key alignment fact:
``gs = groups_step(down)`` consecutive polyphase groups span exactly
``gs*down`` input lanes, a multiple of 128 — so a grid step over gs-group
blocks reads lane-aligned input blocks, and within a block every group's
window offset ``g*down`` has a *static* tile index and roll amount. The
kernel therefore:

  * copies the step's input block plus a (kw+1)-tile lookahead into VMEM
    (kw = ceil(bank width / 128); requires (kw+1)*128 <= gs*down, enforced
    by the caller's support gate in ops/fir.py),
  * for each of the gs groups (unrolled; all offsets static): slices the
    window neighbourhood, left-rotates it by ``(g*down) % 128`` (static
    ``pltpu.roll``), and writes the aligned 128-lane window chunks of BOTH
    input planes into the W2 matrix,
  * contracts W2 with the doubled, sign-mixed tap bank on the MXU — the
    complex combine (o_re = xr*Br − xi*Bi, o_im = xr*Bi + xi*Br) rides the
    same matmul (see mix_regroup_matmul).

The mixer's oscillator is already folded into the (complex) bank by
``ops.fir._mix_resample_static``; one kernel call handles a whole frame
batch (re/im planes in the sublane dimension, chunked at 8 frames for
VMEM). Output matches the einsum path to f32 round-off (same f32 HIGHEST
contractions, summation order differs only by matmul tiling).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max bank width the kernel supports: window chunks per group. 10 so the
# fold=8 phase-folded bank (ops/fir.py: W + 7*down lanes at the FM 13/119
# ratio => kw 10) stays in-kernel for the fold A/B; fold=4 needs 5
MAX_KW = 10
# frame rows per kernel call. 8 measured BEST: 16 rows per call (both
# channels in one kernel, 32-sublane ops, half the op count) LOST 12.1 vs
# 10.3 ms for the two-call pair on v5e 2026-08-20 - deeper per-op operands
# do not beat two pipelined 8-row calls (VMEM double-buffer pressure);
# the fifth and final recorded dead end for this kernel's structure
ROWS_CHUNK = 8
# matmul precision for the kernel contraction. Module-level so benchmarks
# can A/B it (bench_resample_prec.py): HIGHEST = bf16x6 passes, HIGH =
# bf16x3 at half the MXU work — see the measured speed/accuracy trade in
# docs/PERFORMANCE.md before changing the default. NOTE: read at TRACE
# time — jit caches keep the old value, so an override only takes effect
# after jax.clear_caches() (bench_resample_prec.py does this).
PRECISION = jax.lax.Precision.HIGHEST


# trace-time flag: True while tracing inside a shard_map manual region
# (pipeline._shmap_program), where every array is already the per-device
# block and a Mosaic custom call is legal regardless of mesh size
_IN_MANUAL_REGION = False


class manual_region:
    """Context manager marking a shard_map manual-region trace.

    Inside it use_pallas_resample() ignores the device count: the SPMD
    partitioner never sees the kernel (shard_map bodies are per-device
    programs), so the single-device-only guard does not apply.
    """

    def __enter__(self):
        global _IN_MANUAL_REGION
        self._prev = _IN_MANUAL_REGION
        _IN_MANUAL_REGION = True

    def __exit__(self, *exc):
        global _IN_MANUAL_REGION
        _IN_MANUAL_REGION = self._prev
        return False


def groups_step(down: int) -> int:
    """Polyphase groups per grid step for a given ``down``.

    gs*down (the step's input span) is always a multiple of 128, so each
    grid step reads lane-aligned input blocks; 128 groups works for any
    down, but downs sharing factors with 128 admit a smaller step (fewer
    groups per step, same span), which keeps the phase-folded banks'
    (ops/fir.py, fold>1) VMEM blocks at the unfolded size — down grows by
    the fold factor while gs shrinks by it, c_len = gs*down constant.

    The secondary goal — gs*down >= (MAX_KW+1)*128 so the lookahead slice
    fits inside one block — is BEST-EFFORT: for small ``down`` the loop
    caps gs at 128 and returns a value violating it. Callers must
    re-validate ((kw+1)*128 <= gs*down); mix_regroup_matmul raises on
    unsupported geometries and the fir.py gate falls back to the einsum
    path."""
    import math as _math

    gs = 128 // _math.gcd(down, 128)
    while gs * down < (MAX_KW + 1) * 128 and gs < 128:
        gs *= 2
    return gs


def use_pallas_resample() -> bool:
    """Route the resampler bulk through the Pallas kernel? (trace-time).

    Default: TPU backend, and either a single device or a shard_map manual
    region (see manual_region). Under a multi-device AUTO-sharded mesh the
    frame axis is sharded and XLA's SPMD partitioner does not split custom
    (Mosaic) calls along it, so auto-sharded programs keep the einsum path —
    same math, automatically partitionable; the production multi-chip
    pipeline (pipeline.process_frames_shmap / run_capture(sharding=...))
    is a manual region, so it keeps the kernel.
    """
    env = os.environ.get("PASSIVERADAR_PALLAS_RESAMPLE")
    if env is not None:
        return env not in ("0", "", "false")
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or _IN_MANUAL_REGION


def _kernel_cx(xa, xb, bkt, out, buf, w2, *, f8: int, down: int, kw: int,
               gs: int):
    c_len = gs * down
    look = (kw + 1) * 128

    buf[:, :c_len] = xa[:]
    buf[:, c_len:] = xb[:, :look]

    for g in range(gs):
        t = (g * down) // 128
        j = (g * down) % 128
        seg = buf[:, t * 128:t * 128 + look]        # (2*f8, (kw+1)*128)
        if j:
            seg = pltpu.roll(seg, look - j, axis=1)
        for k in range(kw):
            w2[g * f8:(g + 1) * f8,
               k * 128:(k + 1) * 128] = seg[:f8, k * 128:(k + 1) * 128]
            w2[g * f8:(g + 1) * f8,
               (kw + k) * 128:(kw + k + 1) * 128] = \
                seg[f8:, k * 128:(k + 1) * 128]

    out[0] = jnp.dot(w2[:], bkt[:], precision=PRECISION,
                     preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("down", "groups", "up",
                                             "interpret", "pad_left"))
def mix_regroup_matmul(planes_re: jnp.ndarray, planes_im: jnp.ndarray,
                       bank: jnp.ndarray, down: int, groups: int, up: int,
                       interpret: bool | None = None, pad_left: int = 0):
    """Complex-output regroup+matmul: the complex combine rides the MXU.

    planes_re/planes_im: (F, n) float32 — the re/im planes of F frames.
    bank: (2*up, W) float32 — rows [0:up] = Re(B̃), [up:2up] = Im(B̃) of the
    oscillator-folded tap bank (ops/fir.py:_mix_resample_static bank_ri).
    Returns (o_re, o_im), each (F, groups, up) float32, with
    o = Σ_c x[g*down + c] * B̃[p, c] for the complex x = re + j·im — i.e.
    the combine o_re = xr·Br − xi·Bi, o_im = xr·Bi + xi·Br is folded into
    ONE matmul by doubling the contraction dim: W2 rows hold
    [re window | im window] (2*kw*128 lanes, kw = ceil(W/128); the im half
    starts at lane kw*128) and the bank supplies [Br; −Bi] columns for o_re
    and [Bi; Br] for o_im.

    ``pad_left`` zero-pads the planes on the left INSIDE the staging copy:
    the planes land at lane offset pad_left of the zero staging buffer, so
    callers pass their raw (even strided-view) planes with no separate
    jnp.pad pass. Measured TIMING-NEUTRAL on v5e (bench_preproc_ablation:
    full stage 3.25 ms/batch8 before and after — XLA already fused the
    old transpose+pad+set chain into the same copies); kept because it
    makes the staging explicit and validated. The stage's remaining
    input-side cost (~0.74 ms/channel-batch) is the intrinsic strided
    deinterleave read of the re/im planes, ~2x the contiguous-copy floor.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f, n = planes_re.shape
    if f > ROWS_CHUNK:
        parts = [mix_regroup_matmul(planes_re[r:r + ROWS_CHUNK],
                                    planes_im[r:r + ROWS_CHUNK],
                                    bank, down, groups, up,
                                    interpret=interpret, pad_left=pad_left)
                 for r in range(0, f, ROWS_CHUNK)]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    s_dim, w = bank.shape
    assert s_dim == 2 * up
    kw = -(-w // 128)
    if kw > MAX_KW:
        raise ValueError(f"bank width {w} > {MAX_KW * 128}")
    s32 = -(-2 * up // 32) * 32                    # [o_re(up) | o_im(up)]
    b_re = bank[:up].T.astype(jnp.float32)         # (W, up)
    b_im = bank[up:].T.astype(jnp.float32)
    half = kw * 128
    bkt = jnp.zeros((2 * half, s32), jnp.float32)
    bkt = bkt.at[:w, :up].set(b_re)
    bkt = bkt.at[half:half + w, :up].set(-b_im)
    bkt = bkt.at[:w, up:2 * up].set(b_im)
    bkt = bkt.at[half:half + w, up:2 * up].set(b_re)

    f8 = -(-f // 8) * 8
    gs = groups_step(down)
    steps = -(-groups // gs)
    c_len = gs * down
    look = (kw + 1) * 128
    if look > c_len:
        raise ValueError(
            f"lookahead {look} lanes exceeds the grid block span "
            f"{c_len} (groups_step({down})={gs}) — geometry unsupported")
    need = (steps + 1) * c_len
    if pad_left + n > need:
        raise ValueError(f"pad_left {pad_left} + n {n} exceeds the staging "
                         f"span {need}")
    xp = jnp.zeros((2 * f8, need), jnp.float32)
    xp = xp.at[:f, pad_left:pad_left + n].set(planes_re)
    xp = xp.at[f8:f8 + f, pad_left:pad_left + n].set(planes_im)

    kern = functools.partial(_kernel_cx, f8=f8, down=down, kw=kw, gs=gs)
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((2 * f8, c_len), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f8, c_len), lambda i: (0, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * half, s32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gs * f8, s32),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, gs * f8, s32),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * f8, c_len + look), jnp.float32),
            pltpu.VMEM((gs * f8, 2 * half), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, bkt)

    out = out.reshape(steps * gs, f8, s32)
    out = out.transpose(1, 0, 2)[:f, :groups]
    return out[..., :up], out[..., up:2 * up]
