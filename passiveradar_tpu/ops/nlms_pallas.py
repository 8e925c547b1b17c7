"""Pallas TPU kernel for the NLMS clutter canceller.

The NLMS recurrence (reference clutter_removal.py:189-249) is serial per
sample — the tap vector w feeds the error e, which feeds the next w. The
reference runs it as a Python loop (O(minutes) per CPI); the lax.scan version
(ops/clutter.py:nlms_filter) is exact but pays XLA loop overhead per sample.

This kernel keeps the taps and a sliding reference window resident in VMEM
and streams the channels through in blocks, batching B independent frames in
the sublane dimension so every VPU op works on full (B, 256) tiles:

  * grid = time blocks; Pallas double-buffers the HBM→VMEM block DMA,
  * the tap planes are outputs revisited by every grid step (index_map →
    block 0), so they live in VMEM across the whole stream,
  * complex arithmetic is split into re/im planes (TPU has no native
    complex), with a static mask confining updates to the M real taps.

Semantics match nlms_filter exactly except that an all-zero window (u·uᴴ=0,
e.g. inside zero-padded regions) produces a zero tap update instead of the
reference's NaNs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nlms_kernel(mask, ra_r, ra_i, rb_r, rb_i, sv_r, sv_i,
                 er_out, ei_out, wr, wi, u_r, u_i, buf_r, buf_i,
                 *, block: int, mp: int, mu: float, steps: int, m_taps: int):
    i = pl.program_id(0)
    base = i * block

    # sliding window buffer: this block plus mp samples of lookahead
    buf_r[:, :block] = ra_r[:]
    buf_r[:, block:] = rb_r[:, :mp]
    buf_i[:, :block] = ra_i[:]
    buf_i[:, block:] = rb_i[:, :mp]

    @pl.when(i == 0)
    def _():
        wr[:] = jnp.zeros_like(wr)
        wi[:] = jnp.zeros_like(wi)
        # prime the tap-input window: u = refx[0:mp] — the full mp window is
        # kept live (not just the m_taps prefix) so the append position is a
        # static lane and the lookahead loads stay 128-aligned; lanes beyond
        # the mask are only ever touched through zero weights.
        u_r[:] = buf_r[:, :mp]
        u_i[:] = buf_i[:, :mp]

    m = mask[:]                      # (1, mp): 1 for real taps, 0 for padding
    lanes = 128
    append_lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, mp), 1) == mp - 1
    step_lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    def _left1(x):
        # lane roll left by one == pltpu.roll right by width-1
        return pltpu.roll(x, x.shape[-1] - 1, axis=1)

    def _cumsum_lanes(x):
        # inclusive prefix sum over the 128 step lanes: log-step
        # shift-right-and-add (pltpu.roll is cyclic, so wrapped lanes are
        # masked to zero before each add)
        n = x.shape[-1]
        k = 1
        while k < n:
            shifted = pltpu.roll(x, k, axis=1)
            x = x + jnp.where(step_lane >= k, shifted, 0.0)
            k *= 2
        return x

    def chunk(c, _):
        off = pl.multiple_of(c * lanes, lanes)
        sv_cr = sv_r[:, pl.ds(off, lanes)]
        sv_ci = sv_i[:, pl.ds(off, lanes)]
        la_r = buf_r[:, pl.ds(off + mp, lanes)]   # lookahead appends
        la_i = buf_i[:, pl.ds(off + mp, lanes)]
        ur = u_r[:]
        ui = u_i[:]
        wr_ = wr[:]
        wi_ = wi[:]

        # ---- per-chunk precompute: the whole scalar chain, vectorised ----
        # u·uᴴ for every step of the chunk from one exact chunk-start norm
        # plus a prefix sum of per-step deltas: step j drops window lane j
        # and gains the lane sliding into the masked region (old lane
        # m_taps+j — u's own tail lanes already hold the lookahead stream,
        # extended by la for the last steps). Exact recompute each chunk
        # bounds the incremental float drift to 128 steps (≲1e-5 relative,
        # far inside the kernel's 2e-3 parity tolerance).
        uu0 = jnp.sum((ur * ur + ui * ui) * m, axis=1, keepdims=True)
        ext_r = jnp.concatenate([ur, la_r], axis=1)
        ext_i = jnp.concatenate([ui, la_i], axis=1)
        add_r = jax.lax.slice_in_dim(ext_r, m_taps, m_taps + lanes, axis=1)
        add_i = jax.lax.slice_in_dim(ext_i, m_taps, m_taps + lanes, axis=1)
        drop_r = jax.lax.slice_in_dim(ur, 0, lanes, axis=1)
        drop_i = jax.lax.slice_in_dim(ui, 0, lanes, axis=1)
        delta = (add_r * add_r + add_i * add_i) \
            - (drop_r * drop_r + drop_i * drop_i)
        csum = _cumsum_lanes(delta)
        # exclusive prefix: uu at step j includes deltas of steps < j only
        # (cyclic roll right by one, wrapped lane 0 masked to zero)
        uu_all = uu0 + jnp.where(step_lane >= 1,
                                 pltpu.roll(csum, 1, axis=1), 0.0)
        # gate off the tail-padding steps so final taps stay exact
        active = ((base + off + step_lane) < steps).astype(jnp.float32)
        scale_all = mu * active / jnp.maximum(uu_all, 1e-30)

        o_r = jnp.zeros_like(sv_cr)
        o_i = jnp.zeros_like(sv_ci)

        # ---- statically-unrolled steps: lane indices are compile-time, so
        # the per-step scalar extractions are slices, not register rolls ----
        for j in range(lanes):
            # e = d - wᴴu (w is zero outside the mask)
            dot_r = jnp.sum(wr_ * ur + wi_ * ui, axis=1, keepdims=True)
            dot_i = jnp.sum(wr_ * ui - wi_ * ur, axis=1, keepdims=True)
            er = sv_cr[:, j:j + 1] - dot_r                    # (B, 1)
            ei = sv_ci[:, j:j + 1] - dot_i
            # w ← w + mu·u·conj(e)/uᴴu  (masked to the real taps)
            t1 = er * scale_all[:, j:j + 1]
            t2 = ei * scale_all[:, j:j + 1]
            wr_ = wr_ + (ur * t1 + ui * t2) * m
            wi_ = wi_ + (ui * t1 - ur * t2) * m
            # slide the window one sample; append the lookahead's lane j
            ur = jnp.where(append_lane, la_r[:, j:j + 1], _left1(ur))
            ui = jnp.where(append_lane, la_i[:, j:j + 1], _left1(ui))
            # collect the error into this step's output lane
            o_r = jnp.where(step_lane == j, er, o_r)
            o_i = jnp.where(step_lane == j, ei, o_i)

        wr[:] = wr_
        wi[:] = wi_
        u_r[:] = ur
        u_i[:] = ui
        er_out[:, pl.ds(off, lanes)] = o_r
        ei_out[:, pl.ds(off, lanes)] = o_i
        return 0

    jax.lax.fori_loop(0, block // lanes, chunk, 0)


@functools.partial(jax.jit,
                   static_argnames=("filter_len", "mu", "peek", "block",
                                    "return_filter", "interpret"))
def nlms_filter_pallas(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                       mu: float, peek: int = 10, block: int = 2048,
                       return_filter: bool = False,
                       interpret: bool | None = None):
    """Batched Pallas NLMS. ref/srv: (B, N) complex64 → (B, N) complex64.

    Matches ops.clutter.nlms_filter (and so the reference NLMS) per frame;
    1-D inputs are promoted to a single-row batch. interpret=None auto-selects
    the Pallas interpreter on CPU backends (compiled Mosaic elsewhere).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    squeeze = ref.ndim == 1
    if squeeze:
        ref, srv = ref[None], srv[None]
    b, n = ref.shape
    m = filter_len + peek
    mp = _round_up(m, 128)
    if mp > block:
        raise ValueError("block must be at least the padded filter length")
    steps = n - m
    steps_pad = _round_up(steps, block)
    num_blocks = steps_pad // block

    # step k reads ref[k+1 : k+1+m] and srv[k+filter_len]; refx spans one
    # extra block for the i+1 lookahead spec
    refx = jnp.pad(ref[:, 1:], ((0, 0), (0, steps_pad + block - (n - 1))))
    srv_tail = srv[:, filter_len:filter_len + steps_pad]
    srvx = jnp.pad(srv_tail,
                   ((0, 0), (0, steps_pad - srv_tail.shape[1])))
    mask = jnp.asarray(
        np.concatenate([np.ones(m, np.float32), np.zeros(mp - m, np.float32)])
    )[None, :]

    planes = [jnp.real(refx), jnp.imag(refx), jnp.real(refx), jnp.imag(refx),
              jnp.real(srvx), jnp.imag(srvx)]

    kernel = functools.partial(_nlms_kernel, block=block, mp=mp, mu=mu,
                               steps=steps, m_taps=m)
    in_specs = [
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
    out_specs = [
        pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    er, ei, wr, wi = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, steps_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, steps_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, mp), jnp.float32),
            jax.ShapeDtypeStruct((b, mp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, mp), jnp.float32),
            pltpu.VMEM((b, mp), jnp.float32),
            pltpu.VMEM((b, block + mp), jnp.float32),
            pltpu.VMEM((b, block + mp), jnp.float32),
        ],
        # the statically-unrolled chunk loop keeps the window/taps/output
        # registers plus per-chunk precompute live across 128 steps; at
        # B=128 the kernel's scoped-VMEM stack is ~27 MB, above the 16 MB
        # default — raise it (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mask, *planes)

    e = jax.lax.complex(er, ei)[:, :steps]
    out = jnp.zeros((b, n), jnp.complex64)
    out = out.at[:, filter_len:filter_len + steps].set(e)
    if squeeze:
        out = out[0]
    if return_filter:
        taps = jnp.flip(jax.lax.complex(wr, wi)[:, :m], axis=1)
        if squeeze:
            taps = taps[0]
        return out, taps
    return out
