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
    is_last_lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, lanes), 1) == lanes - 1

    def _left1(x):
        # lane roll left by one == pltpu.roll right by width-1
        return pltpu.roll(x, x.shape[-1] - 1, axis=1)

    def chunk(c, _):
        off = pl.multiple_of(c * lanes, lanes)
        # Mosaic restriction: dynamic lane offsets must be 128-aligned, so
        # scalars are extracted by rolling per-chunk registers — lane 0 is
        # always "now".
        sv_cr = sv_r[:, pl.ds(off, lanes)]
        sv_ci = sv_i[:, pl.ds(off, lanes)]
        la_r = buf_r[:, pl.ds(off + mp, lanes)]   # lookahead appends
        la_i = buf_i[:, pl.ds(off + mp, lanes)]
        o_r = jnp.zeros_like(sv_cr)
        o_i = jnp.zeros_like(sv_ci)

        def step(j, carry):
            sv_cr, sv_ci, la_r, la_i, o_r, o_i = carry
            ur = u_r[:]
            ui = u_i[:]
            wr_ = wr[:]
            wi_ = wi[:]
            # e = d - wᴴu (w is zero outside the mask)
            dot_r = jnp.sum(wr_ * ur + wi_ * ui, axis=1, keepdims=True)
            dot_i = jnp.sum(wr_ * ui - wi_ * ur, axis=1, keepdims=True)
            er = sv_cr[:, 0:1] - dot_r                        # (B, 1)
            ei = sv_ci[:, 0:1] - dot_i
            uu = jnp.sum((ur * ur + ui * ui) * m, axis=1, keepdims=True)
            # gate off the tail-padding steps so final taps stay exact
            active = ((base + off + j) < steps).astype(jnp.float32)
            scale = (mu * active / jnp.maximum(uu, 1e-30)) * m
            # w ← w + mu·u·conj(e)/uᴴu
            wr[:] = wr_ + (ur * er + ui * ei) * scale
            wi[:] = wi_ + (ui * er - ur * ei) * scale
            # slide the window one sample; append the lookahead's lane 0
            nu_r = _left1(ur)
            nu_i = _left1(ui)
            u_r[:] = nu_r
            u_i[:] = nu_i
            u_r[:, mp - 1:mp] = la_r[:, 0:1]
            u_i[:, mp - 1:mp] = la_i[:, 0:1]
            # collect the error at the output chunk's rolling tail
            o_r = jnp.where(is_last_lane, er, _left1(o_r))
            o_i = jnp.where(is_last_lane, ei, _left1(o_i))
            return (_left1(sv_cr), _left1(sv_ci), _left1(la_r), _left1(la_i),
                    o_r, o_i)

        sv_cr, sv_ci, la_r, la_i, o_r, o_i = jax.lax.fori_loop(
            0, lanes, step, (sv_cr, sv_ci, la_r, la_i, o_r, o_i))
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
