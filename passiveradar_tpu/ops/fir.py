"""FIR filtering, polyphase rational resampling and decimation.

TPU-native reimplementation of the resampling semantics the reference gets
from scipy's compiled ``upfirdn`` core (reference: signal_utils.py:11-17 via
``scipy.signal.resample_poly`` / ``scipy.signal.decimate``). Filter *design*
(tap computation) is static host-side setup using scipy; the *compute* path
reformulates upfirdn as a phase-grouped matmul (see _polyphase_bank) so the
resampling runs on the MXU.

The output-sample alignment, edge handling (including the ``padtype='line'``
linear-trend extension) and tap normalisation reproduce scipy's behavior
sample-for-sample, because the reference pipeline's per-chunk resampling edge
effects flow into the final range-Doppler maps.
"""

from __future__ import annotations

import functools
import hashlib
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _spsignal


def design_lowpass(numtaps: int, cutoff: float, window) -> np.ndarray:
    """Windowed-sinc lowpass design (host-side, static).

    Thin wrapper over ``scipy.signal.firwin``; cutoff is in Nyquist units as
    in scipy. Returns float64 taps.
    """
    return _spsignal.firwin(numtaps, cutoff, window=window)


def _upfirdn_output_len(len_h: int, n_in: int, up: int, down: int) -> int:
    """Number of output samples of upfirdn (full conv of dilated input)."""
    return ((n_in - 1) * up + len_h - 1) // down + 1


def _as_planes(x: jnp.ndarray):
    """Split a 1-D (possibly complex) array into real rows; returns (planes, is_complex)."""
    if jnp.iscomplexobj(x):
        return jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32), True
    return x.astype(jnp.float32)[None, :], False


def _from_planes(p: jnp.ndarray, is_complex: bool) -> jnp.ndarray:
    if is_complex:
        return jax.lax.complex(p[0], p[1]).astype(jnp.complex64)
    return p[0]


@functools.lru_cache(maxsize=256)
def _polyphase_bank(h_key, up: int, down: int):
    """Phase-grouped tap bank for the matmul formulation of upfirdn.

    upfirdn's output satisfies

        out[g*up + p] = Σ_wi B[p, wi] · x[g*down + q_min + wi],
        B[p, wi] = h[p*down - (wi + q_min)*up]   (0 where out of range)

    i.e. the tap pattern depends only on the output phase p, never on the
    group index g — so the whole resampling is one (G, W) × (W, up) matmul
    on the MXU instead of a dilated convolution.
    """
    h = _TAP_CACHE[h_key]
    len_h = len(h)
    # valid q for phase p: 0 <= p*down - q*up < len_h
    q_min = min((p * down - (len_h - 1)) // up for p in range(up))
    q_max = max((p * down) // up for p in range(up))
    w = q_max - q_min + 1
    bank = np.zeros((up, w), dtype=np.float32)
    for p in range(up):
        for qi in range(w):
            j = p * down - (qi + q_min) * up
            if 0 <= j < len_h:
                bank[p, qi] = h[j]
    return bank, q_min, w


def _upfirdn_matmul(planes: jnp.ndarray, h_key, up: int, down: int) -> jnp.ndarray:
    """upfirdn core as polyphase row-block matmuls. planes: (B, n) real rows.

    out[g·up+p] = Σ_wi B[p, wi]·xp[g·down + wi] is evaluated as
    Σ_i (row-block g+i of the reshaped input) @ Bᵢᵀ with Bᵢ the i-th
    down-sized column slab of the bank — the input is only ever *reshaped*
    (never materialised as an im2col window matrix).
    """
    h = _TAP_CACHE[h_key]
    n_in = planes.shape[1]
    n_out = _upfirdn_output_len(len(h), n_in, up, down)
    bank, q_min, w = _polyphase_bank(h_key, up, down)
    groups = -(-n_out // up)
    n_slabs = -(-w // down)
    # x index of window element (g, wi) is g*down + q_min + wi; q_min <= 0
    # always (the p=0 phase reaches back len_h-1 taps), so left-padding by
    # -q_min aligns window row g with padded index g*down.
    pad_l = -q_min
    assert q_min <= 0
    total = (groups + n_slabs) * down
    pad_r = max(0, total - (n_in + pad_l))
    xp = jnp.pad(planes, ((0, 0), (pad_l, pad_r)))[:, :total]
    r = xp.reshape(planes.shape[0], groups + n_slabs, down)
    bank_pad = np.zeros((up, n_slabs * down), np.float32)
    bank_pad[:, :w] = bank
    out = None
    for i in range(n_slabs):
        slab = jnp.asarray(bank_pad[:, i * down:(i + 1) * down])
        # HIGHEST: TPU default rounds f32 matmul inputs to bf16 (~3e-3 error
        # on the resampled signal, measured); the stage is memory-bound so
        # full-precision passes cost nothing
        part = jnp.einsum("bgc,pc->bgp", r[:, i:i + groups], slab,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out.reshape(planes.shape[0], groups * up)[:, :n_out]


@functools.partial(jax.jit, static_argnames=("h_key", "up", "down", "mode"))
def _upfirdn_jit(x, h_key, up, down, mode):
    h = _TAP_CACHE[h_key]
    planes, is_c = _as_planes(x)
    n_in = x.shape[0]
    if mode == "line":
        # Linear-trend extension defined by the first and last samples
        # (scipy upfirdn mode='line'): slope = (x[-1] - x[0]) / (n - 1).
        need = -(-len(h) // up)                  # ceil(len_h / up)
        ext = down * (-(-need // down))          # multiple of down >= need
        slope = (planes[:, -1] - planes[:, 0]) / max(n_in - 1, 1)
        kl = jnp.arange(ext, 0, -1, dtype=jnp.float32)
        kr = jnp.arange(1, ext + 1, dtype=jnp.float32)
        left = planes[:, :1] - slope[:, None] * kl[None, :]
        right = planes[:, -1:] + slope[:, None] * kr[None, :]
        planes = jnp.concatenate([left, planes, right], axis=1)
        out = _upfirdn_matmul(planes, h_key, up, down)
        shift = ext * up // down
        n_out = _upfirdn_output_len(len(h), n_in, up, down)
        out = out[:, shift:shift + n_out]
    else:
        out = _upfirdn_matmul(planes, h_key, up, down)
    return _from_planes(out, is_c)


# Taps are static design-time constants; they are keyed into a host-side cache
# so the jit cache sees a hashable key instead of an array.
_TAP_CACHE: dict = {}


def _tap_key(h: np.ndarray) -> tuple:
    h = np.ascontiguousarray(h, dtype=np.float64)
    key = (len(h), hashlib.sha1(h.tobytes()).hexdigest())
    _TAP_CACHE[key] = h
    return key


def upfirdn(h: np.ndarray, x: jnp.ndarray, up: int = 1, down: int = 1,
            mode: str = "constant") -> jnp.ndarray:
    """Upsample by ``up``, FIR filter with ``h``, downsample by ``down``.

    Matches scipy.signal.upfirdn for 1-D input with modes 'constant' (zero)
    and 'line'. ``h`` must be a host-side numpy array (static).
    """
    return _upfirdn_jit(x, _tap_key(np.asarray(h)), int(up), int(down), mode)


def resample_poly(x: jnp.ndarray, up: int, down: int,
                  window=("kaiser", 5.0), padtype: str = "constant") -> jnp.ndarray:
    """Rational polyphase resampling, matching scipy.signal.resample_poly.

    Used for the IF-rate conversion stage (reference: signal_utils.py:15-17,
    main.py:151-166 — called per chunk with padtype='line').
    """
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        return jnp.asarray(x)
    h_pad, n_pre_remove, n_out = _resample_design(x.shape[0], up, down,
                                                  window)
    y = upfirdn(h_pad, x, up, down, mode=padtype)
    return y[n_pre_remove:n_pre_remove + n_out]


def _resample_design(n_in: int, up: int, down: int, window):
    """Tap design + alignment arithmetic of resample_poly (host, static).

    Returns (h_pad, n_pre_remove, n_out): the zero-padded taps fed to
    upfirdn, the number of leading output samples to drop, and the final
    output length — identical arithmetic to resample_poly above.
    """
    if isinstance(window, np.ndarray):
        h = np.array(window, dtype=np.float64)
        half_len = (len(h) - 1) // 2
    else:
        max_rate = max(up, down)
        half_len = 10 * max_rate
        h = design_lowpass(2 * half_len + 1, 1.0 / max_rate, window)
    h = h * up
    n_out = n_in * up // down + bool((n_in * up) % down)
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while _upfirdn_output_len(len(h) + n_pre_pad + n_post_pad, n_in,
                              up, down) < n_out + n_pre_remove:
        n_post_pad += 1
    h_pad = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])
    return h_pad, n_pre_remove, n_out


@functools.lru_cache(maxsize=64)
def _mix_resample_static(h_key, up: int, down: int, c: float, n_in: int,
                         mode: str):
    """Host-side constants for the fused mix+resample (see mix_resample_poly).

    The oscillator F(n) = e^{j2πcn} factors across the polyphase window:
    the mixed signal's window element at (group g, window index k) is
    F(g·down)·F(k - pad_l - ext)·x[g·down + k - pad_l - ext], so mixing
    reduces to (a) a static complex tap bank B̃ = B·Fw and (b) a per-group
    complex scale F_g — no mixed intermediate is ever materialised.

    For padtype='line', the linear-trend extension samples are linear in the
    first/last *mixed* samples m0/mN, so their exact contribution to the
    edge output groups is a pair of static correction matrices C1/C2 with
    out_edge += C1·m0 + C2·mN.
    """
    h = _TAP_CACHE[h_key]
    len_h = len(h)
    _, q_min, w = _polyphase_bank(h_key, up, down)
    pad_l = -q_min
    if mode == "line":
        need = -(-len_h // up)
        ext = down * (-(-need // down))
    else:
        ext = 0
    L = n_in + 2 * ext
    n_out_full = _upfirdn_output_len(len_h, L, up, down)
    groups = -(-n_out_full // up)
    n_slabs = -(-w // down)
    W = n_slabs * down

    # float64 bank (same pattern as _polyphase_bank, higher precision so the
    # oscillator folding below keeps full float32 accuracy)
    bank = np.zeros((up, W), dtype=np.float64)
    for p in range(up):
        for qi in range(w):
            j = p * down - (qi + q_min) * up
            if 0 <= j < len_h:
                bank[p, qi] = h[j]

    kk = np.arange(W, dtype=np.float64)
    fw = np.exp(2j * np.pi * np.mod(c * (kk - pad_l - ext), 1.0))
    bank_c = bank * fw
    # stacked (2·up, down)-column slabs for one real einsum per slab:
    # rows 0..up-1 = Re(B̃), rows up..2up-1 = Im(B̃)
    bank_ri = np.concatenate([bank_c.real, bank_c.imag], axis=0).astype(
        np.float32)

    gd = np.arange(groups, dtype=np.float64) * down
    fg = np.exp(2j * np.pi * np.mod(c * gd, 1.0)).astype(np.complex64)

    corr = None
    if mode == "line" and n_in > 1:
        nm1 = n_in - 1
        fN = np.exp(2j * np.pi * np.mod(c * nm1, 1.0))
        gl = min(groups, (ext + pad_l + down - 1) // down)
        g_r0 = max(0, -(-(ext + n_in + pad_l - W + 1) // down))
        g_r0 = min(g_r0, groups)

        def edge(gs, left: bool):
            nu = gs[:, None] * down + np.arange(W)[None, :] - pad_l
            if left:
                m = (nu >= 0) & (nu < ext)
                a = (m * 1.0) @ bank.T
                d = (m * (ext - nu)) @ bank.T
                # corr = A_L·m0 - s·D_L with s = (mN - m0)/(n-1)
                return a + d / nm1, (-d / nm1) * fN
            m = (nu >= ext + n_in) & (nu < ext + n_in + ext)
            a = (m * 1.0) @ bank.T
            d = (m * (nu - ext - n_in + 1)) @ bank.T
            return -d / nm1, (a + d / nm1) * fN

        c1l, c2l = edge(np.arange(gl), True)
        c1r, c2r = edge(np.arange(g_r0, groups), False)
        corr = (gl, g_r0,
                c1l.astype(np.complex64), c2l.astype(np.complex64),
                c1r.astype(np.complex64), c2r.astype(np.complex64))

    shift = ext * up // down if mode == "line" else 0
    n_out_plain = _upfirdn_output_len(len_h, n_in, up, down)
    return dict(pad_l=pad_l, ext=ext, groups=groups, n_slabs=n_slabs,
                bank_ri=bank_ri, bank_c64=bank_c, fg=fg, corr=corr,
                shift=shift, n_out_plain=n_out_plain)


@functools.lru_cache(maxsize=64)
def _mix_resample_fold(h_key, up: int, down: int, c: float, n_in: int,
                       mode: str, fold: int):
    """Phase-folded kernel operands for the Pallas regroup+matmul.

    The regroup kernel's cost floor is per polyphase GROUP (the VMEM
    window-align ops emitted per group — see ops/resample_pallas.py and
    the dead-end ledger in docs/PERFORMANCE.md), not per input byte. A
    rational ratio up/down is identical to (fold*up)/(fold*down) with the
    folded bank

        B_f[s*up + p, s*down + k] = B̃[p, k] * e^{j2πc*down*s},  s < fold

    (each fold slot s is the original bank shifted right by s*down lanes
    and advanced by the oscillator's per-group phase), a per-group scale
    fg_f[g] = e^{j2πc*(fold*down)*g}, and ceil(groups/fold) groups — the
    SAME output samples from 1/fold as many groups at a (fold-1)*down-lane
    wider bank. Flat output order is unchanged, so the padtype='line' edge
    corrections apply on the flattened output instead of per group.
    """
    st = _mix_resample_static(h_key, up, down, c, n_in, mode)
    bank_c = st["bank_c64"]
    w = bank_c.shape[1]
    w_f = w + (fold - 1) * down
    bank_fc = np.zeros((fold * up, w_f), np.complex128)
    for s in range(fold):
        phi = np.exp(2j * np.pi * np.mod(c * down * s, 1.0))
        bank_fc[s * up:(s + 1) * up, s * down:s * down + w] = bank_c * phi
    bank_ri = np.concatenate([bank_fc.real, bank_fc.imag],
                             axis=0).astype(np.float32)
    groups_f = -(-st["groups"] // fold)
    gd = np.arange(groups_f, dtype=np.float64) * (fold * down)
    fg_f = np.exp(2j * np.pi * np.mod(c * gd, 1.0)).astype(np.complex64)

    corr_flat = None
    if st["corr"] is not None:
        gl, g_r0, c1l, c2l, c1r, c2r = st["corr"]
        corr_flat = (gl * up, g_r0 * up,
                     c1l.reshape(-1), c2l.reshape(-1),
                     c1r.reshape(-1), c2r.reshape(-1))
    return dict(st, up_f=fold * up, down_f=fold * down, groups_f=groups_f,
                bank_f_ri=bank_ri, fg_f=fg_f, corr_flat=corr_flat)


@functools.partial(jax.jit,
                   static_argnames=("h_key", "up", "down", "c", "mode",
                                    "n_pre_remove", "n_out"))
def _mix_resample_jit(x, phase, h_key, up, down, c, mode, n_pre_remove,
                      n_out):
    if jnp.iscomplexobj(x):
        planes = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)
    elif x.ndim == 2:
        planes = x.astype(jnp.float32).T          # (n, 2) IQ pairs → (2, n)
    else:
        planes = jnp.stack([x.astype(jnp.float32),
                            jnp.zeros_like(x, jnp.float32)])
    n_in = planes.shape[1]
    st = _mix_resample_static(h_key, up, down, c, n_in, mode)
    groups, n_slabs, down_ = st["groups"], st["n_slabs"], down
    total = (groups + n_slabs) * down_
    pad_lraw = st["pad_l"] + st["ext"]
    pad_rraw = max(0, total - (n_in + pad_lraw))
    xp = jnp.pad(planes, ((0, 0), (pad_lraw, pad_rraw)))[:, :total]
    r = xp.reshape(2, groups + n_slabs, down_)
    # all slabs in ONE einsum (slab-major output axis s = i·2up + p): with
    # 2up ≈ 26 the MXU pads the output dim to 128 lanes regardless, so one
    # n_slabs·2up-wide product halves the padded FLOPs of per-slab einsums;
    # the slab sum then becomes cheap shifted row-block adds.
    bk = jnp.asarray(st["bank_ri"]).reshape(2 * up, n_slabs, down_)
    bk = bk.transpose(1, 0, 2).reshape(n_slabs * 2 * up, down_)
    # HIGHEST: see _upfirdn_matmul — bf16-rounded taps cost ~3e-3 accuracy
    # for no speed gain on this memory-bound stage
    big = jnp.einsum("bgc,sc->bgs", r, bk,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    out = big[:, :groups, :2 * up]
    for i in range(1, n_slabs):
        out = out + big[:, i:i + groups, i * 2 * up:(i + 1) * 2 * up]
    # out: (2 input planes, groups, 2·up); complex product of x and bank
    o_re = out[0, :, :up] - out[1, :, up:]
    o_im = out[0, :, up:] + out[1, :, :up]
    bulk = jax.lax.complex(o_re, o_im) * jnp.asarray(st["fg"])[:, None]
    if st["corr"] is not None:
        gl, g_r0, c1l, c2l, c1r, c2r = st["corr"]
        m0 = jax.lax.complex(planes[0, 0], planes[1, 0])
        mn = jax.lax.complex(planes[0, -1], planes[1, -1])
        if gl:
            bulk = bulk.at[:gl].add(jnp.asarray(c1l) * m0
                                    + jnp.asarray(c2l) * mn)
        if g_r0 < groups:
            bulk = bulk.at[g_r0:].add(jnp.asarray(c1r) * m0
                                      + jnp.asarray(c2r) * mn)
    flat = bulk.reshape(groups * up)
    lo = st["shift"] + n_pre_remove
    y = flat[lo:lo + n_out]
    ph = jnp.asarray(phase, jnp.float32)
    return (y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))).astype(
        jnp.complex64)


@functools.partial(jax.jit,
                   static_argnames=("h_key", "up", "down", "c", "mode",
                                    "n_pre_remove", "n_out", "fold"))
def _mix_resample_batch_jit(x, phases, h_key, up, down, c, mode,
                            n_pre_remove, n_out, fold=1):
    """Batched fused mix+resample with the Pallas regroup+matmul bulk.

    Same math as _mix_resample_jit (per frame), but all frames' re/im
    planes ride as rows of ONE kernel call — the (·, down) lane regroup
    happens in VMEM (ops/resample_pallas.py) instead of as an XLA relayout.
    ``fold`` runs the kernel at the (fold*up)/(fold*down) phase-folded
    factorisation (_mix_resample_fold): 1/fold as many groups against a
    wider static bank — fewer per-group VMEM align ops for the same math.
    """
    from passiveradar_tpu.ops.resample_pallas import mix_regroup_matmul

    # NOTE: an alternative input staging exists — feed the strided re/im
    # views with mix_regroup_matmul(pad_left=pad_lraw) and skip the
    # explicit transpose+pad. Measured TIMING-NEUTRAL on v5e
    # (bench_preproc_ablation 2026-08-21: 3.25 ms/batch8 either way; XLA
    # fuses this chain into the same copies), so this call-site keeps the
    # materialised form whose compiled pipeline HLO is already cached.
    if jnp.iscomplexobj(x):
        planes = jnp.stack([jnp.real(x), jnp.imag(x)], axis=1)
    else:
        planes = x.transpose(0, 2, 1).astype(jnp.float32)     # (F, 2, n)
    f, _, n_in = planes.shape
    p_re, p_im = planes[:, 0], planes[:, 1]
    st = _mix_resample_fold(h_key, up, down, c, n_in, mode, fold)
    groups, up_f = st["groups_f"], st["up_f"]
    pad_lraw = st["pad_l"] + st["ext"]
    # kernel zero-pads the right edge itself
    xp = jnp.pad(planes, ((0, 0), (0, 0), (pad_lraw, 0)))
    o_re, o_im = mix_regroup_matmul(xp[:, 0], xp[:, 1],
                                    jnp.asarray(st["bank_f_ri"]),
                                    st["down_f"], groups, up_f)
    bulk = jax.lax.complex(o_re, o_im) * jnp.asarray(st["fg_f"])[None, :, None]
    flat = bulk.reshape(f, groups * up_f)
    if st["corr_flat"] is not None:
        tl, t_r0, c1l, c2l, c1r, c2r = st["corr_flat"]
        t_hi = t_r0 + c1r.shape[0]
        m0 = jax.lax.complex(p_re[:, 0], p_im[:, 0])[:, None]
        mn = jax.lax.complex(p_re[:, -1], p_im[:, -1])[:, None]
        if tl:
            flat = flat.at[:, :tl].add(jnp.asarray(c1l)[None] * m0
                                       + jnp.asarray(c2l)[None] * mn)
        if t_r0 < t_hi:
            flat = flat.at[:, t_r0:t_hi].add(jnp.asarray(c1r)[None] * m0
                                             + jnp.asarray(c2r)[None] * mn)
    lo = st["shift"] + n_pre_remove
    y = flat[:, lo:lo + n_out]
    ph = jnp.asarray(phases, jnp.float32)[:, None]
    return (y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))).astype(
        jnp.complex64)


def resample_fold() -> int:
    """Requested phase-fold factor for the Pallas batch resampler.

    Trace-time env gate (PASSIVERADAR_RESAMPLE_FOLD); pipeline-level jits
    key on it via pipeline._routing_key. The actual fold used is the
    largest supported one <= this (mix_resample_poly_batch's gate). The
    default follows the measured optimum at the FM geometry (see
    docs/PERFORMANCE.md).
    """
    env = os.environ.get("PASSIVERADAR_RESAMPLE_FOLD")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            import warnings

            warnings.warn(
                f"PASSIVERADAR_RESAMPLE_FOLD={env!r} is not an int; "
                "using the default fold")
    # measured on v5e at the FM geometry (bench_resample_fold.py,
    # 2026-08-20, in-program scan, one channel, ms/batch8):
    # fold=1 4.64 / fold=2 3.67 / fold=4 3.39 — the per-group align-op
    # floor dominates the kernel, so fewer+wider groups win
    return 4


def mix_resample_poly_batch(x: jnp.ndarray, phases, fc: float, fs: float,
                            up: int, down: int, window=("kaiser", 5.0),
                            padtype: str = "constant") -> jnp.ndarray:
    """Fused mix+resample over a frame batch; Pallas bulk when supported.

    x: (F, n) complex64 or (F, n, 2) float32 IQ pairs; phases: (F,).
    Result matches jax.vmap(mix_resample_poly) frame-for-frame; on TPU
    backends the polyphase regroup+matmul runs as one Pallas kernel over
    all frames' re/im planes (see ops/resample_pallas.py). Falls back to
    the vmapped einsum path when the kernel does not support the geometry.
    """
    from passiveradar_tpu.ops import resample_pallas

    g = math.gcd(int(up), int(down))
    upr, downr = int(up) // g, int(down) // g
    fold_ok = 0
    if resample_pallas.use_pallas_resample() and not (
            upr == 1 and downr == 1):
        n_in = x.shape[1]
        h_pad, n_pre_remove, n_out = _resample_design(n_in, upr, downr,
                                                      window)
        h_key = _tap_key(h_pad)
        c = float(fc) / float(fs)
        st = _mix_resample_static(h_key, upr, downr, c, n_in, padtype)
        w = st["bank_ri"].shape[1]
        # largest supported fold <= requested. kernel constraints per fold:
        # folded bank width (w + (fold-1)*down lane-tiles), output s-dim,
        # and the lookahead slice ((kw+1) lane-tiles) must fit inside one
        # grid block (groups_step(down_f)*down_f lanes)
        # 2*u_f <= 256: the kernel's matmul output holds [o_re|o_im] in
        # the lane dim — two lane tiles max (fold=8 at 13/119 needs 224).
        # gs_f*d_f <= gs0*down: folding must not grow the per-step VMEM
        # block — odd folds of an odd down force gs=128 (gcd collapses) and
        # a fold×-larger block that blows the scoped-VMEM budget (measured:
        # fold=7 at 13/119 => c_len 106624 => 28 MB kernel stack, OOM)
        gs0 = resample_pallas.groups_step(downr)
        for fold in range(resample_fold(), 0, -1):
            d_f, u_f = downr * fold, upr * fold
            kw = -(-(w + (fold - 1) * downr) // 128)
            gs = resample_pallas.groups_step(d_f)
            if (kw <= resample_pallas.MAX_KW and 2 * u_f <= 256
                    and (kw + 1) * 128 <= gs * d_f
                    and gs * d_f <= gs0 * downr):
                fold_ok = fold
                break
    if fold_ok:
        return _mix_resample_batch_jit(x, phases, h_key, upr, downr, c,
                                       padtype, n_pre_remove, n_out,
                                       fold=fold_ok)
    return jax.vmap(
        lambda v, p: mix_resample_poly(v, fc, fs, p, up, down, window,
                                       padtype))(x, phases)


def mix_resample_poly(x: jnp.ndarray, fc: float, fs: float, phase,
                      up: int, down: int, window=("kaiser", 5.0),
                      padtype: str = "constant") -> jnp.ndarray:
    """Fused frequency-shift + rational resample.

    Exactly equivalent (to float32 rounding) to
    ``resample_poly(frequency_shift(x, fc, fs, phase), up, down, window,
    padtype)`` — the down-conversion+IF-resampling stage of the reference
    pipeline (main.py:122-166) — but the mixed signal is never materialised:
    the oscillator folds into the static polyphase bank and a per-group
    scale vector, and the raw IQ planes feed the MXU matmuls directly.

    ``x`` may be 1-D complex or an (n, 2) float32 IQ-pair array (the
    host-transfer format). ``phase`` may be traced (per-frame under vmap).
    """
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        from passiveradar_tpu.ops.mixer import frequency_shift
        if not jnp.iscomplexobj(x) and x.ndim == 2:
            x = jax.lax.complex(x[:, 0], x[:, 1])
        return frequency_shift(x, fc, fs, phase)
    n_in = x.shape[0]
    h_pad, n_pre_remove, n_out = _resample_design(n_in, up, down, window)
    return _mix_resample_jit(x, phase, _tap_key(h_pad), up, down,
                             float(fc) / float(fs), padtype, n_pre_remove,
                             n_out)


def fir_decimate(x: jnp.ndarray, q: int, numtaps: int | None = None,
                 window: str = "hamming") -> jnp.ndarray:
    """Zero-phase FIR decimation by integer factor ``q``.

    Matches scipy.signal.decimate(x, q, n=numtaps, ftype='fir',
    zero_phase=True), which the reference uses with n = 20*q
    (reference: signal_utils.py:11-13). numtaps here is the filter *order* n;
    the filter has numtaps+1 taps, default 20*q.
    """
    q = int(q)
    if q == 1:
        return jnp.asarray(x)
    if numtaps is None:
        numtaps = 20 * q
    taps = design_lowpass(numtaps + 1, 1.0 / q, window)
    return resample_poly(x, 1, q, window=taps)


def decimate_taps(x: jnp.ndarray, taps: np.ndarray, q: int) -> jnp.ndarray:
    """Zero-phase decimation with explicit FIR taps.

    Matches scipy.signal.decimate(x, q, ftype=dlti(taps, 1)) for FIR taps —
    the code path the CAF's Doppler-decimation uses in the reference
    (range_doppler_processing.py:69-86).
    """
    return resample_poly(x, 1, int(q), window=np.asarray(taps, dtype=np.float64))
