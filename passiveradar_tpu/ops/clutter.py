"""Adaptive clutter cancellation.

TPU-native re-architecture of the reference's clutter_removal.py:

* Block least-squares filters. The reference builds an explicit (N, L+peek)
  lag matrix with np.roll columns and calls LAPACK (clutter_removal.py:6-107)
  or scipy's Levinson solver (clutter_removal.py:109-160). Because the lag
  matrix columns are *circular* shifts, its Gram matrix and right-hand side
  are exactly circular auto/cross-correlations — so here everything is
  computed with three FFTs and a small dense Hermitian solve, never
  materialising the N×L matrix. Multi-bin pipelines factor every bin's
  Toeplitz system up front (batched complex Cholesky inverses) so the
  sequential bin scan only does matvecs; the general-purpose toeplitz_solve
  uses a real 2M×2M embedding for LU fallback support.

* The Toeplitz (WSS) variant solves the same small system built from *linear*
  correlation lags, matching scipy.solve_toeplitz semantics.

* NLMS / GAL-JPE adaptive filters: per-sample recurrences expressed as
  lax.scan (the reference runs Python-interpreter loops over ~2.6e5 samples,
  clutter_removal.py:189-364). A Pallas NLMS kernel (ops/nlms_pallas.py)
  provides the speed-of-light path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.ops.mxufft import dft_matmul, fft_auto, ifft_auto, use_mxu
from passiveradar_tpu.ops.zoomfft import partial_ifft, sparse_fft


# unroll factor for the sequential per-Doppler-bin scan in the carry impl
# (trace-time; module-level so benchmarks can sweep it). The bins are truly
# serial, but unrolling removes while-loop overhead and lets XLA schedule
# independent sub-chains across iterations.
BIN_SCAN_UNROLL = 1


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# --------------------------------------------------------------------------
# correlation lag vectors
# --------------------------------------------------------------------------

def linear_corr_lags(s1: jnp.ndarray, s2: jnp.ndarray, nlags: int) -> jnp.ndarray:
    """out[j] = Σ_t s1[t]·conj(s2[t-j]), j = 0..nlags-1 (zero-padded)."""
    n = s1.shape[0]
    fft_len = _next_pow2(n + nlags)
    f1 = jnp.fft.fft(s1, fft_len)
    f2 = jnp.fft.fft(s2, fft_len)
    return jnp.fft.ifft(f1 * jnp.conj(f2))[:nlags]


def circular_corr_lags(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """out[l] = Σ_t s1[t+l]·conj(s2[t]) with circular indexing (full length)."""
    return jnp.fft.ifft(jnp.fft.fft(s1) * jnp.conj(jnp.fft.fft(s2)))


# --------------------------------------------------------------------------
# small Hermitian solves via real embedding (TPU float32 linalg)
# --------------------------------------------------------------------------

def _solve_complex(a: jnp.ndarray, b: jnp.ndarray, assume_pd: bool = False) -> jnp.ndarray:
    """Solve A x = b for complex Hermitian A via the real 2M embedding.

    assume_pd=True uses Cholesky (the embedding of a Hermitian PD matrix is
    symmetric PD) — much faster than LU on TPU; correlation Gram/Toeplitz
    matrices of real captures are PD up to round-off.
    """
    ar, ai = jnp.real(a), jnp.imag(a)
    big = jnp.block([[ar, -ai], [ai, ar]])
    rhs = jnp.concatenate([jnp.real(b), jnp.imag(b)])
    if assume_pd:
        chol = jnp.linalg.cholesky(big)
        y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
        sol = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
    else:
        sol = jnp.linalg.solve(big, rhs)
    m = a.shape[0]
    return jax.lax.complex(sol[:m], sol[m:]).astype(jnp.complex64)


def _toeplitz_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """Dense Hermitian Toeplitz matrix with first column c (complex)."""
    m = c.shape[0]
    d = np.arange(m)[:, None] - np.arange(m)[None, :]
    cg = c[jnp.asarray(np.abs(d))]
    return jnp.where(jnp.asarray(d >= 0), cg, jnp.conj(cg))


def _toeplitz_inverse_c(c: jnp.ndarray) -> jnp.ndarray:
    """Complex inverse of the Hermitian Toeplitz matrix via Cholesky
    (compiled complex linalg works on TPU; the m×m complex factorisation
    costs 8× less than a 2m×2m real embedding, and Cholesky beats LU)."""
    t = _toeplitz_matrix(c)
    chol = jnp.linalg.cholesky(t)
    eye = jnp.eye(t.shape[0], dtype=t.dtype)
    y = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.conj(chol.T), y, lower=False)


def levinson_first_col(c: jnp.ndarray, unroll: int = 4) -> jnp.ndarray:
    """First column x = T⁻¹e₀ of the Hermitian Toeplitz inverse, batched.

    ``c`` is (..., m) — the first column of each T (same convention as
    _toeplitz_matrix). Classic Levinson-Durbin as a lax.scan over the order:
    O(m²) work instead of the O(m³) of a dense factorisation, and the
    recursion state is a single (..., m) vector, so the whole batch stays
    resident on-chip. With the Gohberg-Semencul identity (gs_generators /
    gs_apply below) this replaces the batched Cholesky *inverses* that
    dominated the clutter precompute (reference analog: the
    scipy.solve_toeplitz Levinson call at clutter_removal.py:109-160).
    """
    c = jnp.asarray(c)
    batch = c.shape[:-1]
    m = c.shape[-1]
    cb = c.reshape((-1, m))
    nb = cb.shape[0]
    # cf_pad[..., 2m-1-k+j] = c[k-j] (zero outside 0..m-1)
    cf_pad = jnp.concatenate(
        [jnp.zeros((nb, m), cb.dtype), jnp.flip(cb, -1),
         jnp.zeros((nb, m), cb.dtype)], axis=-1)
    # derive the carry init from cb (not a fresh constant) so shard_map's
    # varying-manual-axes tracking accepts the scan inside manual regions
    a0 = (cb * 0).at[:, 0].set(1.0)
    e0 = jnp.real(cb[:, 0])
    # ar[j] = conj(a[k-j]) — the reversed-conjugate polynomial is carried and
    # updated by a one-sample shift instead of rebuilt with flip+concat every
    # step (the recursion is latency-bound: 184 dependent steps, so per-step
    # op count is the whole cost). Entering step k=1 it is shift(a0).
    ar0 = jnp.concatenate([jnp.zeros((nb, 1), a0.dtype), a0[:, :-1]], axis=-1)

    def step(carry, k):
        a, ar, e = carry
        crev = jax.lax.dynamic_slice_in_dim(cf_pad, 2 * m - 1 - k, m, axis=1)
        acc = jnp.sum(a * crev, axis=-1)
        kap = -acc / e.astype(acc.dtype)
        a_new = a + kap[:, None] * ar
        # reversal at order k+1: ar'[j] = conj(a_new[k+1-j])
        #                              = (ar + conj(kap)·a)[j-1]
        ar_shift = ar + jnp.conj(kap)[:, None] * a
        ar_new = jnp.concatenate(
            [jnp.zeros((nb, 1), a.dtype), ar_shift[:, :-1]], axis=-1)
        e = e * (1.0 - jnp.abs(kap) ** 2)
        return (a_new, ar_new, e), None

    # the recursion is latency-bound (m-1 dependent steps): unrolling packs
    # more of the chain into each XLA while-iteration (swept on TPU via
    # bench_levinson.py at the FM geometry's 40×185 batch: 4 ≈ 8 < 32 < 16;
    # 1.48 ms is the scan's latency floor)
    (a, _, e), _ = jax.lax.scan(step, (a0, ar0, e0), jnp.arange(1, m),
                                unroll=unroll)
    x = a / e[:, None].astype(a.dtype)
    return x.reshape(batch + (m,))


def gs_generators(x: jnp.ndarray, fft_len: int):
    """Frequency-domain Gohberg-Semencul generators from x = T⁻¹e₀.

    T⁻¹ = (A·Aᴴ − B·Bᴴ)/δ with A = lower-triangular Toeplitz(x),
    B = lower-triangular Toeplitz([0, conj(x[m-1]), …, conj(x[1])]) and
    δ = x[0] (real). Returns (fft(A's column), fft(B's column), δ) ready
    for gs_apply; fft_len must be ≥ 2m−1.
    """
    m = x.shape[-1]
    if fft_len < 2 * m - 1:
        raise ValueError("fft_len must be >= 2m-1")
    y = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype),
         jnp.conj(jnp.flip(x[..., 1:], -1))], axis=-1)
    fx = fft_auto(x, fft_len, axis=-1)
    fy = fft_auto(y, fft_len, axis=-1)
    delta = jnp.real(x[..., 0])
    return fx, fy, delta


def gs_apply(fx: jnp.ndarray, fy: jnp.ndarray, delta: jnp.ndarray,
             v: jnp.ndarray) -> jnp.ndarray:
    """y = T⁻¹ v from Gohberg-Semencul generators (four small FFT convs).

    A·u / Aᴴ·v are causal convolution / correlation with the generator
    column, so each product is one padded FFT multiply; everything is
    batched and O(m log m) — the per-bin solve inside the clutter scan
    never touches an m×m matrix. The A- and B-generator paths are
    independent, so they run stacked (one transform of 2× the batch instead
    of two): the whole apply is 4 transform rounds (fv, stacked ifft,
    stacked fft, stacked ifft) — the scan body is dispatch-latency-bound,
    not arithmetic-bound, at m ≈ 200. On TPU the small transforms run as
    sliced DFT matmuls (ops/mxufft.dft_matmul): below fft_auto's AUTO_MIN
    they would otherwise lower to XLA's FFT *custom call*, whose per-call
    overhead and fusion barrier dominate this latency-bound chain; the
    matmul form also exploits the m-support inputs / m-needed outputs
    (m·fft_len work instead of fft_len·log) and fuses into neighbouring
    ops.
    """
    m = v.shape[-1]
    fft_len = fx.shape[-1]
    fg = jnp.stack([fx, fy])                       # (2, ..., fft_len)
    # dft_matmul is a dense small-transform primitive (n <= 4096); larger
    # filter lengths (m > 2048 => fft_len 8192) keep the FFT path
    if use_mxu() and fft_len <= 4096:
        fv = dft_matmul(v, n=fft_len)              # m-support forward
        hv = dft_matmul(jnp.conj(fg) * fv[None], inverse=True,
                        out_len=m)                 # first m outputs only
        prod = dft_matmul(fg * dft_matmul(hv, n=fft_len), inverse=True,
                          out_len=m)
    else:
        fv = fft_auto(v, fft_len, axis=-1)
        hv = ifft_auto(jnp.conj(fg) * fv[None], axis=-1)[..., :m]
        prod = ifft_auto(fg * fft_auto(hv, fft_len, axis=-1),
                         axis=-1)[..., :m]
    return ((prod[0] - prod[1])
            / delta[..., None].astype(prod.dtype)).astype(v.dtype)


def gs_dense_inverse(x: jnp.ndarray) -> jnp.ndarray:
    """Dense T⁻¹ from the Levinson first column x (Gohberg-Semencul).

    T⁻¹ = (A·Aᴴ − B·Bᴴ)/δ with A = lower-triangular Toeplitz(x),
    B = lower-triangular Toeplitz([0, conj(x[m−1]), …, conj(x[1])]),
    δ = x[0] (real). Batched over leading axes. At the pipeline's m ≈ 200
    the per-bin scan solve then collapses to ONE batched matvec — the
    FFT-space gs_apply is asymptotically cheaper but costs 4 sequential
    transform dispatches inside the latency-bound bin scan.
    """
    m = x.shape[-1]
    lead = x.shape[:-1]

    def lower_toeplitz(v):
        # L[j, t] = v[j-t] for j >= t: diagonal d = t-j ∈ [-(m-1), 0] holds
        # v[-d] — gather-free skew build (see _skew_toeplitz)
        e = jnp.concatenate(
            [v[..., :1], jnp.zeros(lead + (m + 1,), v.dtype),
             jnp.flip(v[..., 1:], -1)], axis=-1)
        return _skew_toeplitz(e, m)

    a = lower_toeplitz(x)
    y = jnp.concatenate(
        [jnp.zeros(lead + (1,), x.dtype),
         jnp.conj(jnp.flip(x[..., 1:], -1))], axis=-1)
    b = lower_toeplitz(y)

    # G·conj(G)ᵀ on split f32 planes with the 3-mult complex product at
    # HIGH (bf16x3) — a complex-dtype einsum at HIGHEST lowers to 4 real
    # matmuls of 6 bf16 passes each and measured ~2 ms slower here
    def gram(g):
        gr = jnp.real(g).astype(jnp.float32)
        gi = jnp.imag(g).astype(jnp.float32)
        ein = functools.partial(jnp.einsum, "...ij,...kj->...ik",
                                precision=jax.lax.Precision.HIGH,
                                preferred_element_type=jnp.float32)
        m1 = ein(gr, gr)
        m2 = ein(gi, gi)
        m3 = ein(gr + gi, gr - gi)   # = m1 − m2 + (gi·grᵀ − gr·giᵀ)
        # g·conj(g)ᵀ: re = gr·grᵀ + gi·giᵀ,  im = gi·grᵀ − gr·giᵀ
        return m1 + m2, m3 - m1 + m2

    ar_, ai_ = gram(a)
    br_, bi_ = gram(b)
    inv = jax.lax.complex(ar_ - br_, ai_ - bi_).astype(jnp.complex64)
    return inv / x[..., 0:1, None].real.astype(inv.dtype)


def toeplitz_solve(c: jnp.ndarray, b: jnp.ndarray,
                   assume_pd: bool = True) -> jnp.ndarray:
    """Solve T x = b where T is Hermitian Toeplitz with first column ``c``.

    Matches scipy.linalg.solve_toeplitz(c, b) for Hermitian systems (the row
    is taken as conj(c), scipy's default). The reference's 185-tap system is
    small, so a dense batched solve keeps the MXU busy instead of a serial
    Levinson recursion; autocorrelation systems are PD, so Cholesky is the
    default (pass assume_pd=False for an LU solve of indefinite systems).
    """
    m = c.shape[0]
    d = np.arange(m)[:, None] - np.arange(m)[None, :]
    cg = c[jnp.asarray(np.abs(d))]
    t = jnp.where(jnp.asarray(d >= 0), cg, jnp.conj(cg))
    return _solve_complex(t, b, assume_pd=assume_pd)


# --------------------------------------------------------------------------
# block least-squares clutter filters
# --------------------------------------------------------------------------

def _skew_toeplitz(e: jnp.ndarray, m: int) -> jnp.ndarray:
    """Gather-free Toeplitz build: H[..., j, t] = e[..., (t-j) mod (2m+1)].

    ``e`` is the (..., 2m+1) diagonal table (entry d >= 0 at e[d], entry
    d < 0 at e[2m+1+d]). Tiling e m times and reshaping with row stride 2m
    skews each row one step right — row j of the (m, 2m) view starts at
    flat offset j*2m ≡ -j (mod 2m+1) — so the first m columns hold every
    diagonal with |d| < m. Pure broadcast/reshape/slice: XLA lowers it as
    sequential copies, where the equivalent index-matrix gather was
    measured at 0.57 ms per 8-frame clutter batch (docs/PERFORMANCE.md
    ablation 2026-08-20).
    """
    lead = e.shape[:-1]
    tiled = jnp.broadcast_to(e[..., None, :], lead + (m, 2 * m + 1))
    flat = tiled.reshape(lead + (m * (2 * m + 1),))
    return flat[..., :2 * m * m].reshape(lead + (m, 2 * m))[..., :m]


def _tail_toeplitz(tails: jnp.ndarray, m: int) -> jnp.ndarray:
    """(..., m-1, m) truncation-tail operators T[r, j] = rs[n + r - j]
    (j > r) from the (..., m) last-m-samples rows (tails[..., i] =
    rs[n-m+i]). Diagonal d = j - r ∈ [1, m-1] holds tails[m-d] — the
    _tri_conv_wrap table — so the build is one gather-free _skew_toeplitz
    reshape instead of an (m-1)×m index-matrix gather."""
    lead = tails.shape[:-1]
    z1 = jnp.zeros(lead + (1,), tails.dtype)
    zr = jnp.zeros(lead + (m + 1,), tails.dtype)
    e = jnp.concatenate([z1, jnp.flip(tails[..., 1:], axis=-1), zr], axis=-1)
    return _skew_toeplitz(e, m)[..., :m - 1, :]


def _two_sided_toeplitz(v: jnp.ndarray, m: int) -> jnp.ndarray:
    """(..., m, m) Toeplitz M[..., l, j] = v[..., (l-j) + m - 1] from the
    (..., 2m-1) two-sided lag vector, gather-free: diagonal d = j - l ∈
    [-(m-1), m-1] holds v[m-1-d], so the _skew_toeplitz table is
    [flip(v[:m]), 0, 0, flip(v[m:])]."""
    z2 = jnp.zeros(v.shape[:-1] + (2,), v.dtype)
    e = jnp.concatenate([jnp.flip(v[..., :m], axis=-1), z2,
                         jnp.flip(v[..., m:], axis=-1)], axis=-1)
    return _skew_toeplitz(e, m)


def _tri_corr_wrap(a: jnp.ndarray, b: jnp.ndarray, m: int) -> jnp.ndarray:
    """Circular-correlation alias terms: w[j] = Σ_{t<j} a[t]·conj(b[t+m-j]).

    a = head of s1, b = tail of s2 (both length m). Subtracting w from the
    length-N circular correlation gives the exact linear (zero-padded)
    correlation without a 2N FFT.
    """
    # H[j, t] = conj(b)[t-j+m] for t < j, i.e. diagonal d = t-j ∈ [-(m-1), -1]
    # holds conj(b)[m+d] — the d < 0 half of the _skew_toeplitz table
    z = jnp.zeros(m + 2, b.dtype)
    e = jnp.concatenate([z, jnp.conj(b[1:])])
    return _skew_toeplitz(e, m) @ a


def _tri_conv_wrap(taps: jnp.ndarray, tail: jnp.ndarray, m: int) -> jnp.ndarray:
    """Circular-convolution alias terms: w[t] = Σ_{j>t} taps[j]·tail[m+t-j].

    tail = last m samples of the signal. Subtracting w from the first m
    samples of the length-N circular convolution gives the linear one.
    """
    # H[t, j] = tail[m-(j-t)] for j > t: diagonal d = j-t ∈ [1, m-1] holds
    # tail[m-d] ⇒ e[d] = tail[m-d] (the d > 0 half), zero elsewhere
    z1 = jnp.zeros(1, tail.dtype)
    zr = jnp.zeros(m + 1, tail.dtype)
    e = jnp.concatenate([z1, jnp.flip(tail[1:]), zr])
    return _skew_toeplitz(e, m) @ taps


def _toeplitz_ls_pass(rs: jnp.ndarray, srv: jnp.ndarray, m: int):
    """One LS clutter pass against a (possibly modulated) reference ``rs``.

    All correlations/convolutions run as length-N circular FFTs with exact
    triangular alias corrections (see the *_wrap helpers) — N is a power of
    two in every radar configuration, so this halves the FFT lengths and
    removes four of the nine transforms a zero-padded formulation needs.
    """
    n = srv.shape[0]
    f_rs = jnp.fft.fft(rs)
    f_srv = jnp.fft.fft(srv)
    rs_tail = rs[n - m:]
    ac = jnp.fft.ifft(f_rs * jnp.conj(f_rs))[:m] \
        - _tri_corr_wrap(rs[:m], rs_tail, m)
    cc = jnp.fft.ifft(f_srv * jnp.conj(f_rs))[:m] \
        - _tri_corr_wrap(srv[:m], rs_tail, m)
    taps = toeplitz_solve(ac, cc)
    circ = jnp.fft.ifft(f_rs * jnp.fft.fft(taps, n))
    head = circ[:m] - _tri_conv_wrap(taps, rs_tail, m)
    clutter = jnp.concatenate([head, circ[m:]])
    return (srv - clutter).astype(jnp.complex64), taps


@functools.partial(jax.jit, static_argnames=("filter_len", "peek", "return_filter"))
def ls_filter_toeplitz(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                       peek: int = 10, return_filter: bool = False):
    """WSS block LS clutter canceller (reference clutter_removal.py:109-160).

    Solves the Toeplitz normal equations built from linear correlation lags
    of the peek-advanced reference channel, then subtracts the estimated
    clutter (full convolution of the taps with the reference, truncated).
    """
    m = filter_len + peek
    rs = jnp.roll(ref, -peek)
    out, taps = _toeplitz_ls_pass(rs, srv, m)
    if return_filter:
        return out, taps
    return out


def _modulated_ref_spectra(ref, n: int, m: int, peek: int, sample_rate: float,
                           doppler_bins, extra=None):
    """Spectra, heads and tails of the per-bin modulated references.

    Returns (f_rs_all, heads, tails): the FFT of roll(ref·e^{j2πf_b t}, -peek)
    for every Doppler bin, plus its first/last m time-domain samples. When
    ``extra`` (a (k, n) row stack) is given, its forward spectra ride the
    same batched transform — one deeper MXU-DFT call instead of separate
    dispatches — and a fourth element f_extra is returned.

    Fast path: for integer bin shifts k (f_b·T cycles over the chunk ≈ an
    integer — true for every near-integer-second CPI, including the reference
    FM geometry where f_b·T = f_b·0.999844), FFT(ref·e^{j2πkt/N}) is EXACTLY
    roll(FFT(ref), k); the residual fractional-bin ramp e^{jωδt} (δ = f_b·T−k,
    |δ| ≈ 3e-4 here) expands as 1 + jωδt − (ωδt)²/2 with relative error
    (2πδ)^{p+1}/(p+1)! < 5e-6 — below float32 round-off. So ALL bins'
    spectra assemble from 2-3 base FFTs (ref, t·ref[, t²·ref]) by integer
    spectrum rolls, instead of one full N-point FFT per bin. The roll by
    -peek is an exact static phase ramp. Configs whose bins are far from
    integer (|δ| > 5e-3) fall back to the direct per-bin FFTs.

    Heads/tails are built from exact float64 host-side phase tables (more
    accurate than the float32 device ramp they replace).
    """
    bins = [float(f) for f in doppler_bins]
    nb = len(bins)
    T = n / float(sample_rate)
    mus = [f * T for f in bins]                   # oscillator cycles per chunk
    ks = [int(round(mu)) for mu in mus]
    deltas = [mu - k for mu, k in zip(mus, ks)]
    dmax = max(abs(d) for d in deltas)
    order = 1 if dmax <= 5e-4 else (2 if dmax <= 5e-3 else 0)

    # exact heads/tails: rs_b[t] = ref[(t+peek) mod n]·e^{j2πc_b·((t+peek)%n)}
    head_base = ref[peek:peek + m]
    tail_base = jnp.concatenate([ref[n - m + peek:], ref[:peek]])
    tau_h = np.arange(peek, peek + m, dtype=np.float64)
    tau_t = np.arange(n - m + peek, n + peek, dtype=np.float64)
    tau_t = np.where(tau_t < n, tau_t, tau_t - n)

    def phase_tab(tau):
        cyc = np.mod(np.outer(np.asarray(mus), tau / n), 1.0)
        return jnp.asarray(np.exp(2j * np.pi * cyc).astype(np.complex64))

    heads = head_base[None, :] * phase_tab(tau_h)
    tails = tail_base[None, :] * phase_tab(tau_t)

    if order == 0:
        t32 = jnp.arange(n, dtype=jnp.float32) / np.float32(sample_rate)
        theta = 2.0 * np.pi * jnp.asarray(np.asarray(bins, np.float32))[:, None] \
            * t32[None, :]
        rs_all = jnp.roll(ref[None, :] * jax.lax.complex(jnp.cos(theta),
                                                         jnp.sin(theta)),
                          -peek, axis=1)
        if extra is not None:
            stacked = fft_auto(jnp.concatenate([rs_all, extra]), axis=1)
            return stacked[:nb], heads, tails, stacked[nb:]
        return fft_auto(rs_all, axis=1), heads, tails

    w = 2.0 * np.pi / n
    tdev = jnp.arange(n, dtype=jnp.float32)
    # one batched transform for all base spectra (2-3 rows, plus any extra
    # rows the caller wants transformed) instead of separate full-length
    # calls — the MXU DFT then runs one kernel set over a deeper batch
    rows = [ref, ref * tdev]
    if order == 2:
        rows.append(ref * (tdev * tdev))
    nbase = len(rows)
    stacked = jnp.stack(rows) if extra is None else jnp.concatenate(
        [jnp.stack(rows), extra])
    fb = fft_auto(stacked, axis=-1)
    f_extra = None if extra is None else fb[nbase:]
    f0, f1 = fb[0], fb[1]
    f2 = fb[2] if order == 2 else None
    ramp = jnp.asarray(np.exp(
        2j * np.pi * np.mod(np.arange(n, dtype=np.float64) * peek / n, 1.0)
    ).astype(np.complex64))                        # time roll by -peek
    ys = []
    for k, d in zip(ks, deltas):
        s = np.float32(w * d)
        y = jnp.roll(f0, k) + (1j * s) * jnp.roll(f1, k)
        if order == 2:
            y = y - np.float32(0.5 * (w * d) ** 2) * jnp.roll(f2, k)
        ys.append(y)
    f_rs_all = ramp[None, :] * jnp.stack(ys)
    if extra is not None:
        return f_rs_all, heads, tails, f_extra
    return f_rs_all, heads, tails


def _solver_data(ac_all: jnp.ndarray, m: int, solver: str):
    """Per-bin Toeplitz solve machinery from the (nb, m) autocorrelations.

    Returns (xs, apply_inv) where xs is a tuple of per-bin arrays (leading
    axis = bin) and apply_inv(per_bin_slice_of_xs, rhs) solves T_b x = rhs.
    """
    if solver == "levinson":
        # O(m²) Levinson recursion + Gohberg-Semencul generators instead of
        # O(m³) dense inverses: the per-bin solve becomes four padded-FFT
        # convolutions (gs_apply)
        x_all = levinson_first_col(ac_all)
        fft_m = _next_pow2(2 * m)
        fx_all, fy_all, delta_all = gs_generators(x_all, fft_m)
        xs = (fx_all, fy_all, delta_all)

        def apply_inv(sd, cc):
            fx, fy, delta = sd
            return gs_apply(fx, fy, delta, cc)
    elif solver == "gs_matrix":
        # Levinson + dense T⁻¹ assembled by applying the G-S generators to
        # the m-column identity in ONE batched 4-transform round (every bin
        # and basis vector rides the same dft_matmuls — deep, MXU-friendly,
        # gather-free). The scan's per-bin solve is then a single batched
        # matvec instead of gs_apply's 4 sequential tiny-transform
        # dispatches (measured 2.1 ms of the 5-bin stage, the largest
        # single contributor — see docs/PERFORMANCE.md ablation).
        x_all = levinson_first_col(ac_all)
        fft_m = _next_pow2(2 * m)
        fx_all, fy_all, delta_all = gs_generators(x_all, fft_m)
        eye = jnp.eye(m, dtype=jnp.complex64)
        # rows of w_b are T_b⁻¹ applied to basis vectors: w_b[i] = T_b⁻¹ eᵢ
        w_all = jax.vmap(
            lambda fx, fy, dl: gs_apply(fx[None, :], fy[None, :], dl[None],
                                        eye))(fx_all, fy_all, delta_all)
        xs = (w_all,)

        def apply_inv(sd, cc):
            # T⁻¹ is Hermitian; w rows are its columns transposed
            return jnp.einsum("ba,b->a", sd[0], cc,
                              precision=jax.lax.Precision.HIGHEST)
    elif solver == "gs_dense":
        # Levinson factorisation + DENSE Gohberg-Semencul inverse assembly
        # (batched, outside the scan): the per-bin solve inside the
        # latency-bound scan is then a single matvec instead of gs_apply's
        # 4-dispatch transform chain
        x_all = levinson_first_col(ac_all)
        inv_all = gs_dense_inverse(x_all)
        xs = (inv_all,)

        def apply_inv(sd, cc):
            return jnp.einsum("ij,j->i", sd[0], cc,
                              precision=jax.lax.Precision.HIGHEST)
    elif solver == "cholesky":
        inv_all = jax.vmap(_toeplitz_inverse_c)(ac_all)
        xs = (inv_all,)

        def apply_inv(sd, cc):
            return sd[0] @ cc
    else:
        raise ValueError(f"unknown toeplitz solver {solver!r}")
    return xs, apply_inv


def ls_filter_multiple(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                       sample_rate: float, doppler_bins=(0,),
                       solver: str = "levinson",
                       impl: str = "carry") -> jnp.ndarray:
    """Sequential per-Doppler-bin LS passes (reference clutter_removal.py:162-187).

    Nonzero bins frequency-shift the reference before filtering; the pipeline
    uses bins (0, 1, -1, 2, -2) Hz (reference main.py:174).

    impl="carry" (default, the production path): frequency-domain
    residual-carry formulation — per-bin spectra assembled from two base
    FFTs by integer spectrum rolls, sequential lax.scan over bins.
    impl="segment": the segment-Gram formulation (_ls_multiple_segment) —
    no full-length transforms, every heavy step batched over bins, and
    uniformly exact for FRACTIONAL Doppler bins (no Taylor-ramp
    approximation). MEASURED SLOWER on v5e at the FM geometry (bench_stages
    2026-08-19: 19.8-20.7 ms/batch8 across segment FFT lengths 2048-8192 vs
    carry's 13.6): the Gram needs ext+plain spectra per bin (2·nb+1
    segment-FFT passes ≈ 2.2·N·(nb+1) transform samples), which outweighs
    the full-length transforms it removes at nb=5. Kept as the exactness
    oracle / the correct choice for fractional bins.
    """
    if impl == "segment":
        return _ls_multiple_segment(ref, srv, filter_len, sample_rate,
                                    doppler_bins, solver)
    if impl == "coupled":
        return _ls_multiple_coupled(ref, srv, filter_len, sample_rate,
                                    doppler_bins, solver)
    if impl != "carry":
        raise ValueError(f"unknown ls_filter_multiple impl {impl!r}")
    n = ref.shape[0]
    peek = 10
    m = filter_len + peek

    # The Toeplitz system matrix of each pass depends only on the (modulated)
    # reference channel — never on the surveillance residual — so every bin's
    # autocorrelation and solve generators are computed up front in one
    # batched shot; the sequential scan then only does the cheap per-bin work
    # (cross-correlation, generator solves, clutter subtraction). The
    # surveillance channel's forward spectrum rides the same batched
    # transform (extra row) — one deeper MXU-DFT dispatch.
    f_rs_all, heads, tails, f_extra = _modulated_ref_spectra(
        ref, n, m, peek, sample_rate, doppler_bins, extra=srv[None, :])
    ac_all = partial_ifft(f_rs_all * jnp.conj(f_rs_all), m) \
        - jax.vmap(lambda a, b: _tri_corr_wrap(a, b, m))(heads, tails)
    # vanishing diagonal guard: relative 1e-25 is rounded away entirely for
    # real captures (below float32 eps) but keeps the Cholesky finite for
    # all-zero frames (batch padding)
    guard = 1e-25 * jnp.maximum(1.0, jnp.abs(ac_all[:, 0]))
    ac_all = ac_all.at[:, 0].add(guard.astype(ac_all.dtype))
    solve_xs, apply_inv = _solver_data(ac_all, m, solver)

    # Δcc kernels: R_b[j, t] = conj(rs_b[t-j]) for t ≥ j — the effect of a
    # head-supported time correction on the first m correlation lags.
    # Diagonal d = t-j ∈ [0, m-1] holds conj(heads[d]) (gather-free build,
    # see _skew_toeplitz)
    r_all = _skew_toeplitz(
        jnp.concatenate([jnp.conj(heads),
                         jnp.zeros((heads.shape[0], m + 1), heads.dtype)],
                        axis=-1), m)

    # The surveillance residual is carried in the FREQUENCY domain plus an
    # m-sparse time-domain head correction (cur = ifft(f_cur) + corr on the
    # first m samples), so each bin needs only zoom-FFT work — no full
    # N-point transform ever runs inside the bin loop.
    f_cur0 = f_extra[0]
    head0 = srv[:m]          # ifft(f_cur0)[:m] — the corr part starts at zero

    def body(carry, xs):
        f_cur, ifft_head, corr = carry
        f_rs, rs_tail, sd, r_mat = xs
        # linear correlation of cur = ifft(f_cur) + scatter(corr):
        #   circular(f_cur part) + R·corr (the corr's in-range lags; its wrap
        #   lags cancel against the wrap subtraction, which therefore applies
        #   to the ifft part only)
        cc = partial_ifft(f_cur * jnp.conj(f_rs), m) \
            + r_mat @ corr \
            - _tri_corr_wrap(ifft_head, rs_tail, m)
        taps = apply_inv(sd, cc).astype(jnp.complex64)
        f_clutter = f_rs * sparse_fft(taps, n)
        head_fix = _tri_conv_wrap(taps, rs_tail, m)
        f_cur = f_cur - f_clutter
        # ifft(f_clutter)[:m] without a transform: the circular-conv head is
        # the causal part Σ_{j≤t} taps[j]·rs[t-j] (= taps @ conj(R), R the Δcc
        # kernel built from this bin's heads) plus the wrap terms, which are
        # exactly head_fix — two m×m matvecs instead of a sliced DFT matmul.
        ifft_head = ifft_head - (taps @ jnp.conj(r_mat) + head_fix)
        corr = corr + head_fix
        return (f_cur, ifft_head, corr), None

    (f_cur, _, corr), _ = jax.lax.scan(
        body, (f_cur0, head0, head0 * 0),
        (f_rs_all, tails, solve_xs, r_all), unroll=BIN_SCAN_UNROLL)
    out = ifft_auto(f_cur)
    out = out.at[:m].add(corr)
    return out.astype(jnp.complex64)


# --------------------------------------------------------------------------
# precoupled multi-bin LS (batched couplings, no residual carry)
# --------------------------------------------------------------------------

def _tail_matrices_m(tails: jnp.ndarray, m: int) -> jnp.ndarray:
    """(nb, m-1, m) truncation-tail operators T_b[r, j] = rs_b[n + r - j]
    (j > r) from the (nb, m) last-m-samples tails (tails[i] = rs_b[n-m+i]);
    gather-free via _tail_toeplitz."""
    return _tail_toeplitz(tails, m)


def _ls_multiple_coupled(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                         sample_rate: float, doppler_bins=(0,),
                         solver: str = "levinson") -> jnp.ndarray:
    """Precoupled formulation of the sequential multi-bin Toeplitz LS.

    Same unrolled algebra as _ls_multiple_segment (the sequential passes are
    linear in the carried residual):

        taps_b = T_b^{-1} (cc0_b - sum_{a<b} M_ab @ taps_a)
        out    = srv - sum_b trunc_n(conv(rs_b, taps_b))
        M_ab[u, j] = G_ab[u-j] - (T_b^H T_a)[u, j]

    but with every correlation computed the carry impl's way — circular
    full-length spectra products + batched zoom extraction + exact
    triangular alias corrections — instead of segment Grams. vs impl="carry"
    this removes ALL full-length work from the sequential chain: the scan's
    per-bin zoom + sparse FFT + two spectrum updates (measured ~1.3 ms/bin,
    mostly dependency latency) become one batched 30-row zoom and one
    batched reconstruction, leaving only m-sized matvecs and G-S solves
    serial. Transform count is unchanged (f0/f1/srv forward + one inverse).
    Matches carry / the float64 oracle to f32 round-off (test_clutter).
    """
    n = ref.shape[0]
    peek = 10
    m = filter_len + peek
    nb = len(doppler_bins)

    f_rs_all, heads, tails = _modulated_ref_spectra(
        ref, n, m, peek, sample_rate, doppler_bins)
    f_srv = fft_auto(srv)

    # every needed correlation spectrum, zoomed in ONE batched call:
    #   rows 0..nb-1          : autocorrs     q_bb
    #   rows nb..2nb-1        : cc0           f_srv * conj(f_rs_b)
    #   next np rows          : G_ab  (a<b)   q_ab = f_rs_a * conj(f_rs_b)
    #   next np rows          : G_ba  (a<b)   conj(q_ab)
    pairs = [(a, b) for b in range(nb) for a in range(b)]
    ai = np.array([p[0] for p in pairs], np.int64)
    bi = np.array([p[1] for p in pairs], np.int64)
    q_diag = f_rs_all * jnp.conj(f_rs_all)
    q_cc = f_srv[None, :] * jnp.conj(f_rs_all)
    if pairs:
        q_pair = f_rs_all[jnp.asarray(ai)] * jnp.conj(f_rs_all[jnp.asarray(bi)])
        stack = jnp.concatenate([q_diag, q_cc, q_pair, jnp.conj(q_pair)])
    else:
        stack = jnp.concatenate([q_diag, q_cc])
    lags = partial_ifft(stack, m)                       # (2nb + 2np, m)

    # exact circular→linear alias corrections (head of s1 vs tail of s2)
    tcw = jax.vmap(lambda a, b: _tri_corr_wrap(a, b, m))
    srv_heads = jnp.broadcast_to(srv[:m], (nb, m))
    ac_all = lags[:nb] - tcw(heads, tails)
    cc0 = lags[nb:2 * nb] - tcw(srv_heads, tails)
    npairs = len(pairs)
    if pairs:
        g_ab = lags[2 * nb:2 * nb + npairs] - tcw(heads[jnp.asarray(ai)],
                                                  tails[jnp.asarray(bi)])
        g_ba = lags[2 * nb + npairs:] - tcw(heads[jnp.asarray(bi)],
                                            tails[jnp.asarray(ai)])
        # Toeplitz part from the two-sided lags: G_ab[-u] = conj(G_ba[u])
        v = jnp.concatenate([jnp.conj(jnp.flip(g_ba[:, 1:], axis=-1)), g_ab],
                            axis=-1)                    # (np, 2m-1)
        m_toep = _two_sided_toeplitz(v, m)              # (np, m, m)
        t_all = _tail_matrices_m(tails, m)              # (nb, m-1, m)
        m_tail = jnp.einsum("prl,prj->plj",
                            jnp.conj(t_all[jnp.asarray(bi)]),
                            t_all[jnp.asarray(ai)],
                            precision=jax.lax.Precision.HIGHEST)
        m_pair = m_toep - m_tail
    pair_of = {ab: i for i, ab in enumerate(pairs)}

    guard = 1e-25 * jnp.maximum(1.0, jnp.abs(ac_all[:, 0]))
    ac_all = ac_all.at[:, 0].add(guard.astype(ac_all.dtype))
    solve_xs, apply_inv = _solver_data(ac_all, m, solver)

    # the only serial piece: per bin, b matvecs + one G-S solve (all m-sized)
    taps = []
    for b in range(nb):
        cc = cc0[b]
        for a in range(b):
            cc = cc - m_pair[pair_of[(a, b)]] @ taps[a]
        sd = tuple(x[b] for x in solve_xs)
        taps.append(apply_inv(sd, cc).astype(jnp.complex64))
    taps_all = jnp.stack(taps)                          # (nb, m)

    # batched reconstruction: one spectrum combine + one inverse transform
    f_clut = jnp.sum(f_rs_all * sparse_fft(taps_all, n), axis=0)
    out = ifft_auto(f_srv - f_clut)
    head_fix = jnp.sum(
        jax.vmap(lambda t, tl: _tri_conv_wrap(t, tl, m))(taps_all, tails),
        axis=0)
    out = out.at[:m].add(head_fix)
    return out.astype(jnp.complex64)


# --------------------------------------------------------------------------
# segment-Gram multi-bin LS (exactness oracle / fractional-bin path)
# --------------------------------------------------------------------------

# override for the segment FFT length (power of two); None = auto (see
# _segment_geometry). Module-level so TPU benchmarks can sweep it.
SEGMENT_FFT_LEN: int | None = None


def _segment_geometry(n: int, m: int):
    """(F, L, H, K): FFT length, segment stride, halo, segment count.

    H ≥ m-1 keeps lags 0..m-1 alias-free; L = F - H ≥ H keeps the
    overlap-add tails non-overlapping; F defaults to 4096 (measured sweet
    spot for the MXU four-step transform) capped at the problem size.
    """
    h = _round_up(max(m - 1, 1), 128)
    f = SEGMENT_FFT_LEN or max(_next_pow2(2 * h), min(4096, _next_pow2(n)))
    if f < 2 * h:
        raise ValueError(f"segment FFT length {f} < 2*halo {2 * h}")
    l = f - h
    k = -(-n // l)
    return f, l, h, k


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _seg_fft(x: jnp.ndarray) -> jnp.ndarray:
    from passiveradar_tpu.ops import mxufft
    if use_mxu():
        return mxufft.fft(x, axis=-1)
    return jnp.fft.fft(x, axis=-1)


def _seg_ifft(x: jnp.ndarray) -> jnp.ndarray:
    from passiveradar_tpu.ops import mxufft
    if use_mxu():
        return mxufft.ifft(x, axis=-1)
    return jnp.fft.ifft(x, axis=-1)


def _seg_windows(x: jnp.ndarray, f: int, l: int, h: int, k: int):
    """Overlap-save windows of a length-n signal (zero-extended).

    Returns (ext, plain): ext[s] = x[s·l : s·l + f] (the correlation left
    operand / full halo window), plain[s] = x[s·l : s·l + l] zero-padded to
    f (the conjugate operand and the convolution operand). Built from
    reshapes and concats only — no gathers.
    """
    n = x.shape[0]
    zp = jnp.pad(x, (0, k * l + l - n))   # l ≥ h: covers the last ext window
    base = zp[:k * l].reshape(k, l)
    nxt = zp[l:l + k * l].reshape(k, l)[:, :h]
    ext = jnp.concatenate([base, nxt], axis=1)
    plain = jnp.concatenate([base, jnp.zeros((k, h), x.dtype)], axis=1)
    return ext, plain


def _modulated_refs(ref: jnp.ndarray, n: int, peek: int, sample_rate: float,
                    doppler_bins) -> jnp.ndarray:
    """rs_b = roll(ref · e^{j2π f_b t / Fs}, -peek) for every Doppler bin.

    Exact for arbitrary (fractional) bins: the oscillator is an outer
    product of two host-side float64 factor tables (ops/mixer.py), so there
    is no integer-bin restriction and no Taylor-ramp truncation — unlike the
    spectrum-roll trick of the carry impl this path is uniformly exact.
    """
    from passiveradar_tpu.ops.mixer import frequency_shift
    rows = []
    for f_b in doppler_bins:
        g = ref if float(f_b) == 0.0 else frequency_shift(
            ref, float(f_b), float(sample_rate))
        rows.append(jnp.concatenate([g[peek:], g[:peek]]) if peek else g)
    return jnp.stack(rows)


def _tail_matrices(rs_all: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """(nb, m-1, m) truncation-tail operators T_b[r, j] = rs_b[n + r - j].

    T_b · taps is the part of the linear convolution conv(rs_b, taps) that
    falls beyond sample n — removed by the reference's truncation
    (clutter_removal.py:153-155) and therefore absent from the residual the
    next bin's pass correlates against. Gather-free via _tail_toeplitz
    (tails[0] = rs[n-m] rides along unused: only diagonals d ≥ 1 appear).
    """
    return _tail_toeplitz(rs_all[:, n - m:], m)


def _ls_multiple_segment(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                         sample_rate: float, doppler_bins=(0,),
                         solver: str = "levinson") -> jnp.ndarray:
    """Segment-Gram formulation of the sequential multi-bin Toeplitz LS.

    Algebra: the sequential passes (reference clutter_removal.py:162-187)
    are linear in the carried residual, so they unroll exactly into

        taps_b = T_b⁻¹ (corr(srv, rs_b) - Σ_{a<b} M_{a,b} taps_a)
        out    = srv - Σ_b trunc_n(conv(rs_b, taps_b))

    with M_{a,b}[l, j] = G_{a,b}[l-j] - (T_bᴴ T_a)[l, j], where G is the
    linear cross-correlation of the modulated references and the T terms
    remove the convolution tail the truncation discards. Every correlation
    (auto, cross, and against srv) is the segment-spectra Gram

        corr_{a,b}[u] = ifft(Σ_s FFT(ext_a[s]) · conj(FFT(plain_b[s])))[u]

    — one batched overlap-save FFT of all signals, one small einsum over
    segments, and sliced inverse-DFT matmuls. Nothing runs at full chunk
    length: the old path's four full-N transforms plus two zoom transforms
    per bin become ~2.2·N·(nb+1) samples of segment-length MXU work, and the
    per-bin sequential chain shrinks to m-sized matvecs and G-S solves.
    The 5-bin reconstruction is one more segment-length inverse (overlap-
    add). Matches the carry impl / float64 oracle to f32 round-off
    (tests/test_clutter.py).
    """
    n = ref.shape[0]
    peek = 10
    m = filter_len + peek
    nb = len(doppler_bins)
    f, l, h, k = _segment_geometry(n, m)

    rs_all = _modulated_refs(ref, n, peek, sample_rate, doppler_bins)

    # segment spectra: ext rows for [srv, rs_0..rs_{nb-1}], plain for rs_b
    srv_ext, _ = _seg_windows(srv, f, l, h, k)
    exts, plains = [srv_ext], []
    for b in range(nb):
        e, p = _seg_windows(rs_all[b], f, l, h, k)
        exts.append(e)
        plains.append(p)
    spec = _seg_fft(jnp.stack(exts + plains))          # (1+2nb, k, f)
    e_spec = spec[:1 + nb]
    p_spec = spec[1 + nb:]

    # Gram over segments → every needed correlation spectrum at once
    gram = jnp.einsum("akf,bkf->abf", e_spec, jnp.conj(p_spec),
                      precision=jax.lax.Precision.HIGHEST)
    if f <= 4096:
        lags = dft_matmul(gram, axis=-1, inverse=True, out_len=m)
    else:
        lags = ifft_auto(gram, axis=-1)[..., :m]
    cc0 = lags[0]                                      # (nb, m)
    gpos = lags[1:]                                    # (nb, nb, m): G_{a,b}[u≥0]
    ac_all = gpos[jnp.arange(nb), jnp.arange(nb)]      # (nb, m)

    # vanishing diagonal guard (all-zero padding frames stay finite)
    guard = 1e-25 * jnp.maximum(1.0, jnp.abs(ac_all[:, 0]))
    ac_all = ac_all.at[:, 0].add(guard.astype(ac_all.dtype))
    solve_xs, apply_inv = _solver_data(ac_all, m, solver)

    # coupling matrices for the ordered pairs a (earlier) → b (later)
    pairs = [(a, b) for b in range(nb) for a in range(b)]
    if pairs:
        ai = np.array([p[0] for p in pairs])
        bi = np.array([p[1] for p in pairs])
        # Toeplitz part from the two-sided lag vector
        # v[d + m-1] = G_{a,b}[d],  G_{a,b}[-u] = conj(G_{b,a}[u])
        neg = jnp.conj(jnp.flip(gpos[bi, ai, 1:], axis=-1))
        v = jnp.concatenate([neg, gpos[ai, bi]], axis=-1)   # (np, 2m-1)
        m_toep = _two_sided_toeplitz(v, m)                  # (np, m, m)
        # truncation-tail correction  (T_bᴴ T_a)
        t_all = _tail_matrices(rs_all, n, m)                # (nb, m-1, m)
        m_tail = jnp.einsum("prl,prj->plj", jnp.conj(t_all[bi]), t_all[ai],
                            precision=jax.lax.Precision.HIGHEST)
        m_pair = m_toep - m_tail
    pair_of = {ab: i for i, ab in enumerate(pairs)}

    # the sequential chain: per bin, b matvecs + one G-S solve — all m-sized
    taps = []
    for b in range(nb):
        cc = cc0[b]
        for a in range(b):
            cc = cc - m_pair[pair_of[(a, b)]] @ taps[a]
        sd = tuple(x[b] for x in solve_xs)
        taps.append(apply_inv(sd, cc).astype(jnp.complex64))

    # reconstruction: one overlap-add inverse over the bin-summed spectra
    taps_all = jnp.stack(taps)                              # (nb, m)
    if f <= 4096:
        taps_f = dft_matmul(taps_all, axis=-1, n=f)
    else:
        taps_f = fft_auto(jnp.pad(taps_all, ((0, 0), (0, f - m))), axis=-1)
    clut_spec = jnp.einsum("bkf,bf->kf", p_spec, taps_f)
    seg = _seg_ifft(clut_spec)                              # (k, f)
    main = seg[:, :l].reshape(k * l)
    tails = jnp.concatenate([seg[:, l:], jnp.zeros((k, l - h), seg.dtype)],
                            axis=1).reshape(k * l)
    clut = main + jnp.concatenate([jnp.zeros(l, seg.dtype), tails])[:k * l]
    return (srv - clut[:n]).astype(jnp.complex64)


def _circular_gram_and_rhs(ref, srv, filter_len: int, peek: int):
    """Gram matrix Aᴴ A and right-hand side Aᴴ srv of the circular lag matrix.

    A's columns are roll(ref, l) for l = -peek..filter_len-1 (the reference's
    construction, clutter_removal.py:31-37) — so AᴴA[a,b] = G[l_a-l_b] (by the
    Hermitian symmetry of the circular autocorrelation G) and
    (Aᴴ srv)[a] = H[l_a], with G, H circular correlations: no N×L matrix.
    """
    n = ref.shape[0]
    m = filter_len + peek
    lags = np.arange(-peek, filter_len)
    g = circular_corr_lags(ref, ref)       # G[l] = Σ ref[t+l] conj(ref[t])
    h = circular_corr_lags(srv, ref)       # H[l] = Σ srv[t+l] conj(ref[t])
    d = np.mod(lags[:, None] - lags[None, :], n)
    gram = g[jnp.asarray(d)]
    rhs = h[jnp.asarray(np.mod(lags, n))]
    return gram, rhs, lags, m


def _apply_circular_taps(ref, srv, taps, lags):
    """srv - Σ_a taps[a]·roll(ref, lags[a]) via one circular convolution."""
    n = ref.shape[0]
    wpad = jnp.zeros(n, taps.dtype).at[jnp.asarray(np.mod(lags, n))].add(taps)
    clutter = jnp.fft.ifft(jnp.fft.fft(ref) * jnp.fft.fft(wpad))
    return (srv - clutter).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("filter_len", "peek", "return_filter"))
def ls_filter(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
              reg: float = 1.0, peek: int = 10, return_filter: bool = False):
    """Direct block LS filter with Tikhonov regularisation
    (reference clutter_removal.py:6-56), via the circular-Gram formulation."""
    gram, rhs, lags, m = _circular_gram_and_rhs(ref, srv, filter_len, peek)
    taps = _solve_complex(gram + reg * jnp.eye(m, dtype=gram.dtype), rhs)
    out = _apply_circular_taps(ref, srv, taps, lags)
    if return_filter:
        return out, taps
    return out


@functools.partial(jax.jit, static_argnames=("filter_len", "peek", "return_filter"))
def ls_filter_svd(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                  peek: int = 10, return_filter: bool = False):
    """Pseudo-inverse block LS filter with small-singular-value cutoff
    (reference clutter_removal.py:58-107).

    Uses the eigendecomposition of the real embedding of the Hermitian Gram
    matrix; eigenvalues are squared singular values of the lag matrix, and
    those with sqrt below the reference's 1e-10 cutoff are discarded.
    """
    gram, rhs, lags, m = _circular_gram_and_rhs(ref, srv, filter_len, peek)
    gr, gi = jnp.real(gram), jnp.imag(gram)
    big = jnp.block([[gr, -gi], [gi, gr]])
    evals, evecs = jnp.linalg.eigh(big)
    inv = jnp.where(jnp.sqrt(jnp.maximum(evals, 0.0)) < 1e-10, 0.0,
                    1.0 / jnp.maximum(evals, 1e-30))
    rhs_big = jnp.concatenate([jnp.real(rhs), jnp.imag(rhs)])
    sol = evecs @ (inv * (evecs.T @ rhs_big))
    taps = jax.lax.complex(sol[:m], sol[m:]).astype(jnp.complex64)
    out = _apply_circular_taps(ref, srv, taps, lags)
    if return_filter:
        return out, taps
    return out


# --------------------------------------------------------------------------
# adaptive filters
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("filter_len", "peek", "return_filter"))
def nlms_filter(ref: jnp.ndarray, srv: jnp.ndarray, filter_len: int,
                mu: float, peek: int = 10, initial_taps=None,
                return_filter: bool = False):
    """Normalised LMS clutter canceller (reference clutter_removal.py:189-249).

    Per-sample recurrence as lax.scan; at step k the tap input vector is
    flip(ref[k+1 : k+1+L+peek]), the error e = srv[k+L] - wᴴu becomes output
    sample L+k, and w ← w + mu·u·conj(e)/(uᴴu). Taps are kept in unflipped
    order internally (equivalent arithmetic); the returned taps match the
    reference's orientation.
    """
    n = srv.shape[0]
    if initial_taps is not None:
        w0f = jnp.flip(jnp.asarray(initial_taps, jnp.complex64))
        filter_len = int(w0f.shape[0]) - peek
    else:
        w0f = jnp.zeros(filter_len + peek, jnp.complex64)
    m = filter_len + peek
    steps = n - m

    def step(wf, k):
        u = jax.lax.dynamic_slice(ref, (k + 1,), (m,))
        e = srv[k + filter_len] - jnp.vdot(wf, u)
        wf = wf + mu * u * jnp.conj(e) / jnp.vdot(u, u)
        return wf, e

    wf, es = jax.lax.scan(step, w0f, jnp.arange(steps))
    out = jnp.zeros(n, jnp.complex64).at[filter_len:filter_len + steps].set(es)
    if return_filter:
        return out, jnp.flip(wf)
    return out


@functools.partial(jax.jit,
                   static_argnames=("lattice_len", "delay_line_len", "peek", "return_filter"))
def gal_jpe(ref: jnp.ndarray, srv: jnp.ndarray, lattice_len: int,
            delay_line_len: int, mu1: float, mu2: float, peek: int = 10,
            return_filter: bool = False):
    """Gradient adaptive lattice joint-process estimator
    (reference clutter_removal.py:251-364) as a lax.scan.

    Divergence: the reference's step-size annealing uses min(·, 5e-3) on
    ``γμ1 + δe²`` which is complex for complex signals (unorderable — that
    code path only runs for real input); here |e|² is used, which is the
    evident intent and is identical for real signals.
    """
    if lattice_len > delay_line_len:
        raise ValueError("delay line must be at least as long as the lattice")
    n = srv.shape[0]
    dl = delay_line_len
    beta, gamma, delta = 0.9, 0.999, 1e-8
    cplx = jnp.complex64

    init = dict(
        b=jnp.zeros(dl, cplx), k=jnp.zeros(dl, cplx),
        p=jnp.full(dl, 1e-8, jnp.float32), h=jnp.zeros(dl, cplx),
        mu1=jnp.float32(mu1),
    )

    def step(st, x):
        x_ref, x_srv = x
        bo = st["b"]
        k_ = st["k"]

        def lattice(carry, inp):
            f_prev, = carry
            bo_prev, km = inp
            f_m = f_prev - jnp.conj(km) * bo_prev
            b_m = bo_prev - km * f_prev
            return (f_m,), (f_m, b_m)

        (f_last,), (f_tail, b_tail) = jax.lax.scan(
            lattice, (x_ref,), (bo[:lattice_len - 1], k_[1:lattice_len]))
        f = jnp.concatenate([jnp.array([x_ref]), f_tail])      # (lattice_len,)
        b_lat = jnp.concatenate([jnp.array([x_ref]), b_tail])  # (lattice_len,)
        if lattice_len < dl:
            # delay-line continuation: b[m] = bo[m-1] for m >= lattice_len
            b = jnp.concatenate([b_lat, bo[lattice_len - 1:-1]])
        else:
            b = b_lat

        # reflection-coefficient update (vectorised: no recurrence)
        em = jnp.abs(f[:-1]) ** 2 + jnp.abs(bo[:lattice_len - 1]) ** 2
        p_new = beta * st["p"][:lattice_len - 1] + (1.0 - beta ** 2) * em
        grad = (jnp.conj(f[:-1]) * b[1:lattice_len]
                + bo[:lattice_len - 1] * jnp.conj(f[1:lattice_len]))
        k_new = k_.at[1:lattice_len].add(
            st["mu1"] * grad / (p_new + 1e-10))
        p_full = st["p"].at[:lattice_len - 1].set(p_new)

        e = x_srv - jnp.vdot(st["h"], b)
        h_new = st["h"] + mu2 * jnp.conj(e) * b / (
            jnp.real(jnp.vdot(b, b)) + 1e-10)
        mu1_new = jnp.minimum(
            gamma * st["mu1"] + delta * jnp.abs(e) ** 2, 5e-3
        ).astype(jnp.float32)
        new = dict(b=b, k=k_new, p=p_full, h=h_new, mu1=mu1_new)
        return new, e

    steps = n - peek - 1
    xs = (jax.lax.dynamic_slice(ref, (peek,), (steps,)), srv[:steps])
    final, es = jax.lax.scan(step, init, xs)
    out = jnp.zeros(n, cplx).at[:steps].set(es)
    if return_filter:
        return out, final["k"], final["h"]
    return out
