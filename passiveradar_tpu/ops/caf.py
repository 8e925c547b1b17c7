"""Cross-ambiguity function (CAF) → range-Doppler maps.

This is the framework's hot kernel, re-derived for TPU rather than translated.

The reference computes, per CPI frame (range_doppler_processing.py:12-90):
for each range lag ℓ ∈ [-R..0], the windowed product
``roll(conj(srv), ℓ) * ref * w`` is FIR-decimated by ``ndecim = N/nf`` with an
all-ones (ndecim+1)-tap zero-phase filter, the first ``nf`` samples kept, and
finally an FFT over the Doppler axis — ≈ 4.7e10 MAC per frame for the FM
configuration, which is where essentially all of its "20 minutes" goes.

Re-derivation (verified exact vs the reference math to float32 round-off):
the zero-phase boxcar decimator at stride ``ndecim`` makes output sample m the
*centred (ndecim+1)-window sum* of the lag product around t = m*ndecim, i.e.

    xambg[m, k] = Σ_{t = m·d - d/2}^{m·d + d/2} w[t]·ref[t]·conj(srv[t+R-k])

(zero for t < 0, circular in srv). Splitting each window into a d-sample
segment plus one boundary sample, the per-segment sums over all lags become a
*linear cross-correlation of each (w·ref) segment against a (d+R)-sample srv
segment* — computed for all 1024 segments at once with three batched
power-of-two FFTs. Total cost drops from O(N·d·R) to O(N log d): ~1e8 FLOP
instead of ~1e11 per frame, in MXU/FFT-friendly batched form with no
materialised (lag × time) product matrix (HBM traffic stays O(N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _spsignal

from passiveradar_tpu.ops.fir import decimate_taps, design_lowpass
from passiveradar_tpu.ops.mxufft import dft_matmul, fft_auto, ifft_auto, use_mxu
from passiveradar_tpu.ops.xcorr import xcorr


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def resolve_window(window, n: int):
    """Resolve a window spec (None | str | tuple | array) to an array.

    jax arrays/tracers pass through unchanged (so the CAF can be called with
    a traced window under jit/vmap); specs become host float32 arrays.
    """
    if window is None:
        return None
    if isinstance(window, (str, tuple)):
        return _spsignal.get_window(window, n).astype(np.float32)
    if isinstance(window, np.ndarray):
        return window.astype(np.float32)
    return window  # jax array or tracer


def _caf_segment_tables(ref, srv, window, range_bins: int, freq_bins: int):
    """Segment tables A (windowed-ref rows) and P (conj-srv rows) for the
    segment-correlation CAF (see module docstring)."""
    n = ref.shape[0]
    nf = freq_bins
    r = range_bins
    d = n // nf          # decimation factor
    half = d // 2
    # number of extra d-rows needed so a segment window of d+R fits
    n_extra = -(-r // d) + 1

    a = ref if window is None else ref * window.astype(ref.dtype)

    # a_pad[u] = a[u - half], zero outside; enough d-rows that segment windows
    # starting from row 1 still span n_extra+1 rows
    rows = nf + n_extra + 1
    a_pad = jnp.concatenate([jnp.zeros(half, a.dtype), a])
    a_pad = jnp.pad(a_pad, (0, rows * d - a_pad.shape[0]))
    aa = a_pad.reshape(rows, d)

    # sext[u] = conj(srv[(u - half) mod n]) — circular, matching np.roll.
    # Built by concatenation (a circular shift), never a gather: large
    # gathers are slow on TPU.
    total = rows * d
    sc = jnp.conj(srv)
    parts = [sc[n - half:]]
    remaining = total - half
    while remaining > n:
        parts.append(sc)
        remaining -= n
    parts.append(sc[:remaining])
    pp = jnp.concatenate(parts).reshape(rows, d)
    return aa, pp, d, n_extra


def _caf_pre_rows(aa, pp, d: int, n_extra: int, range_bins: int,
                  row_count: int, row0=0):
    """pre[m, k] for segment rows m ∈ [row0, row0+row_count).

    Row-wise independent, so tensor-parallel CAF shards this over devices.
    row0 may be traced (dynamic slice).
    """
    r = range_bins
    nf = row_count
    a_rows = jax.lax.dynamic_slice_in_dim(aa, row0, nf + 1, axis=0)
    p_rows = jax.lax.dynamic_slice_in_dim(pp, row0, nf + n_extra + 1, axis=0)

    def windows_from(start_row: int, width: int):
        parts = [p_rows[start_row + i:start_row + i + nf]
                 for i in range(n_extra + 1)]
        return jnp.concatenate(parts, axis=1)[:, :width]

    # segment correlation: c[m, s] = Σ_i A[m, i] * S[m, i+s],  s = 0..R
    s_win = windows_from(0, d + r)
    fft_len = _next_pow2(d + r + 1)
    if use_mxu() and fft_len <= 4096:
        # forward transforms read only their d+r / d nonzero inputs and the
        # inverse keeps only r+1 of fft_len outputs — sliced DFT matmuls do
        # that fraction of the work on the MXU instead of full VPU FFTs.
        # A dense DFT matmul needs no power-of-two length, only ≥ d+r+1 for
        # alias-free circular correlation: the 128-lane grid round-up is
        # ~25% fewer MACs than the pow2 length at the FM geometry (768 vs
        # 1024 for d+r+1 = 688).
        mm_len = min(fft_len, -(-(d + r + 1) // 128) * 128)
        fs_ = dft_matmul(s_win, axis=1, n=mm_len)
        fa_ = dft_matmul(jnp.conj(a_rows[:nf]), axis=1, n=mm_len)
        c = dft_matmul(fs_ * jnp.conj(fa_), axis=1, inverse=True,
                       out_len=r + 1)
    else:
        fs_ = fft_auto(s_win, fft_len, axis=1)
        fa_ = fft_auto(jnp.conj(a_rows[:nf]), fft_len, axis=1)
        c = ifft_auto(fs_ * jnp.conj(fa_), axis=1)[:, :r + 1]

    # boundary sample of each centred window: a[(m+1)d - half] * sext[(m+1)d + s]
    term = a_rows[1:nf + 1, 0:1] * windows_from(1, r + 1)

    pre = c + term                      # [m, shift] with shift = R - k
    return pre[:, ::-1]                 # → [m, k], k = 0..R (lag -R..0)


@functools.lru_cache(maxsize=16)
def _doppler_dft_shifted(nf: int):
    """(nf, nf) DFT matrix with fftshifted OUTPUT rows: one MXU matmul
    evaluates fftshift(fft(pre, axis=0), 0) — the shift permutation rides
    the matrix for free (float64 reduced-argument twiddles)."""
    k = np.arange(nf, dtype=np.float64)[None, :]
    u = ((np.arange(nf) + nf // 2) % nf).astype(np.float64)[:, None]
    w = np.exp(-2j * np.pi * ((u * k % nf) / nf))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _doppler_transform(pre: jnp.ndarray) -> jnp.ndarray:
    """fftshift(fft(pre, axis=0), axes=0) for the (nf, R+1) pre-FFT matrix.

    On TPU the Doppler axis (≤2048) is far below mxufft's AUTO_MIN, so the
    VPU FFT plus two relayouts used to run here; a single fused 3-mult
    matmul against the shift-permuted DFT matrix keeps it on the MXU
    (HIGH precision — f32-faithful for DFT sums, see ops/mxufft.py).
    """
    nf = pre.shape[0]
    if not (use_mxu() and nf <= 2048):
        return jnp.fft.fftshift(fft_auto(pre, axis=0), axes=0)
    from passiveradar_tpu.ops import mxufft
    dr, di = _doppler_dft_shifted(nf)
    dr = jnp.asarray(dr)
    di = jnp.asarray(di)
    ein = functools.partial(jnp.einsum, precision=mxufft.PRECISION,
                            preferred_element_type=jnp.float32)
    xr = jnp.real(pre).astype(jnp.float32)
    xi = jnp.imag(pre).astype(jnp.float32)
    m1 = ein("um,mk->uk", dr, xr)
    m2 = ein("um,mk->uk", di, xi)
    m3 = ein("um,mk->uk", dr + di, xr + xi)
    return jax.lax.complex(m1 - m2, m3 - m1 - m2).astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("range_bins", "freq_bins"))
def _fast_xambg_seg(ref, srv, window, range_bins: int, freq_bins: int):
    """Segment-FFT CAF core. ref/srv: (N,) complex64; window: (N,) or None."""
    aa, pp, d, n_extra = _caf_segment_tables(ref, srv, window, range_bins,
                                             freq_bins)
    pre = _caf_pre_rows(aa, pp, d, n_extra, range_bins, freq_bins)
    return _doppler_transform(pre).astype(jnp.complex64)


def fast_xambg_tp(ref: jnp.ndarray, srv: jnp.ndarray, range_bins: int,
                  freq_bins: int, mesh, window=None,
                  axis_name: str = "tp") -> jnp.ndarray:
    """Tensor-parallel CAF: one frame spread across the ``axis_name`` mesh
    axis (SURVEY §2.3 — for frames too large or too latency-critical for a
    single chip).

    Decomposition: the segment-correlation stage is row-independent, so each
    device computes freq_bins/ntp segment rows; one all_to_all then
    transposes the sharding from row-blocks to lag-blocks (moving 1/ntp of
    the pre-FFT matrix per device — an all-gather would move the whole
    matrix to every device and discard (ntp-1)/ntp of it), and each device
    runs the Doppler FFT over its slice of range lags. Output matches
    fast_xambg exactly.
    """
    from jax.sharding import PartitionSpec as P

    ntp = mesh.shape[axis_name]
    if freq_bins % ntp or (range_bins + 1) % ntp:
        raise ValueError("freq_bins and range_bins+1 must divide the mesh axis")
    rows_per = freq_bins // ntp
    win = resolve_window(window, ref.shape[0])
    win_j = None if win is None else jnp.asarray(win)

    def local(ref_l, srv_l):
        aa, pp, d, n_extra = _caf_segment_tables(ref_l, srv_l, win_j,
                                                 range_bins, freq_bins)
        me = jax.lax.axis_index(axis_name)
        pre_local = _caf_pre_rows(aa, pp, d, n_extra, range_bins, rows_per,
                                  me * rows_per)               # (nf/ntp, R+1)
        # shard transpose: split the lag axis, concatenate the row axis —
        # device j ends with all nf rows of its (R+1)/ntp lag block
        my_lags = jax.lax.all_to_all(pre_local, axis_name, split_axis=1,
                                     concat_axis=0, tiled=True)  # (nf, lags/ntp)
        return _doppler_transform(my_lags).astype(jnp.complex64)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(None, axis_name))(jnp.asarray(ref), jnp.asarray(srv))


def _fast_xambg_general(ref, srv, window, dtaps: np.ndarray, range_bins: int,
                        freq_bins: int):
    """General-taps CAF path (reference shortFilt=False / flattop mode).

    Lags are processed sequentially (lax.map) so memory stays O(N); each lag
    reuses the zero-phase decimation primitive, which matches
    scipy.signal.decimate(..., ftype=dlti(dtaps, 1)).
    """
    n = ref.shape[0]
    d = n // freq_bins
    srv_conj = jnp.conj(srv)
    a = ref if window is None else ref * window.astype(ref.dtype)

    def one_lag(k):
        lag = k - range_bins  # lag ∈ [-R .. 0]
        prod = jnp.roll(srv_conj, lag) * a
        return decimate_taps(prod, dtaps, d)[:freq_bins]

    rows = jax.lax.map(one_lag, jnp.arange(range_bins + 1))  # (R+1, nf)
    out = jnp.fft.fftshift(jnp.fft.fft(rows.T, axis=0), axes=0)
    return out.astype(jnp.complex64)


def fast_xambg(ref: jnp.ndarray, srv: jnp.ndarray, range_bins: int,
               freq_bins: int, input_len: int | None = None, window=None,
               short_filt: bool = True) -> jnp.ndarray:
    """Fast cross-ambiguity surface.

    Matches the reference ``fast_xambg`` (range_doppler_processing.py:12-90)
    output to float32 round-off, returning (freq_bins, range_bins+1) — the
    caller stacks frames (the reference's trailing singleton axis is a dask
    artefact).

    short_filt=True uses the all-ones (d+1)-tap Doppler decimator via the
    segment-FFT fast path; short_filt=False uses the 10·d+1-tap flattop
    design through the general decimation path.
    """
    ref = jnp.asarray(ref)
    srv = jnp.asarray(srv)
    if input_len is not None and ref.shape[0] != input_len:
        pad = input_len - ref.shape[0]
        ref = jnp.pad(ref, (0, pad))
        srv = jnp.pad(srv, (0, pad))
    n = ref.shape[0]
    if n % freq_bins:
        raise ValueError(f"input length {n} not divisible by freq_bins {freq_bins}")
    d = n // freq_bins
    win = resolve_window(window, n)
    win_j = None if win is None else jnp.asarray(win)

    if short_filt:
        if d % 2:
            raise ValueError("segment CAF path requires an even decimation factor")
        return _fast_xambg_seg(ref, srv, win_j, int(range_bins), int(freq_bins))
    dtaps = design_lowpass(10 * d + 1, 1.0 / d, "flattop")
    return _fast_xambg_general(ref, srv, win_j, dtaps,
                               int(range_bins), int(freq_bins))


def direct_xambg(ref: jnp.ndarray, srv: jnp.ndarray, range_bins: int,
                 freq_bins: int, sample_rate: float) -> jnp.ndarray:
    """Direct (time-domain) CAF — the validation oracle for fast_xambg.

    Reference semantics (range_doppler_processing.py:93-124): row i is the
    ±range_bins-lag cross-correlation of the reference channel frequency-
    shifted by (i - nf/2)/CPI against the surveillance channel.
    """
    ref = jnp.asarray(ref)
    srv = jnp.asarray(srv)
    n = ref.shape[0]
    cpi = n / float(sample_rate)
    t = jnp.arange(n, dtype=jnp.float32) / np.float32(sample_rate)

    def one_bin(i):
        df = (i - 0.5 * freq_bins) / cpi
        shifted = ref * jnp.exp(1j * 2 * np.pi * df.astype(jnp.float32) * t)
        return xcorr(shifted, srv, range_bins, 0)

    rows = jax.lax.map(one_bin, jnp.arange(freq_bins, dtype=jnp.float32))
    return rows.astype(jnp.complex64)
