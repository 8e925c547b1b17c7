"""Per-stage timing of the headline pipeline (dev diagnostic).

Times each pipeline stage separately at the reference FM geometry
(bench.py's configuration, batch of 8 frames) plus a few clutter-stage
sub-benchmarks, so optimization work targets the real hot spot. Prints one
JSON metric line (the fused pipeline time) so the bench_util retry harness
can supervise it; per-stage numbers go to stderr.
"""

import dataclasses
import json
import sys
import time

import numpy as np

from bench_util import child_or_retry


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.pipeline import (caf_batch, clutter_batch,
                                           frame_phases, preprocess_batch,
                                           process_frames)

    params = dict(
        input_sample_rate=2_400_000,
        input_center_freq=102_000_000,
        channel_freq=101_900_000,
        channel_bandwidth=200_000,
        cpi_seconds_nominal=2.0,
        max_doppler_nominal=256.0,
        max_range_nominal=200.0,
        overlap_cpi=True,
        num_frames=10_000,
    )
    cfg = derive_config(params)
    batch = 8

    ref, srv = synth_capture_device(
        cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=1,
        complex_output=True)
    jax.block_until_ready((ref, srv))
    phases = jnp.asarray(frame_phases(cfg, list(range(batch))))

    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    def timeit(name, fn, *args, reps=16):
        t0 = time.time()
        out = fn(*args)
        float(summ(out, jnp.float32(0.0)))
        compile_s = time.time() - t0
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(reps):
            acc = summ(fn(*args), acc)
        float(acc)
        dt = (time.time() - t0) / reps * 1000.0
        print(f"# {name:34s} {dt:8.2f} ms/batch   (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return dt, out

    _, ref_if = timeit("preprocess (1 ch)", preprocess_batch, ref, phases, cfg)
    srv_if = preprocess_batch(srv, phases, cfg)
    t_clut, srv_clean = timeit("clutter (5 bins)", clutter_batch,
                               ref_if, srv_if, cfg)
    timeit("caf (halo+window+xambg)", caf_batch, ref_if, srv_clean, cfg)
    t_full, _ = timeit("FUSED process_frames", process_frames,
                       ref, srv, phases, cfg)

    # ---- clutter sub-benchmarks ------------------------------------------
    from passiveradar_tpu.ops.clutter import (levinson_first_col,
                                              ls_filter_multiple)

    cfg1 = dataclasses.replace(cfg, clutter_doppler_bins=(0.0,))
    t1, _ = timeit("clutter (1 bin)", clutter_batch, ref_if, srv_if, cfg1)
    nbins = len(cfg.clutter_doppler_bins)
    print(f"# clutter marginal per bin: {(t_clut - t1) / (nbins - 1):.2f} ms; "
          f"1-bin fixed cost {t1:.2f} ms", file=sys.stderr)

    chol = jax.jit(lambda r, s: jax.vmap(
        lambda rr, ss: ls_filter_multiple(
            rr, ss, cfg.num_range_cells, cfg.IF_sample_rate,
            cfg.clutter_doppler_bins, solver="cholesky"))(r, s))
    timeit("clutter (5 bins, cholesky)", chol, ref_if, srv_if)

    # segment-Gram vs frequency-domain-carry A/B, and the segment FFT-length
    # sweep (SEGMENT_FFT_LEN is trace-time: fresh jit closure per value)
    from passiveradar_tpu.ops import clutter as _cl

    def _impl_fn(impl, solver="levinson"):
        return jax.jit(lambda r, s: jax.vmap(
            lambda rr, ss: ls_filter_multiple(
                rr, ss, cfg.num_range_cells, cfg.IF_sample_rate,
                cfg.clutter_doppler_bins, impl=impl, solver=solver))(r, s))

    for impl in ("carry", "coupled"):
        for solver in ("levinson", "gs_matrix", "gs_dense"):
            timeit(f"clutter impl={impl} solver={solver}",
                   _impl_fn(impl, solver), ref_if, srv_if)
    for flen in (2048, 4096):
        _cl.SEGMENT_FFT_LEN = flen
        try:
            timeit(f"clutter impl=segment f={flen}", _impl_fn("segment"),
                   ref_if, srv_if)
        finally:
            _cl.SEGMENT_FFT_LEN = None

    m = cfg.num_range_cells + 10

    @jax.jit
    def _make_acs():
        # complex only inside compiled programs (relay restriction)
        a = (jax.random.normal(jax.random.PRNGKey(0), (batch * nbins, m))
             + 1j * jax.random.normal(jax.random.PRNGKey(1),
                                      (batch * nbins, m))).astype(jnp.complex64)
        return a.at[:, 0].set(jnp.float32(m) * 10.0)

    acs = _make_acs()
    lev = jax.jit(levinson_first_col)
    timeit(f"levinson_first_col ({batch * nbins}x{m})", lev, acs)

    # round-1 formulation (flip+concat rebuilt every step) for within-run A/B
    def levinson_old(c):
        c = jnp.asarray(c)
        mm = c.shape[-1]
        cb = c.reshape((-1, mm))
        nb = cb.shape[0]
        cf_pad = jnp.concatenate(
            [jnp.zeros((nb, mm), cb.dtype), jnp.flip(cb, -1),
             jnp.zeros((nb, mm), cb.dtype)], axis=-1)
        a0 = (cb * 0).at[:, 0].set(1.0)
        e0 = jnp.real(cb[:, 0])

        def step(carry, k):
            a, e = carry
            crev = jax.lax.dynamic_slice_in_dim(cf_pad, 2 * mm - 1 - k, mm,
                                                axis=1)
            acc = jnp.sum(a * crev, axis=-1)
            kap = -acc / e.astype(acc.dtype)
            af_pad = jnp.concatenate(
                [jnp.zeros((nb, mm), a.dtype), jnp.flip(jnp.conj(a), -1),
                 jnp.zeros((nb, mm), a.dtype)], axis=-1)
            arev = jax.lax.dynamic_slice_in_dim(af_pad, 2 * mm - 1 - k, mm,
                                                axis=1)
            a = a + kap[:, None] * arev
            e = e * (1.0 - jnp.abs(kap) ** 2)
            return (a, e), None

        (a, e), _ = jax.lax.scan(step, (a0, e0), jnp.arange(1, mm))
        return a / e[:, None].astype(a.dtype)

    timeit(f"levinson r1-style ({batch * nbins}x{m})",
           jax.jit(levinson_old), acs)

    # full-length FFT microbench: one N-point c64 batch FFT (the clutter
    # stage runs ~4 of these per frame: f0/f1 spectra, fft(srv), ifft)
    fftb = jax.jit(lambda x: jnp.fft.fft(x, axis=-1))
    timeit(f"VPU FFT ({batch}x{cfg.output_chunk_length})", fftb, ref_if)
    from passiveradar_tpu.ops import mxufft
    mxub = jax.jit(lambda x: mxufft.fft(x, axis=-1))
    timeit(f"MXU FFT ({batch}x{cfg.output_chunk_length})", mxub, ref_if)

    from passiveradar_tpu.ops.clutter import _modulated_ref_spectra
    spect = jax.jit(lambda r: jax.vmap(
        lambda rr: _modulated_ref_spectra(
            rr, cfg.output_chunk_length, m, 10, cfg.IF_sample_rate,
            cfg.clutter_doppler_bins)[0])(r))
    timeit("clutter modulated-spectra pre", spect, ref_if)

    print(json.dumps({
        "metric": "pipeline_ms_per_batch",
        "value": round(t_full, 3),
        "unit": "ms/batch8",
        "vs_baseline": round(batch / (t_full / 1000.0), 2),
    }))


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=2400.0)
