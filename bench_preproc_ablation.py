"""Preprocess-stage ablation: kernel vs surrounding data motion (dev diag).

The fused mix+resample batch stage (ops/fir.py:_mix_resample_batch_jit) is
~49% of pipeline in-program time. This measures, in ONE process, in-scan
(reps inside one lax.scan so the relay dispatch tax amortises):

  a) the full preprocess stage (deinterleave + mix + resample), per channel
  b) the Pallas regroup+matmul alone on a PRE-BUILT padded plane array
     (input prep — transpose/pad/zeros-set — and output slice/phase/edge
     corrections stubbed away)
  c) b) plus the output-side work (slice + per-frame phase + edge
     corrections) on the kernel result — i.e. only input prep stubbed

Deltas attribute the stage's non-kernel cost to its input and output
sides, deciding whether fusing the data motion into the kernel is worth
a redesign. Prints one JSON line (the full stage time).
"""

import json
import os
import sys
import time

from bench_util import child_or_retry


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.ops import fir
    from passiveradar_tpu.pipeline import _preprocess_impl, frame_phases

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
    batch, reps = 8, 32

    ref, _ = synth_capture_device(
        cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=1,
        complex_output=True)
    ref2, _ = synth_capture_device(
        cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=2,
        complex_output=True)
    refs = jnp.stack([ref, ref2])
    jax.block_until_ready(refs)
    phases = jnp.asarray(frame_phases(cfg, list(range(batch))))

    # static resample state at the production fold
    import math

    n_in = ref.shape[1]
    g = math.gcd(cfg.resamp_up, cfg.resamp_dn)
    upr, downr = cfg.resamp_up // g, cfg.resamp_dn // g
    h_pad, n_pre_remove, n_out = fir._resample_design(n_in, upr, downr,
                                                      ("kaiser", 5.0))
    h_key = fir._tap_key(h_pad)
    c = -cfg.offset_freq / cfg.input_sample_rate
    fold = 4
    st = fir._mix_resample_fold(h_key, upr, downr, c, n_in, "line", fold)
    groups, up_f, down_f = st["groups_f"], st["up_f"], st["down_f"]
    pad_lraw = st["pad_l"] + st["ext"]
    bank = jnp.asarray(st["bank_f_ri"])
    fg_np = st["fg_f"]      # host numpy: complex constants must only enter
    #                         device land inside jit (relay restriction)

    # pre-built padded planes for variant (b)/(c): (2, F, n_pad) per part
    @jax.jit
    def make_planes(refs):
        planes = jnp.stack([jnp.real(refs), jnp.imag(refs)], axis=2)
        return jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (pad_lraw, 0)))

    xps = make_planes(refs)              # (2, F, 2, n_pad)
    jax.block_until_ready(xps)

    from passiveradar_tpu.ops.resample_pallas import mix_regroup_matmul

    def scan_of(inner):
        @functools.partial(jax.jit)
        def run(data):
            def step(acc, i):
                return acc + inner(i, data), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(reps, dtype=jnp.int32) % 2)
            return acc
        return run

    def timeit(name, run, data):
        t0 = time.time()
        float(run(data))
        comp = time.time() - t0
        t0 = time.time()
        float(run(data))
        dt = (time.time() - t0) / reps * 1000
        print(f"# {name:46s} {dt:8.2f} ms/batch8 (compile {comp:.0f}s)",
              file=sys.stderr, flush=True)
        return dt

    full = scan_of(lambda i, d: jnp.sum(jnp.abs(
        _preprocess_impl(d[i], phases, cfg))))
    t_full = timeit("a) full preprocess stage", full, refs)

    kern = scan_of(lambda i, d: sum(
        jnp.sum(jnp.abs(o)) for o in mix_regroup_matmul(
            d[i, :, 0], d[i, :, 1], bank, down_f, groups, up_f)))
    t_kern = timeit("b) kernel only (pre-built planes)", kern, xps)

    def with_out(i, d):
        o_re, o_im = mix_regroup_matmul(d[i, :, 0], d[i, :, 1], bank,
                                        down_f, groups, up_f)
        bulk = jax.lax.complex(o_re, o_im) * jnp.asarray(fg_np)[None, :, None]
        flat = bulk.reshape(batch, groups * up_f)
        lo = st["shift"] + n_pre_remove
        y = flat[:, lo:lo + n_out]
        ph = phases[:, None]
        y = (y * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
             ).astype(jnp.complex64)
        return jnp.sum(jnp.abs(y))

    t_out = timeit("c) kernel + output side", scan_of(with_out), xps)

    print(f"# deltas: output-side {t_out - t_kern:.2f} ms; "
          f"input-side+deinterleave+corrections {t_full - t_out:.2f} ms; "
          f"kernel {t_kern:.2f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": "preprocess_ms_per_batch8",
        "value": round(t_full, 3),
        "unit": "ms",
        "vs_baseline": round(t_kern, 3),
    }))


if __name__ == "__main__":
    child_or_retry(main)
