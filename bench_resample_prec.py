"""Pallas resampler matmul-precision A/B (dev diagnostic).

Times the fused mix+resample preprocess stage with the kernel contraction
at HIGHEST (bf16x6) vs HIGH (bf16x3) and measures the accuracy cost of the
faster passes against the HIGHEST output (the documented 1.8e-7-vs-float64
configuration). Prints the HIGH-precision stage time as the JSON metric.
"""

import json
import sys
import time

from bench_util import child_or_retry


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.ops import resample_pallas
    from passiveradar_tpu.ops.util import to_host_complex
    from passiveradar_tpu.pipeline import frame_phases, preprocess_batch

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
    ref, _ = synth_capture_device(
        cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=1,
        complex_output=True)
    jax.block_until_ready(ref)
    phases = jnp.asarray(frame_phases(cfg, list(range(batch))))
    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    results = {}
    outs = {}
    for prec in ("HIGHEST", "HIGH"):
        resample_pallas.PRECISION = getattr(jax.lax.Precision, prec)
        jax.clear_caches()
        t0 = time.time()
        out = preprocess_batch(ref, phases, cfg)
        float(summ(out, jnp.float32(0.0)))
        compile_s = time.time() - t0
        outs[prec] = to_host_complex(out)
        reps = 16
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(reps):
            acc = summ(preprocess_batch(ref, phases, cfg), acc)
        float(acc)
        dt = (time.time() - t0) / reps * 1000.0
        results[prec] = dt
        print(f"# {prec:8s}: {dt:7.3f} ms/batch (compile {compile_s:.1f}s)",
              file=sys.stderr)

    scale = np.max(np.abs(outs["HIGHEST"]))
    err = np.max(np.abs(outs["HIGH"] - outs["HIGHEST"])) / scale
    print(f"# HIGH vs HIGHEST max rel error: {err:.3e}", file=sys.stderr)
    print(json.dumps({
        "metric": "preprocess_ms_high_prec",
        "value": round(results["HIGH"], 3),
        "unit": f"ms/batch8 (err {err:.1e}; HIGHEST {results['HIGHEST']:.2f})",
        "vs_baseline": 0,
    }))


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=1200.0)
