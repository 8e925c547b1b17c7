"""Frame-batch sweep of the headline pipeline (dev diagnostic).

Times process_frames at several frame-batch sizes to locate the knee.
Measured result (docs/PERFORMANCE.md dead-ends): batch 8 WINS — 8 → 410
frames/s, 16 → 375, 32 → 338. The pipeline is HBM/arithmetic-bound, not
latency-bound, so bigger live sets hurt rather than help. Prints the best
batch's frames/s as the JSON metric; per-batch numbers go to stderr.
"""

import json
import sys
import time

from bench_util import child_or_retry

BATCHES = (8, 16, 32)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.pipeline import frame_phases, process_frames

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
    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    best = (0.0, 0)
    for batch in BATCHES:
        t0 = time.time()
        ref, srv = synth_capture_device(
            cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=1,
            complex_output=True)
        ref2, srv2 = synth_capture_device(
            cfg, batch, targets=(Target(200, 40.0, 0.05),), seed=2,
            complex_output=True)
        jax.block_until_ready((ref, srv, ref2, srv2))
        phases = jnp.asarray(frame_phases(cfg, list(range(batch))))
        gen_s = time.time() - t0

        t0 = time.time()
        out = process_frames(ref, srv, phases, cfg)
        float(summ(out, jnp.float32(0.0)))
        compile_s = time.time() - t0

        reps = max(4, 128 // batch)
        t0 = time.time()
        acc = jnp.float32(0.0)
        for i in range(reps):
            out = process_frames(ref if i % 2 else ref2,
                                 srv if i % 2 else srv2, phases, cfg)
            acc = summ(out, acc)
        float(acc)
        dt = time.time() - t0
        fps = reps * batch / dt
        print(f"# batch={batch:3d}: {fps:8.1f} frames/s "
              f"({dt / reps * 1000:.2f} ms/dispatch; gen={gen_s:.1f}s "
              f"compile={compile_s:.1f}s)", file=sys.stderr)
        if fps > best[0]:
            best = (fps, batch)

    print(json.dumps({
        "metric": "caf_frames_per_s_best_batch",
        "value": round(best[0], 2),
        "unit": f"frames/s (batch={best[1]})",
        "vs_baseline": round(best[0], 2),
    }))


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=2400.0)
