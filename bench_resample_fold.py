"""A/B the Pallas resampler's phase-fold factor (dev diagnostic).

The regroup kernel's measured cost floor is per polyphase group
(docs/PERFORMANCE.md dead-end ledger: ~110 ns/group, invariant to the
inner-op mix). ops/fir.py:_mix_resample_fold halves/quarters the group
count by running the same resample at (fold*up)/(fold*down) with a
phase-folded wider bank. This script measures the preprocess stage
(deinterleave+mix+resample, one channel, 8-frame batch at the FM geometry)
IN-PROGRAM — reps inside one lax.scan, so the relay's per-dispatch
overhead amortises away — for fold in {1, 2, 4}, in one process (the
pipeline jits key on the PASSIVERADAR_RESAMPLE_FOLD gate via
pipeline._routing_key, so flipping it retraces).

Prints one JSON line with the winning fold's ms/batch.
"""

import json
import os
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
    from passiveradar_tpu.pipeline import (_preprocess_impl, _routing_key,
                                           frame_phases)

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

    import functools

    # alternate two input sets per step — a loop-invariant body would be
    # hoisted out of the scan by XLA and measure one execution / reps
    @functools.partial(jax.jit, static_argnames=("cfg", "routing"))
    def scan_pre(refs, phases, cfg, routing):
        def step(acc, i):
            out = _preprocess_impl(refs[i], phases, cfg)
            return acc + jnp.sum(jnp.abs(out)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.int32) % 2)
        return acc

    folds = tuple(int(t) for t in os.environ.get(
        "PASSIVERADAR_FOLD_SWEEP", "4,8").split(","))
    results = {}
    for fold in folds:
        os.environ["PASSIVERADAR_RESAMPLE_FOLD"] = str(fold)
        routing = _routing_key()
        t0 = time.time()
        float(scan_pre(refs, phases, cfg, routing))
        compile_s = time.time() - t0
        t0 = time.time()
        float(scan_pre(refs, phases, cfg, routing))
        dt = time.time() - t0
        ms = dt / reps * 1000
        results[fold] = ms
        print(f"# fold={fold}: {ms:.2f} ms/batch in-program "
              f"(compile {compile_s:.1f}s)", file=sys.stderr)

    best = min(results, key=results.get)
    print(json.dumps({
        "metric": "preprocess_ms_per_batch8",
        "value": round(results[best], 3),
        "unit": "ms",
        "vs_baseline": best,   # the winning fold factor, for the record
    }))


if __name__ == "__main__":
    child_or_retry(main)
