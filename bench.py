"""Headline benchmark: end-to-end CAF pipeline throughput (frames/s).

Runs the full device pipeline (deinterleave → mix → polyphase resample →
5-bin LS clutter cancellation → CPI-overlap halo → windowed CAF) at the
reference's FM-capture geometry: 524288-sample CPIs, 1024×176 range-Doppler
frames, 2 frames of airtime per second of capture.

Baseline: the reference processes the same geometry at ≈1 frame/s on a
desktop CPU (reference README.md:24: "about 20 minutes" for 1200 frames —
see BASELINE.md). vs_baseline is therefore frames_per_second / 1.0.

Prints exactly one JSON line:
  {"metric": "caf_frames_per_s", "value": N, "unit": "frames/s", "vs_baseline": N}

The measurement runs in a supervised child process (bench_util.py): the
tunnelled TPU relay can transiently abort a program (this killed the round-1
artifact), and an aborted JAX backend is unrecoverable in-process — so the
parent retries the whole child up to 3x and relays its JSON line.
"""

import json
import sys
import time

import numpy as np

from bench_util import child_or_retry


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the pipeline program takes minutes to build
    # the first time; later runs (and driver re-runs) start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.pipeline import (frame_phases, process_frames,
                                           process_frames_groups)

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
    # a tiny on-device reduction chains executions and forces completion —
    # block_until_ready alone is unreliable through remote-relay backends
    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    # the production host loop dispatches GROUPS batches per device program
    # (pipeline.process_frames_groups — a lax.scan amortising fixed launch
    # overhead; run_capture(dispatch_groups=...) is the same path), so the
    # headline measures that granularity: reps/GROUPS dispatches. The
    # progress accumulator rides the same program (maps still fully
    # materialise in HBM) — a separate reduction dispatch would bill the
    # relay's per-launch overhead twice per group.
    import functools

    from passiveradar_tpu.pipeline import (_process_frames_groups_jit,
                                           _routing_key)

    # dispatch-group sweep (same-session pairs, 2026-08-21): G=12 beats
    # G=8 consistently (583.7/582.2 vs 575.5/569) — the bigger program
    # amortises the relay tax faster than the tax+input-stack grow; G=16
    # loses (477, HBM pressure). docs/PERFORMANCE.md.
    groups = 12
    refs = jnp.stack([ref, ref2] * (groups // 2))
    srvs = jnp.stack([srv, srv2] * (groups // 2))
    phg = jnp.broadcast_to(phases, (groups,) + phases.shape)

    @functools.partial(jax.jit, static_argnames=("cfg", "routing"))
    def group_step(refs, srvs, phg, acc, cfg, routing):
        out = _process_frames_groups_jit(refs, srvs, phg, cfg, routing)
        return acc + jnp.sum(jnp.abs(out))

    routing = _routing_key()

    # warm-up / compile
    t0 = time.time()
    float(group_step(refs, srvs, phg, jnp.float32(0.0), cfg, routing))
    compile_s = time.time() - t0

    # steady state: alternate two input sets inside each group's stack,
    # chain through an on-device accumulator, fetch once at the end
    dispatches = 3
    reps = dispatches * groups
    t0 = time.time()
    acc = jnp.float32(0.0)
    for i in range(dispatches):
        acc = group_step(refs, srvs, phg, acc, cfg, routing)
    float(acc)
    elapsed = time.time() - t0

    frames_per_s = reps * batch / elapsed
    print(json.dumps({
        "metric": "caf_frames_per_s",
        "value": round(frames_per_s, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / 1.0, 2),
    }))
    print(f"# geometry: {cfg.num_doppler_cells}x{cfg.num_range_cells + 1} "
          f"maps from {cfg.cpi_samples}-sample CPIs; batch={batch}; "
          f"dispatch_groups={groups}; "
          f"gen={gen_s:.1f}s compile={compile_s:.1f}s run={elapsed:.2f}s "
          f"devices={jax.devices()}", file=sys.stderr)

    # secondary: steady-state DEVICE throughput — the same reps inside one
    # program (lax.scan), which excludes this container's ~2.5 ms relay
    # per-dispatch overhead (measured: a bare x+1 dispatch costs 2.5 ms
    # here; see docs/PERFORMANCE.md "Measurement method note"). The
    # headline above stays the host-loop number for cross-round
    # comparability; this line records what the chip itself sustains.
    from passiveradar_tpu.pipeline import _process_frames_jit

    refs = jnp.stack([ref, ref2])
    srvs = jnp.stack([srv, srv2])

    @jax.jit
    def steady(refs, srvs, phases):
        def step(acc, i):
            out = _process_frames_jit(refs[i], srvs[i], phases, cfg, routing)
            return acc + jnp.sum(jnp.abs(out)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.int32) % 2)
        return acc

    float(steady(refs, srvs, phases))          # compile + warm
    t0 = time.time()
    float(steady(refs, srvs, phases))
    steady_s = time.time() - t0
    print(f"# steady-state (single-dispatch scan of {reps} reps): "
          f"{reps * batch / steady_s:.1f} frames/s "
          f"({steady_s / reps * 1000:.2f} ms/batch)", file=sys.stderr)


if __name__ == "__main__":
    child_or_retry(main)
