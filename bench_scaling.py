"""Scaling-efficiency harness: frames/s at 1, 2, ..., N devices.

BASELINE.json's scaling-efficiency metric needs samples/s measured at
1 chip → 1 host → N hosts. This harness runs the frame-sharded pipeline on
every power-of-two device count available to the current runtime and reports
per-count throughput plus efficiency vs linear scaling from one device.

On the single tunnelled v5e chip of the dev container it degenerates to the
1-device row (the multi-device code path itself is validated on virtual CPU
devices by the test suite and the driver's dryrun). On a pod slice, run one
process per host; devices() spans the full slice.

Multi-device counts run the PRODUCTION shard_map program
(pipeline.process_frames_shmap — the path run_capture dispatches on a
mesh), so the measured collectives are the real ones (4 ppermutes/step).

``--validate-collectives``: reduced geometry for the 8-virtual-CPU-device
mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).
This is COLLECTIVE VALIDATION, not a performance measurement — virtual CPU
"devices" share one slow host CPU, so efficiency numbers only prove the
sharded program runs and stays correct per device count (the committed
MULTIDEV_CPU.json artifact). Real scaling efficiency needs a pod slice.

Prints one JSON line per device count:
  {"metric": "scaling_frames_per_s", "devices": D, "value": N,
   "unit": "frames/s", "efficiency": E}
"""

import json
import sys
import time

from bench_util import child_or_retry

FM_GEOMETRY = dict(
    input_sample_rate=2_400_000, input_center_freq=102_000_000,
    channel_freq=101_900_000, channel_bandwidth=200_000,
    cpi_seconds_nominal=2.0, max_doppler_nominal=256.0,
    max_range_nominal=200.0, overlap_cpi=True, num_frames=10_000,
)

# tiny geometry for --validate-collectives on virtual CPU devices (the
# test suite's 16384-sample-CPI configuration)
TINY_GEOMETRY = dict(
    input_sample_rate=49152, input_center_freq=1_000_000,
    channel_freq=990_170, channel_bandwidth=12800,
    cpi_seconds_nominal=1.0, max_doppler_nominal=128.0,
    max_range_nominal=400.0, overlap_cpi=True, num_frames=10_000,
)


def main():
    validate = "--validate-collectives" in sys.argv
    if validate:
        # force the 8-virtual-CPU-device backend BEFORE jax initialises; the
        # env vars alone are not reliable (a device plugin's sitecustomize
        # can import jax at interpreter boot and pre-empt JAX_PLATFORMS)
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    if validate:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.synthetic import Target, synth_capture_device
    from passiveradar_tpu.parallel.mesh import frame_sharding, make_mesh
    from passiveradar_tpu.pipeline import (frame_phases, process_frames,
                                           process_frames_shmap)

    cfg = derive_config(TINY_GEOMETRY if validate else FM_GEOMETRY)
    metric = ("scaling_collective_validation_frames_per_s" if validate
              else "scaling_frames_per_s")
    frames_per_device = 8
    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    n_dev = len(jax.devices())
    counts = []
    d = 1
    while d <= n_dev:
        counts.append(d)
        d *= 2

    base = None
    for nd in counts:
        batch = frames_per_device * nd
        mesh = make_mesh(nd)
        sh = frame_sharding(mesh)
        r1, v1 = synth_capture_device(cfg, batch, seed=1, complex_output=True)
        r2, v2 = synth_capture_device(cfg, batch, seed=2, complex_output=True)
        ph = jnp.asarray(frame_phases(cfg, list(range(batch))))
        if nd > 1:
            r1, v1 = jax.device_put(r1, sh), jax.device_put(v1, sh)
            r2, v2 = jax.device_put(r2, sh), jax.device_put(v2, sh)
            ph = jax.device_put(ph, sh)
            # the production multi-chip program (what run_capture dispatches)
            step = lambda a, b, p: process_frames_shmap(a, b, p, cfg, mesh)
        else:
            step = lambda a, b, p: process_frames(a, b, p, cfg)

        out = step(r1, v1, ph)
        float(summ(out, jnp.float32(0.0)))          # compile + sync
        reps = 8
        t0 = time.time()
        acc = jnp.float32(0.0)
        for i in range(reps):
            out = step(r1 if i % 2 else r2, v1 if i % 2 else v2, ph)
            acc = summ(out, acc)
        float(acc)
        fps = reps * batch / (time.time() - t0)
        if base is None:
            base = fps
        eff = fps / (base * nd)
        print(json.dumps({
            "metric": metric, "devices": nd,
            "value": round(fps, 2), "unit": "frames/s",
            "efficiency": round(eff, 3),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    child_or_retry(main, probe="--validate-collectives" not in sys.argv)
