"""Streaming-mode latency benchmark (BASELINE config 3/5 capability).

Measures the real-time push-per-CPI path (`streaming.StreamingProcessor`):
per-push wall latency from handing one CPI of raw IQ to receiving the
previous frame's CAF + CFAR + tracker update (the processor carries a
one-frame CPI-overlap latency by construction, like the reference's
50%-overlap framing). The reference has no streaming mode at all — its
realtime budget is 1 CPI / cpi_actual seconds, so vs_baseline reports the
realtime headroom multiple: cpi_interval / median_latency.

Prints one JSON line:
  {"metric": "stream_latency_ms", "value": N, "unit": "ms/CPI",
   "vs_baseline": R}
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
    from passiveradar_tpu.streaming import StreamingProcessor

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

    n_push = 12
    t0 = time.time()
    ref, srv = synth_capture_device(
        cfg, n_push, targets=(Target(200, 40.0, 0.05),), seed=1,
        complex_output=False)        # (F, n, 2) float32 pairs — push format
    ref = np.asarray(ref)
    srv = np.asarray(srv)
    gen_s = time.time() - t0

    proc = StreamingProcessor(cfg)

    # first pushes compile the per-CPI programs (preprocess, clutter,
    # single-frame CAF+CFAR, tracker step) — excluded from the timing
    t0 = time.time()
    proc.push(ref[0], srv[0])
    proc.push(ref[1], srv[1])
    compile_s = time.time() - t0

    lats, lats_light, dev_light = [], [], []
    for i in range(2, n_push):
        detail = "summary" if i % 2 else "full"
        if detail == "summary":
            # device-resident input: isolates the framework's device+summary
            # leg (compute + ~240 B fetch) from the raw host→device transfer
            rd, sd = jnp.asarray(ref[i]), jnp.asarray(srv[i])
            jax.block_until_ready((rd, sd))
            t0 = time.time()
            proc.push(rd, sd, detail="summary")
            dev_light.append(time.time() - t0)
        t0 = time.time()
        res = proc.push(ref[i], srv[i], detail=detail)
        # a StreamResult's arrays are host-materialised by push itself
        (lats if detail == "full" else lats_light).append(time.time() - t0)
    lat_ms = float(np.median(lats)) * 1000.0
    light_ms = float(np.median(lats_light)) * 1000.0
    dev_ms = float(np.median(dev_light)) * 1000.0
    interval = cfg.frame_interval

    print(json.dumps({
        "metric": "stream_latency_ms",
        "value": round(light_ms, 2),
        "unit": "ms/CPI",
        "vs_baseline": round(interval * 1000.0 / light_ms, 1),
    }))
    print(f"# full-detail per-push median {lat_ms:.0f} ms; "
          f"summary-detail {light_ms:.0f} ms; device+summary leg "
          f"(device-resident input) {dev_ms:.0f} ms; "
          f"full lats (ms): {[round(v * 1e3, 1) for v in lats]}; "
          f"summary lats: {[round(v * 1e3, 1) for v in lats_light]}; "
          f"dev lats: {[round(v * 1e3, 1) for v in dev_light]}; "
          f"CPI interval {interval * 1e3:.0f} ms; gen={gen_s:.1f}s "
          f"compile/warm={compile_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    child_or_retry(main)
