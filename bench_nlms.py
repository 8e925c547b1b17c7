"""Secondary benchmark: Pallas NLMS clutter-filter throughput (GFLOP/s).

One of BASELINE.json's named metrics. Runs the reference FM geometry's NLMS
(185+10 taps over 262144-sample CPIs, as NLMS_filter would be configured for
the main pipeline) batched over 128 frames at block=1024 (the block size
that fits 128 rows in VMEM) — the kernel is per-sample
dependency-latency-bound, so sublane batch rows are nearly free until the
VPU issue rate saturates (measured 206/437/632/784/907 GFLOP/s at batch
8/16/32/64/128; see docs/PERFORMANCE.md's roofline). FLOP count: each sample
performs the wᴴu dot, the uᴴu energy, the error and the tap update — 16·M
real multiply-adds ≈ 32·M FLOP per sample per frame.

Prints one JSON line: {"metric": "nlms_gflops", ...}.
"""

import json
import sys
import time

from bench_util import child_or_retry


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.ops.nlms_pallas import nlms_filter_pallas

    b, n = 128, 262144
    filter_len, peek, mu = 175, 10, 0.05
    m = filter_len + peek

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    ref = jax.lax.complex(jax.random.normal(k1, (b, n)),
                          jax.random.normal(k2, (b, n))).astype(jnp.complex64)
    srv = 0.5 * jnp.roll(ref, 3, axis=1) + 0.01 * ref[:, ::-1]

    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))
    t0 = time.time()
    out = nlms_filter_pallas(ref, srv, filter_len, mu, peek=peek,
                             block=1024)
    float(summ(out, jnp.float32(0.0)))
    compile_s = time.time() - t0

    reps = 4
    t0 = time.time()
    acc = jnp.float32(0.0)
    for i in range(reps):
        out = nlms_filter_pallas(ref if i % 2 else srv,
                                 srv if i % 2 else ref, filter_len, mu,
                                 peek=peek, block=1024)
        acc = summ(out, acc)
    float(acc)
    dt = (time.time() - t0) / reps

    flops = 32.0 * m * (n - m) * b
    gflops = flops / dt / 1e9
    print(json.dumps({
        "metric": "nlms_gflops",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops, 1),  # reference: Python loop, ~1e-3 GFLOP/s
    }))
    print(f"# b={b} n={n} taps={m}: {dt * 1e3:.1f} ms/batch, "
          f"compile={compile_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    child_or_retry(main)
