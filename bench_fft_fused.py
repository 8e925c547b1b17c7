"""Microbench: fused Pallas four-step FFT vs XLA-staged MXU DFT vs VPU FFT.

8x262144 complex64 (the FM geometry's full-chunk transform, the unit the
clutter stage pays ~4x per batch). Prints one JSON line with the fused
kernel's effective throughput plus stderr rows for all three forms.
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

    from passiveradar_tpu.ops import fft_pallas, mxufft

    b, n = 8, 262144

    @jax.jit
    def make():
        k1, k2 = jax.random.split(jax.random.key(0))
        return jax.lax.complex(jax.random.normal(k1, (b, n)),
                               jax.random.normal(k2, (b, n))
                               ).astype(jnp.complex64)

    x = make()
    jax.block_until_ready(x)
    summ = jax.jit(lambda v, a: a + jnp.sum(jnp.abs(v)))

    def timeit(name, fn, reps=32):
        t0 = time.time()
        float(summ(fn(x), jnp.float32(0.0)))
        comp = time.time() - t0
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(reps):
            acc = summ(fn(x), acc)
        float(acc)
        dt = (time.time() - t0) / reps * 1e3
        print(f"# {name:28s} {dt:7.3f} ms  (compile {comp:.1f}s)",
              file=sys.stderr)
        return dt

    t_vpu = timeit("VPU jnp.fft", jax.jit(lambda v: jnp.fft.fft(v, axis=-1)))
    t_mxu = timeit("XLA-staged MXU DFT",
                   jax.jit(lambda v: mxufft._transform(v, -1, False, False)))
    t_fus = timeit("fused Pallas four-step",
                   jax.jit(lambda v: fft_pallas.fft_fused(v)))
    timeit("fused Pallas inverse",
           jax.jit(lambda v: fft_pallas.fft_fused(v, inverse=True)))

    flops = 5.0 * b * n * 18 / 1e9   # nominal 5 N log2 N per transform
    print(json.dumps({
        "metric": "fft_fused_ms_8x262144",
        "value": round(t_fus, 3),
        "unit": "ms",
        "vs_baseline": round(t_vpu / t_fus, 2),
        "effective_gflops": round(flops / (t_fus / 1e3), 1),
        "xla_mxu_ms": round(t_mxu, 3),
        "vpu_ms": round(t_vpu, 3),
    }))


if __name__ == "__main__":
    child_or_retry(main)
