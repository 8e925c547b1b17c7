"""Radix-plan sweep for the MXU four-step DFT (dev diagnostic).

Times mxufft.fft at the pipeline's full CPI length for several per-level
radix choices (see ops/mxufft.py RADIX), plus the VPU FFT reference. Run on
the TPU; prints one JSON line with the best plan's time.
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

    from passiveradar_tpu.ops import mxufft

    batch, n = 8, 262144

    @jax.jit
    def _make_x():
        # complex only inside compiled programs (relay restriction)
        return (jax.random.normal(jax.random.PRNGKey(0), (batch, n))
                + 1j * jax.random.normal(jax.random.PRNGKey(1), (batch, n))
                ).astype(jnp.complex64)

    x = _make_x()
    jax.block_until_ready(x)
    summ = jax.jit(lambda y, a: a + jnp.sum(jnp.abs(y)))

    def timeit(name, fn, reps=24):
        out = fn(x)
        ref = float(summ(out, jnp.float32(0.0)))
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(reps):
            acc = summ(fn(x), acc)
        float(acc)
        dt = (time.time() - t0) / reps * 1000.0
        print(f"# {name:28s} {dt:7.3f} ms/batch   checksum {ref:.1f}",
              file=sys.stderr)
        return dt

    timeit("VPU jnp.fft", jax.jit(lambda y: jnp.fft.fft(y, axis=-1)))

    results = {}
    for radix in (64, 128, 256, 512):
        mxufft.RADIX = radix
        # drop every trace cache (incl. mxufft's inner jit) so the new plan
        # is actually retraced; compiled code reloads from the disk cache
        jax.clear_caches()
        fn = jax.jit(lambda y, _r=radix: mxufft.fft(y, axis=-1))
        results[radix] = timeit(f"MXU radix={radix}", fn)

    best = min(results, key=results.get)
    print(json.dumps({
        "metric": "mxufft_best_ms",
        "value": round(results[best], 3),
        "unit": f"ms/8x{n} (radix {best})",
        "vs_baseline": best,
    }))


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=2000.0)
