"""Levinson-recursion unroll sweep (dev diagnostic).

The batched Levinson scan is latency-bound (184 dependent steps); unroll
packs more steps per XLA while-iteration. Sweeps unroll at the FM
geometry's 40x185 batch and prints the best time as the JSON metric.
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

    from passiveradar_tpu.ops.clutter import levinson_first_col

    m, nb = 185, 40

    @jax.jit
    def _make():
        a = (jax.random.normal(jax.random.PRNGKey(0), (nb, m))
             + 1j * jax.random.normal(jax.random.PRNGKey(1), (nb, m))
             ).astype(jnp.complex64)
        return a.at[:, 0].set(jnp.float32(m) * 10.0)

    acs = _make()
    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))
    best = (1e9, 0)
    for unroll in (4, 8, 16, 32):
        fn = jax.jit(lambda c, u=unroll: levinson_first_col(c, unroll=u))
        float(summ(fn(acs), jnp.float32(0.0)))
        reps = 32
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(reps):
            acc = summ(fn(acs), acc)
        float(acc)
        dt = (time.time() - t0) / reps * 1000.0
        print(f"# unroll={unroll:3d}: {dt:7.3f} ms", file=sys.stderr)
        if dt < best[0]:
            best = (dt, unroll)
    print(json.dumps({
        "metric": "levinson_ms_best",
        "value": round(best[0], 3),
        "unit": f"ms (unroll={best[1]})",
        "vs_baseline": 0,
    }))


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=900.0)
