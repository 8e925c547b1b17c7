"""Wideband multi-illuminator benchmark (BASELINE config 4).

DVB-T-class geometry: an 8 MHz band split into K=8 critically-sampled 1 MHz
channels by the polyphase channelizer, each running the full per-channel
clutter-cancellation + CAF chain (wideband.wideband_frames). One wideband
CPI is 2,097,152 samples (262144 per channel, 0.26 s of airtime).

The reference has no wideband path at all (it processes one FM channel per
run), so vs_baseline reports the real-time multiple: CPIs/s x CPI seconds
(how many 8 MHz bands one chip can process live).

Prints one JSON line:
  {"metric": "wideband_cpi_per_s", "value": N, "unit": "CPI/s", "vs_baseline": R}
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

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.wideband import wideband_frames

    params = dict(
        input_sample_rate=8_000_000,
        input_center_freq=0,
        channel_freq=0,
        channel_bandwidth=8_000_000,
        cpi_seconds_nominal=0.25,
        max_doppler_nominal=256.0,
        max_range_nominal=60.0,
        wideband_channels=8,
        num_frames=10_000,
    )
    cfg = derive_config(params)
    batch = 4
    n = cfg.cpi_samples * cfg.wideband_channels

    # device-side synthetic wideband capture: bandlimited noise band plus a
    # delayed/Doppler-shifted echo (the host CPU is far too slow for this)
    @jax.jit
    def synth(key):
        k1, k2 = jax.random.split(key)
        base = (jax.random.normal(k1, (batch, n))
                + 1j * jax.random.normal(k2, (batch, n))).astype(jnp.complex64)
        # light spectral shaping so the band is not white
        f = jnp.fft.fft(base, axis=1)
        shape = jnp.exp(-0.5 * (jnp.linspace(-2, 2, n)) ** 2) + 0.2
        ref = jnp.fft.ifft(f * shape, axis=1).astype(jnp.complex64)
        t = jnp.arange(n, dtype=jnp.float32) / cfg.input_sample_rate
        echo = jnp.roll(ref, 24, axis=1) * jnp.exp(
            1j * 2 * jnp.pi * 40.0 * t)[None, :]
        srv = 0.7 * ref + 0.05 * echo
        return ref, srv.astype(jnp.complex64)

    t0 = time.time()
    ref, srv = synth(jax.random.PRNGKey(1))
    ref2, srv2 = synth(jax.random.PRNGKey(2))
    jax.block_until_ready((ref, srv, ref2, srv2))
    gen_s = time.time() - t0

    summ = jax.jit(lambda x, a: a + jnp.sum(jnp.abs(x)))

    t0 = time.time()
    out = wideband_frames(ref, srv, cfg)
    float(summ(out, jnp.float32(0.0)))
    compile_s = time.time() - t0

    reps = 8
    t0 = time.time()
    acc = jnp.float32(0.0)
    for i in range(reps):
        out = wideband_frames(ref if i % 2 else ref2,
                              srv if i % 2 else srv2, cfg)
        acc = summ(out, acc)
    float(acc)
    elapsed = time.time() - t0

    # shmap path on a 1-device mesh vs the vmap path, both measured
    # IN-PROGRAM (reps inside one lax.scan): bounds the time-sharded
    # channelizer program's restructuring overhead (branch-filter +
    # causal ppermute halo + all_to_all transpose). Per-dispatch
    # comparisons are meaningless for this pair on the dev relay: a
    # mesh-addressed program makes every dispatch reshard (or worse,
    # host-restage) its ~134 MB of operands — measured +99 ms D2D /
    # +1159 ms host-staged per dispatch, a container artifact
    # (docs/PERFORMANCE.md round-5 note).
    import functools as _ft

    import numpy as _np
    from jax.sharding import Mesh

    from passiveradar_tpu import wideband as _wb

    mesh1 = Mesh(_np.asarray(jax.devices()[:1]), ("channels",))
    refs = jnp.stack([ref, ref2])
    srvs = jnp.stack([srv, srv2])
    jax.block_until_ready((refs, srvs))
    scan_reps = 8

    def scan_of(inner):
        @jax.jit
        def run(refs, srvs):
            def step(acc, i):
                out = inner(refs[i], srvs[i])
                return acc + jnp.sum(jnp.abs(out)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(scan_reps,
                                             dtype=jnp.int32) % 2)
            return acc
        return run

    def time_scan(run):
        t0 = time.time()
        float(run(refs, srvs))
        c = time.time() - t0
        t0 = time.time()
        float(run(refs, srvs))
        return (time.time() - t0) / scan_reps * 1000.0, c

    vmap_scan_ms, c1 = time_scan(
        scan_of(lambda r, s: _wb.wideband_frames(r, s, cfg)))
    shmap_scan_ms, c2 = time_scan(scan_of(
        lambda r, s: _wb.wideband_frames_shmap(r, s, cfg, mesh1)))
    shmap_ms, full_scan_ms, shmap_compile_s = shmap_scan_ms, vmap_scan_ms, c2

    # channelizer-only share of per-CPI time (for the record; the shmap
    # path above time-shards it instead of replicating it per device)
    from passiveradar_tpu.ops.channelizer import channelize_pair
    chan = jax.jit(lambda r, s: channelize_pair(
        r, s, cfg.wideband_channels,
        taps_per_branch=cfg.wideband_taps_per_branch))
    rc, _ = chan(ref[0], srv[0])
    float(summ(rc, jnp.float32(0.0)))
    t0 = time.time()
    acc = jnp.float32(0.0)
    for i in range(reps):
        rc, sc = chan(ref[0] if i % 2 else ref2[0],
                      srv[0] if i % 2 else srv2[0])
        acc = summ(rc, acc)
    float(acc)
    chan_ms = (time.time() - t0) / reps * 1000.0

    cpi_per_s = reps * batch / elapsed
    realtime = cpi_per_s * cfg.cpi_seconds_actual
    print(json.dumps({
        "metric": "wideband_cpi_per_s",
        "value": round(cpi_per_s, 2),
        "unit": "CPI/s",
        "vs_baseline": round(realtime, 2),
    }))
    full_ms = elapsed / reps * 1000.0
    print(f"# geometry: {cfg.wideband_channels} ch x "
          f"{cfg.num_doppler_cells}x{cfg.num_range_cells + 1} maps from "
          f"{n}-sample wideband CPIs; batch={batch}; "
          f"{cpi_per_s * n / 1e6:.0f} Msamples/s/chip; gen={gen_s:.1f}s "
          f"compile={compile_s:.1f}s run={elapsed:.2f}s", file=sys.stderr)
    print(f"# shmap path (1-device mesh, time-sharded channelizer), "
          f"in-scan: {shmap_ms:.2f} ms/batch{batch} vs vmap in-scan "
          f"{full_scan_ms:.2f} — restructuring overhead "
          f"{shmap_ms - full_scan_ms:+.2f} ms "
          f"(compiles {c1:.1f}/{shmap_compile_s:.1f}s)", file=sys.stderr)
    print(f"# channelizer alone (1 CPI pair): {chan_ms:.2f} ms = "
          f"{chan_ms / (full_ms / batch) * 100:.1f}% of per-CPI time "
          f"(what per-device replication WOULD cost; the shmap path "
          f"time-shards it instead)", file=sys.stderr)


if __name__ == "__main__":
    child_or_retry(main)
