"""End-to-end disk-to-disk benchmark: capture file -> range-Doppler map file.

Measures the WHOLE production path — HDF5 ingest (with the background
prefetch thread), host->device transfer, the full device pipeline, device
fetch, and HDF5 map output — on a multi-GB synthetic FM capture, the same
contract as the reference's headline "about 20 minutes" figure
(reference README.md:24, which is a disk-to-disk number for a 1200-frame
capture: ~1 frame/s, ~4.8 Msamples/s over both channels).

The capture file is generated once on device (host numpy is far too slow for
GB-scale synthesis) and cached under .bench_data/ (gitignored); the
measurement itself starts from a cold output file every run.

Prints exactly one JSON line:
  {"metric": "e2e_msamples_per_s", "value": N, "unit": "Msamples/s",
   "vs_baseline": N}

vs_baseline: the reference pipeline ingests 2 channels x 2.4 Msamples/s at
~1x realtime => ~4.8 Msamples/s on its desktop-CPU baseline.
"""

import json
import os
import sys
import time

from bench_util import child_or_retry

FRAMES = 48
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_data")
CAPTURE = os.path.join(DATA_DIR, f"fm_capture_{FRAMES}_i16.hdf5")
I16_SCALE = 1.0 / 20000.0   # capture quantization: counts -> amplitude
OUT = os.path.join(DATA_DIR, "e2e_out.hdf5")

PARAMS = dict(
    input_sample_rate=2_400_000,
    input_center_freq=102_000_000,
    channel_freq=101_900_000,
    channel_bandwidth=200_000,
    cpi_seconds_nominal=2.0,
    max_doppler_nominal=256.0,
    max_range_nominal=200.0,
    overlap_cpi=True,
    num_frames=FRAMES,
    int16_scale=I16_SCALE,
    range_doppler_map_ftype="hdf5",
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
)


def _ensure_capture(cfg):
    """Synthesise the capture on device, stream it to HDF5 once.

    Stored as int16 counts — the native SDR recording format (and half the
    bytes of float32 both on disk and over the host->device transfer; the
    pipeline converts on device, see pipeline.preprocess_batch).
    """
    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from passiveradar_tpu.io.synthetic import Target, synth_capture_device

    quant = jax.jit(lambda x: jnp.clip(
        jnp.round(x / I16_SCALE), -32767, 32767).astype(jnp.int16))

    if os.path.exists(CAPTURE):
        with h5py.File(CAPTURE, "r") as f:
            if f["/data/ref"].shape[0] == FRAMES * cfg.input_chunk_length:
                return
        os.remove(CAPTURE)
    os.makedirs(DATA_DIR, exist_ok=True)
    t0 = time.time()
    step = 8
    with h5py.File(CAPTURE + ".tmp", "w") as f:
        dref = f.create_dataset(
            "/data/ref", shape=(FRAMES * cfg.input_chunk_length,),
            dtype=np.int16)
        dsrv = f.create_dataset(
            "/data/srv", shape=(FRAMES * cfg.input_chunk_length,),
            dtype=np.int16)
        for s in range(0, FRAMES, step):
            ref, srv = synth_capture_device(
                cfg, step, seed=s,
                targets=(Target(200, 40.0, 0.05), Target(500, -80.0, 0.03)))
            r = np.asarray(quant(ref)).reshape(-1)
            v = np.asarray(quant(srv)).reshape(-1)
            a = s * cfg.input_chunk_length
            dref[a:a + len(r)] = r
            dsrv[a:a + len(v)] = v
    os.replace(CAPTURE + ".tmp", CAPTURE)
    print(f"# generated {CAPTURE} "
          f"({os.path.getsize(CAPTURE) / 1e9:.2f} GB, "
          f"{time.time() - t0:.0f}s)", file=sys.stderr)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from passiveradar_tpu.config import derive_config
    from passiveradar_tpu.io.hdf5 import CaptureReader
    from passiveradar_tpu.io.writers import MapWriter
    from passiveradar_tpu.pipeline import run_capture

    cfg = derive_config(dict(PARAMS, input_file=CAPTURE,
                             output_fname=os.path.join(DATA_DIR, "e2e_out")))
    _ensure_capture(cfg)

    if os.path.exists(OUT):
        os.remove(OUT)
    reader = CaptureReader(cfg, estimate_offset=True)

    # warm the compile outside the timed window: run_capture dispatches ONE
    # fixed-shape program (frame_batch+2 frames of the reader's dispatch
    # dtype — raw int16 here), so a single zero-buffer call compiles it; the
    # timed run then measures steady-state throughput
    import jax.numpy as jnp

    from passiveradar_tpu.ops.util import to_host_complex
    from passiveradar_tpu.pipeline import process_frames

    t0 = time.time()
    lc = cfg.input_chunk_length // 2
    z = jnp.zeros((cfg.frame_batch + 2, lc, 2), reader.pair_dtype)
    to_host_complex(process_frames(z, z, jnp.zeros(cfg.frame_batch + 2,
                                                   jnp.float32), cfg))
    print(f"# pipeline compile/warm ({z.dtype}): {time.time() - t0:.0f}s",
          file=sys.stderr)
    writer = MapWriter(cfg, num_frames=min(reader.num_frames, cfg.num_frames),
                       path=OUT)
    t0 = time.time()
    total = run_capture(reader, writer, cfg, progress=False)
    wall = time.time() - t0
    writer.close()
    reader.close()

    # capture -> range-Doppler VIDEO leg (the reference's full headline
    # sentence, range_doppler_plot.py:35-107): streamed CFAR + persistence +
    # render — mp4 via ffmpeg, PNG frames otherwise. Timed separately so the
    # Msamples/s metric stays comparable across rounds.
    from passiveradar_tpu.cli.plot import LazyCFAR
    from passiveradar_tpu.io.writers import AbsMapStack
    from passiveradar_tpu.viz.render import has_ffmpeg, render_video

    t0 = time.time()
    with AbsMapStack(cfg, OUT) as stack:
        render_video(LazyCFAR(stack), cfg,
                     os.path.join(DATA_DIR, "e2e_video.mp4"))
    render_wall = time.time() - t0

    in_samples = total * (cfg.input_chunk_length // 2) * 2   # both channels
    msps = in_samples / wall / 1e6
    gb = 2 * os.path.getsize(CAPTURE) / FRAMES * total / 1e9 / 2
    print(json.dumps({
        "metric": "e2e_msamples_per_s",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 4.8, 1),
    }))
    print(f"# disk-to-disk: {total} frames in {wall:.1f}s "
          f"({total / wall:.1f} frames/s, {gb / wall:.2f} GB/s ingest, "
          f"offset={reader.offset})", file=sys.stderr)
    print(f"# capture->video total {wall + render_wall:.1f}s: maps {wall:.1f}s"
          f" + render {render_wall:.1f}s "
          f"({'mp4' if has_ffmpeg() else 'PNG frames (no ffmpeg)'}, "
          f"{total / render_wall:.1f} frames/s rendered, streamed CFAR + "
          f"persistence)", file=sys.stderr)


if __name__ == "__main__":
    child_or_retry(main, attempts=2, timeout_s=3600.0)
