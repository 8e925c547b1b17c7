"""Main processing entry point: capture → range-Doppler map stack.

Mirrors the reference's main.py CLI (main.py:17-28, 229-233); the dask graph
becomes the jitted frame pipeline, optionally sharded over all local devices.
"""

from __future__ import annotations

import time

from passiveradar_tpu.cli.common import fail_on_missing_capture, banner, load, parser
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.io.writers import MapWriter, write_metadata
from passiveradar_tpu.pipeline import capture_frame_count, run_capture


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - MAIN PROCESSING")
    p.add_argument("--batch-frames", type=int, default=None,
                   help="Frames per device dispatch (default: cfg.frame_batch)")
    p.add_argument("--dispatch-groups", type=int, default=1,
                   help="Batches per device program (lax.scan; amortises "
                        "launch overhead; single-device path only)")
    p.add_argument("--shard", action="store_true",
                   help="Shard the frame batch across all local devices")
    p.add_argument("--resume", action="store_true",
                   help="Resume an interrupted run from the existing output file")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Capture a jax.profiler trace of the run into DIR")
    p.add_argument("--num-processes", type=int, default=None,
                   help="Multi-host: total process count (one per host); "
                        "each host writes a .partN output shard")
    p.add_argument("--process-id", type=int, default=None,
                   help="Multi-host: this host's process index")
    p.add_argument("--coordinator", type=str, default=None,
                   help="Multi-host: coordinator address host:port "
                        "(omit on cloud TPU pods for auto-detection)")
    args = p.parse_args(argv)
    cfg = load(args)

    if args.num_processes is not None or args.coordinator is not None:
        from passiveradar_tpu.parallel.distributed import (
            init_distributed, run_capture_multihost)
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
        import jax
        first = jax.process_index() == 0
        if first:
            banner(cfg)
        t0 = time.time()
        n, global_n = run_capture_multihost(
            cfg, batch_frames=args.batch_frames, progress=first)
        dt = time.time() - t0
        print(f"[process {jax.process_index()}] {n} frames "
              f"({n / dt:.1f} frames/s local); {global_n} frames globally")
        if first and jax.process_count() > 1:
            print("Reassemble the shard files with: python -m "
                  "passiveradar_tpu.cli.concat --config <config>")
        return

    banner(cfg)

    reader = CaptureReader(cfg)
    print(f"Corrected a sample offset of {reader.offset} samples between channels")
    total = capture_frame_count(reader, cfg)
    writer = MapWriter(cfg, total, resume=args.resume)
    if args.resume and writer.frames_done:
        print(f"Resuming at frame {writer.frames_done}/{total}")

    sharding = None
    if args.shard:
        from passiveradar_tpu.parallel.mesh import frame_sharding, make_mesh
        sharding = frame_sharding(make_mesh())

    t0 = time.time()
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            n = run_capture(reader, writer, cfg,
                            batch_frames=args.batch_frames, sharding=sharding,
                            dispatch_groups=args.dispatch_groups)
    else:
        n = run_capture(reader, writer, cfg, batch_frames=args.batch_frames,
                        sharding=sharding,
                        dispatch_groups=args.dispatch_groups)
    writer.close()
    write_metadata(cfg, n)
    dt = time.time() - t0
    print(f"Saved {n} range-Doppler frames to {writer.path} "
          f"({n / dt:.1f} frames/s); metadata in {cfg.meta_fname}")
    reader.close()


if __name__ == "__main__":
    main()
