"""Streaming-mode CLI: replay a capture through the real-time processor.

Simulates an SDR feed by pushing the capture's CPI chunks one at a time
through StreamingProcessor (CAF → CFAR → multitarget tracking per push) and
reporting confirmed tracks as they appear — the reference has no analog; this
is the framework's real-time surface (BASELINE config 5).
"""

from __future__ import annotations

import time

import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, banner, load, parser
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.streaming import StreamingProcessor


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - STREAMING PROCESSOR")
    p.add_argument("--max-frames", type=int, default=None,
                   help="Stop after this many frames (default: whole capture)")
    p.add_argument("--tracks", type=int, default=10,
                   help="Multitarget tracker slots")
    p.add_argument("--detail", choices=("full", "summary"), default="full",
                   help="Per-push result weight: 'summary' skips the "
                        "CAF/CFAR map fetch and returns only the track "
                        "summary (the low-latency realtime mode)")
    args = p.parse_args(argv)
    cfg = load(args)
    banner(cfg)

    reader = CaptureReader(cfg)
    total = min(reader.num_frames, cfg.num_frames, args.max_frames
                or reader.num_frames)
    wideband = cfg.wideband_channels >= 2
    if wideband:
        from passiveradar_tpu.wideband import WidebandStreamingProcessor
        sp = WidebandStreamingProcessor(cfg, n_tracks=args.tracks,
                                        detail=args.detail)
        print(f"Wideband streaming: {cfg.wideband_channels} channels, "
              f"tracking on {list(cfg.wideband_channel_select)}")
    else:
        sp = StreamingProcessor(cfg, n_tracks=args.tracks,
                                detail=args.detail)

    def report(res, label=""):
        if res is None:
            return
        table = res.summary if res.tracks is None else res.tracks
        status = np.asarray(table["status"])
        est = np.asarray(table["estimate"])
        confirmed = np.where(status == 2)[0]
        msg = ", ".join(
            f"track{i}: {est[i, 0]:.1f} km / {est[i, 1]:+.1f} Hz"
            for i in confirmed) or "no confirmed tracks"
        print(f"frame {res.frame_index:4d}{label}: {msg}", flush=True)

    t0 = time.time()
    for f in range(total):
        ref, srv = reader.read_iq_frames(f, 1)
        if wideband:
            for k, res in sp.push(ref[0], srv[0]).items():
                report(res, f" ch{k}")
        else:
            report(sp.push(ref[0], srv[0]))
    if not wideband:
        report(sp.flush())
    dt = time.time() - t0
    print(f"Streamed {total} frames in {dt:.1f} s "
          f"({total / dt:.1f} frames/s; capture real-time rate is "
          f"{1 / cfg.frame_interval:.1f} frames/s)")
    reader.close()


if __name__ == "__main__":
    main()
