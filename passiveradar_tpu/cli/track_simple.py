"""Single-target Kalman tracker CLI (reference simple_kalman_tracker.py)."""

from __future__ import annotations

import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, load, parser
from passiveradar_tpu.cli.plot import cfar_stack
from passiveradar_tpu.detect.trackers import simple_target_tracker
from passiveradar_tpu.io.writers import load_maps
from passiveradar_tpu.viz.render import render_video


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - SIMPLE TARGET TRACKER",
               modes=("plot", "video", "frames"))
    p.add_argument("--input", default=None,
                   help="Map-stack path to track on instead of the config's "
                        "default output (e.g. a wideband per-channel or "
                        "--integrate stack)")
    args = p.parse_args(argv)
    cfg = load(args)

    xambg = load_maps(cfg, path=args.input)
    cf = cfar_stack(xambg)
    hist = simple_target_tracker(cf, cfg.max_range_actual,
                                 cfg.max_doppler_actual, frames_last=True,
                                 strict=cfg.strict_frame_parity)
    est = np.asarray(hist["estimate"])       # (F, 2) [range, doppler]
    lock = np.asarray(hist["lock_mode"])     # (F, 4)
    locked = lock[:, 2] == 1

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.mode == "plot":
        fig = plt.figure(figsize=(8, 4.5), dpi=120)
        ax = fig.add_subplot(111)
        ax.plot(est[~locked, 1], est[~locked, 0], ".", color="0.7",
                ms=3, label="unlocked")
        ax.plot(est[locked, 1], est[locked, 0], "b.", ms=4, label="locked")
        ax.set_xlabel("Doppler shift (Hz)")
        ax.set_ylabel("Bistatic range (km)")
        ax.legend()
        fig.tight_layout()
        fig.savefig("TRACKER_PLOT.png")
        print("Wrote TRACKER_PLOT.png")
        return

    def overlay(ax, k):
        if not locked[k]:
            return []
        return [ax.plot(est[k, 1], est[k, 0], "wo", mfc="none", ms=10)[0]]

    out = render_video(cf, cfg, "TRACKER_VIDEO.mp4", overlay=overlay)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
