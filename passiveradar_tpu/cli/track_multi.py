"""Multi-target Kalman tracker CLI (reference multitarget_kalman_tracker.py)."""

from __future__ import annotations

import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, load, parser
from passiveradar_tpu.cli.plot import cfar_stack
from passiveradar_tpu.detect.trackers import multitarget_tracker
from passiveradar_tpu.io.writers import load_maps
from passiveradar_tpu.viz.render import render_video

N_TRACKS = 10  # reference multitarget_kalman_tracker.py:60
TRAIL = 20     # fading-trail length in the video overlay


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - MULTITARGET TRACKER",
               modes=("plot", "video", "frames"))
    p.add_argument("--input", default=None,
                   help="Map-stack path to track on instead of the config's "
                        "default output (e.g. a wideband per-channel or "
                        "--integrate stack)")
    args = p.parse_args(argv)
    cfg = load(args)

    xambg = load_maps(cfg, path=args.input)
    cf = cfar_stack(xambg)
    hist = multitarget_tracker(
        cf, (cfg.max_doppler_actual, cfg.max_range_actual), N_TRACKS,
        k_max=cfg.candidate_budget, frames_last=True)
    est = np.asarray(hist["estimate"])       # (F, N, 2)
    status = np.asarray(hist["status"])      # (F, N)
    confirmed = status == 2

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.mode == "plot":
        fig = plt.figure(figsize=(8, 4.5), dpi=120)
        ax = fig.add_subplot(111)
        cmap = plt.get_cmap("tab10")
        for i in range(N_TRACKS):
            sel = confirmed[:, i]
            if np.any(sel):
                ax.plot(est[sel, i, 1], est[sel, i, 0], ".", ms=4,
                        color=cmap(i % 10), label=f"track {i}")
        ax.set_xlabel("Doppler shift (Hz)")
        ax.set_ylabel("Bistatic range (km)")
        fig.tight_layout()
        fig.savefig("MULTITARGET_PLOT.png")
        print("Wrote MULTITARGET_PLOT.png")
        return

    cmap_colors = [f"C{i}" for i in range(10)]

    def overlay(ax, k):
        artists = []
        lo = max(0, k - TRAIL)
        for i in range(N_TRACKS):
            sel = confirmed[lo:k + 1, i]
            if np.any(sel):
                pts = est[lo:k + 1][sel, i]
                artists.append(ax.plot(pts[:, 1], pts[:, 0], ".",
                                       color=cmap_colors[i % 10], ms=4,
                                       alpha=0.7)[0])
        return artists

    out = render_video(cf, cfg, "MULTITARGET_VIDEO.mp4", overlay=overlay)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
