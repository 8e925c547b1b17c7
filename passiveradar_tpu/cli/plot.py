"""Range-Doppler video/frames renderer (reference range_doppler_plot.py)."""

from __future__ import annotations

import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, load, parser
from passiveradar_tpu.io.writers import load_maps
from passiveradar_tpu.ops.cfar import cfar_2d
from passiveradar_tpu.viz.render import render_frames, render_video


def cfar_stack(xambg: np.ndarray, fw: int = 18, gw: int = 4) -> np.ndarray:
    """CFAR-normalise every frame (reference range_doppler_plot.py:54-57) —
    batched on device instead of a per-frame scipy loop."""
    frames = np.moveaxis(xambg, 2, 0)
    cf = np.asarray(cfar_2d(frames, fw, gw))
    return np.moveaxis(cf, 0, 2)


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - VIDEO RENDERER", modes=("video", "frames"))
    args = p.parse_args(argv)
    cfg = load(args)

    xambg = load_maps(cfg)
    print(f"Loaded range-Doppler maps {xambg.shape}")
    cf = cfar_stack(xambg)

    if args.mode == "frames":
        out = render_frames(cf, cfg)
    else:
        out = render_video(cf, cfg, "RADAR_VIDEO.mp4")
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
