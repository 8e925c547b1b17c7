"""Range-Doppler video/frames renderer (reference range_doppler_plot.py).

The disk→PNG/mp4 path streams end-to-end: maps are read lazily
(io.writers.AbsMapStack), CFAR runs per rendered chunk on device
(LazyCFAR), and the renderer never materialises the display stack
(viz/render.iter_display_frames) — peak host memory is O(render chunk)
at any capture length.
"""

from __future__ import annotations

import numpy as np

from passiveradar_tpu.cli.common import fail_on_missing_capture, load, parser
from passiveradar_tpu.io.writers import AbsMapStack
from passiveradar_tpu.ops.cfar import cfar_2d
from passiveradar_tpu.viz.render import render_frames, render_video


def cfar_stack(xambg: np.ndarray, fw: int = 18, gw: int = 4) -> np.ndarray:
    """CFAR-normalise every frame (reference range_doppler_plot.py:54-57) —
    batched on device instead of a per-frame scipy loop."""
    frames = np.moveaxis(xambg, 2, 0)
    cf = np.asarray(cfar_2d(frames, fw, gw))
    return np.moveaxis(cf, 0, 2)


class LazyCFAR:
    """Per-slice CFAR view over a lazily-sliceable (H, W, F) |CAF| stack.

    Exact: CFAR is per-frame, so slicing then normalising equals
    normalising the whole stack then slicing. Feed to the streaming
    renderer to keep disk→video memory bounded.
    """

    def __init__(self, stack, fw: int = 18, gw: int = 4):
        self._stack = stack
        self._fw, self._gw = fw, gw
        self.shape = stack.shape

    def __getitem__(self, key) -> np.ndarray:
        return cfar_stack(self._stack[key], self._fw, self._gw)


@fail_on_missing_capture
def main(argv=None):
    p = parser("PASSIVE RADAR - VIDEO RENDERER", modes=("video", "frames"))
    p.add_argument("--input", default=None,
                   help="Map-stack path to render instead of the config's "
                        "default output — e.g. a wideband per-channel stack "
                        "(<output>.chK.<ftype>) or the --integrate stack "
                        "(<output>.integrated.<ftype>)")
    args = p.parse_args(argv)
    cfg = load(args)

    with AbsMapStack(cfg, path=args.input) as xambg:
        print(f"Rendering range-Doppler maps {xambg.shape} (streamed)")
        cf = LazyCFAR(xambg)
        if args.mode == "frames":
            out = render_frames(cf, cfg)
        else:
            out = render_video(cf, cfg, "RADAR_VIDEO.mp4")
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
