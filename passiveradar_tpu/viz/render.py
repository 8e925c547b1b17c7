"""Frame/video rendering of CFAR range-Doppler stacks.

Mirrors the reference's renderer (range_doppler_plot.py:59-107): persistence
effect, orientation flip, percentile color limits, PNG frames or an mp4 via
matplotlib/ffmpeg (gated: falls back to frames when ffmpeg is missing).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.viz.persistence import persistence_stack


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def prepare_display_frames(cf: np.ndarray, hold: int = 20,
                           decay: float = 0.90) -> np.ndarray:
    """|CAF|/CFAR stack (doppler, range, frames) → display frames
    (frames, range, doppler) with persistence applied."""
    frames = np.moveaxis(cf, 2, 0)                       # (F, nf, nr)
    stack = np.asarray(persistence_stack(frames, hold, decay))
    return np.flip(np.swapaxes(stack, 1, 2), axis=2)     # fliplr(frame.T)


def _setup_axes(ax, cfg: RadarConfig):
    ax.set_xlabel("Doppler shift (Hz)")
    ax.set_ylabel("Bistatic range (km)")


def render_frames(cf: np.ndarray, cfg: RadarConfig, out_dir: str = "IMG",
                  hold: int = 20, decay: float = 0.90, prefix: str = "img"):
    """Save per-frame PNGs (reference range_doppler_plot.py --mode frames)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    disp = prepare_display_frames(cf, hold, decay)
    extent = [-cfg.max_doppler_actual, cfg.max_doppler_actual,
              0, cfg.max_range_actual]
    for k in range(disp.shape[0]):
        frame = disp[k]
        vmin, vmax = np.percentile(frame, [1, 99])
        fig = plt.figure(figsize=(8, 4.5), dpi=120)
        ax = fig.add_subplot(111)
        # row 0 of the display frame is MAXIMUM range (the reference's
        # linspace(extent, 0) convention) — matplotlib's default
        # origin='upper' puts it at the top, where it belongs
        ax.imshow(frame, cmap="gnuplot2", vmin=vmin, vmax=vmax,
                  extent=extent, aspect="auto")
        _setup_axes(ax, cfg)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{prefix}_{k:04d}.png"))
        plt.close(fig)
    return out_dir


def render_video(cf: np.ndarray, cfg: RadarConfig, out_path: str,
                 hold: int = 20, decay: float = 0.90, fps: int = 25,
                 overlay=None):
    """Render an mp4 (reference --mode video). Falls back to PNG frames when
    ffmpeg is unavailable. ``overlay(ax, k)`` may draw per-frame extras
    (tracker markers)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    if not has_ffmpeg():
        out_dir = os.path.splitext(out_path)[0] + "_frames"
        print(f"ffmpeg not found; writing PNG frames to {out_dir}/ instead")
        return render_frames(cf, cfg, out_dir, hold, decay)

    disp = prepare_display_frames(cf, hold, decay)
    extent = [-cfg.max_doppler_actual, cfg.max_doppler_actual,
              0, cfg.max_range_actual]
    fig = plt.figure(figsize=(8, 4.5), dpi=120)
    ax = fig.add_subplot(111)
    vmin, vmax = np.percentile(disp, [1, 99])
    im = ax.imshow(disp[0], cmap="gnuplot2", vmin=vmin, vmax=vmax,
                   extent=extent, aspect="auto")
    _setup_axes(ax, cfg)
    artists = []

    def update(k):
        im.set_data(disp[k])
        for a in artists:
            a.remove()
        artists.clear()
        if overlay is not None:
            artists.extend(overlay(ax, k) or [])
        return [im] + artists

    anim = animation.FuncAnimation(fig, update, frames=disp.shape[0],
                                   interval=1000 / fps, blit=True)
    anim.save(out_path, writer=animation.FFMpegWriter(fps=fps))
    plt.close(fig)
    return out_path
