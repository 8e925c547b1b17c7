"""Frame/video rendering of CFAR range-Doppler stacks.

Mirrors the reference's renderer (range_doppler_plot.py:59-107): persistence
effect, orientation flip, per-frame percentile color limits (the reference
computes clim inside its render loop, range_doppler_plot.py:84-85), PNG
frames or an mp4 via matplotlib/ffmpeg (gated: falls back to frames when
ffmpeg is missing).

Memory: both renderers STREAM — frames flow through iter_display_frames in
bounded chunks with the persistence warm-up tail carried across chunk
boundaries (exact), so peak host memory is O(chunk), not O(capture). ``cf``
may be a numpy array or any lazily-sliceable (H, W, F) stack (an h5py
dataset, a zarr array, cli.plot.LazyCFAR) — a 1200-frame capture renders
without ever materialising the ~GB display stack the naive form needs.
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.viz.persistence import persistence_stack

# frames per streamed device dispatch; the carried warm-up tail adds hold-1
RENDER_CHUNK_FRAMES = 64


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def _to_display(stack: np.ndarray) -> np.ndarray:
    """(F, nf, nr) persistence output → (F, range, doppler) display frames
    (the reference's fliplr(frame.T), range_doppler_plot.py:73)."""
    return np.flip(np.swapaxes(stack, 1, 2), axis=2)


def iter_display_frames(cf, hold: int = 20, decay: float = 0.90,
                        chunk: int = RENDER_CHUNK_FRAMES):
    """Yield display frames of a (doppler, range, frames) stack one by one.

    ``cf`` needs only ``.shape`` and basic slicing ``cf[:, :, s:e]`` — a
    numpy array, h5py dataset, or zarr array all work, so the stack streams
    straight from disk. Persistence is exact across chunk boundaries: each
    chunk is evaluated with the previous ``hold-1`` raw frames prepended as
    warm-up and those outputs dropped.
    """
    total = cf.shape[2]
    tail = None                                        # last hold-1 raw frames
    for s in range(0, total, chunk):
        e = min(s + chunk, total)
        block = np.moveaxis(np.asarray(cf[:, :, s:e]), 2, 0)   # (f, nf, nr)
        warm = 0
        if tail is not None and hold > 1:
            warm = tail.shape[0]
            block = np.concatenate([tail, block], axis=0)
        out = np.asarray(persistence_stack(block, hold, decay))[warm:]
        if hold > 1:
            tail = block[-(hold - 1):]
        yield from _to_display(out)


def prepare_display_frames(cf: np.ndarray, hold: int = 20,
                           decay: float = 0.90) -> np.ndarray:
    """|CAF|/CFAR stack (doppler, range, frames) → display frames
    (frames, range, doppler) with persistence applied. Materialises the full
    stack — use iter_display_frames for capture-scale rendering."""
    frames = np.moveaxis(np.asarray(cf[:, :, :]), 2, 0)  # (F, nf, nr)
    stack = np.asarray(persistence_stack(frames, hold, decay))
    return _to_display(stack)


def _frame_clim(frame: np.ndarray) -> tuple[float, float]:
    """Per-frame color limits, the reference's exact ad-hoc values
    (range_doppler_plot.py:84-85): vmin = 35th percentile,
    vmax = 1.5 x 99th percentile, recomputed per displayed frame."""
    return (float(np.percentile(frame, 35)),
            1.5 * float(np.percentile(frame, 99)))


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
    extent = [-cfg.max_doppler_actual, cfg.max_doppler_actual,
              0, cfg.max_range_actual]
    for k, frame in enumerate(iter_display_frames(cf, hold, decay)):
        vmin, vmax = _frame_clim(frame)
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

    extent = [-cfg.max_doppler_actual, cfg.max_doppler_actual,
              0, cfg.max_range_actual]
    fig = plt.figure(figsize=(8, 4.5), dpi=120)
    ax = fig.add_subplot(111)
    im = None
    artists = []
    writer = animation.FFMpegWriter(fps=fps)
    # stream frames straight into the encoder (grab_frame) instead of
    # materialising the display stack for FuncAnimation; per-frame clim
    # uses the reference's in-loop percentile limits (_frame_clim)
    with writer.saving(fig, out_path, fig.dpi):
        for k, frame in enumerate(iter_display_frames(cf, hold, decay)):
            vmin, vmax = _frame_clim(frame)
            if im is None:
                im = ax.imshow(frame, cmap="gnuplot2", vmin=vmin, vmax=vmax,
                               extent=extent, aspect="auto")
                _setup_axes(ax, cfg)
            else:
                im.set_data(frame)
                im.set_clim(vmin, vmax)
            for a in artists:
                a.remove()
            artists.clear()
            if overlay is not None:
                artists.extend(overlay(ax, k) or [])
            writer.grab_frame()
    plt.close(fig)
    return out_path
