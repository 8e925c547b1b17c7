"""Range-Doppler map persistence and metadata.

Keeps the reference's file contract (main.py:200-227): a frame stack of shape
(num_doppler_cells, num_range_cells+1, num_frames) complex64 under '/xambg'
in HDF5, or a zarr v2 array — via the real ``zarr`` package when installed,
else the vendored spec-subset writer (io/zarr_min.py, same on-disk format) —
plus an .npz with frame_timestamps / range_bins / doppler_bins axes.

Divergence (documented): the reference writes a doppler_bins axis with twice
the frame's Doppler rows (main.py:202-203, a factor-of-2 metadata bug); we
write the correct length-num_doppler_cells axis centred on zero — except
under cfg.strict_frame_parity, which replicates the doubled axis so a strict
run byte-diffs cleanly against a reference run.
"""

from __future__ import annotations

import importlib.util

import h5py
import numpy as np

from passiveradar_tpu.config import RadarConfig

_HAS_ZARR = importlib.util.find_spec("zarr") is not None


def zarr_backend():
    """The zarr implementation: the real package when installed, else the
    vendored v2 directory-store subset (io/zarr_min — same on-disk format).
    A requested zarr output is therefore always honoured; there is no silent
    fallback to HDF5."""
    if _HAS_ZARR:
        import zarr
        return zarr
    from passiveradar_tpu.io import zarr_min
    return zarr_min


# frames copied per step when streaming between stacks (concat/resume scans):
# bounds host memory at O(slab) instead of O(capture)
CONCAT_SLAB_FRAMES = 64


def write_metadata(cfg: RadarConfig, num_frames: int, path: str | None = None):
    path = path or cfg.meta_fname
    nf = cfg.num_doppler_cells
    if cfg.strict_frame_parity:
        # byte-diffable against a reference run: replicate its doppler_bins
        # axis with 2x the frame's Doppler rows (reference main.py:202-203,
        # a factor-of-2 metadata bug — kept ONLY under strict parity)
        doppler_bins = np.arange(-nf, nf) * cfg.doppler_cell_width
    else:
        doppler_bins = (np.arange(nf) - nf // 2) * cfg.doppler_cell_width
    np.savez(
        path,
        frame_timestamps=np.arange(num_frames) * cfg.frame_interval,
        range_bins=np.arange(cfg.num_range_cells + 1) * cfg.range_cell_width,
        doppler_bins=doppler_bins,
    )


class MapWriter:
    """Incremental frame-stack writer (frames arrive batch-by-batch).

    Progress is tracked in the output file itself (a ``frames_done``
    attribute advanced on contiguous writes), so an interrupted run can be
    resumed with ``resume=True`` — the crash-loses-the-run failure mode of
    the reference (SURVEY §5.3: no resume logic) is closed.
    """

    def __init__(self, cfg: RadarConfig, num_frames: int,
                 path: str | None = None, resume: bool = False):
        self.cfg = cfg
        self.num_frames = num_frames
        self.path = path or cfg.range_doppler_map_fname
        self.frames_done = 0
        shape = (cfg.num_doppler_cells, cfg.num_range_cells + 1, num_frames)
        chunk = (cfg.num_doppler_cells, cfg.num_range_cells + 1, 1)
        ftype = cfg.range_doppler_map_ftype
        if ftype == "zarr":
            zarr = zarr_backend()
            mode = "a" if resume else "w"
            self._z = zarr.open(self.path, mode=mode, shape=shape,
                                chunks=chunk, dtype=np.complex64)
            if resume:
                self.frames_done = int(self._z.attrs.get("frames_done", 0))
            else:
                # mode 'w' cleared the store (zarr semantics; enforced in
                # zarr_min too) — pin the resume counter to 0 explicitly so
                # a crash before the first write resumes from 0, matching
                # the HDF5 branch
                self._z.attrs["frames_done"] = 0
            self._h5 = None
        else:
            import os
            if resume and os.path.exists(self.path):
                self._h5 = h5py.File(self.path, "a")
                self._d = self._h5["/xambg"]
                self.frames_done = int(self._d.attrs.get("frames_done", 0))
            else:
                self._h5 = h5py.File(self.path, "w")
                self._d = self._h5.create_dataset(
                    "/xambg", shape=shape, dtype=np.complex64, chunks=chunk)
                self._d.attrs["frames_done"] = 0
            self._z = None

    def write(self, frames: np.ndarray, start: int):
        """frames: (F, num_doppler, num_range+1) batch starting at ``start``."""
        block = np.moveaxis(np.asarray(frames, np.complex64), 0, 2)
        if self._z is not None:
            self._z[:, :, start:start + frames.shape[0]] = block
        else:
            self._d[:, :, start:start + frames.shape[0]] = block
        if start <= self.frames_done:
            self.frames_done = max(self.frames_done, start + frames.shape[0])
            if self._z is not None:
                self._z.attrs["frames_done"] = self.frames_done
            else:
                self._d.attrs["frames_done"] = self.frames_done
                self._h5.flush()

    def close(self):
        if self._h5 is not None:
            self._h5.close()


def concat_parts(part_paths, out_path: str, ftype: str = "hdf5") -> int:
    """Concatenate per-host `.partN` shard files into one global frame stack.

    Each part holds a contiguous frame range in process order (the multi-host
    output contract, parallel/distributed.py). Frames stream in
    CONCAT_SLAB_FRAMES-sized slabs, so host memory stays O(slab) even when a
    single per-host part is many GB. Returns the total frame count.
    """
    def _copy_slabs(dst, src, at: int):
        n = src.shape[2]
        for s in range(0, n, CONCAT_SLAB_FRAMES):
            e = min(s + CONCAT_SLAB_FRAMES, n)
            dst[:, :, at + s:at + e] = src[:, :, s:e]
        return n

    if ftype == "zarr":
        zarr = zarr_backend()
        srcs = [zarr.open(p, mode="r") for p in part_paths]
        total = sum(s.shape[2] for s in srcs)
        dst = zarr.open(out_path, mode="w",
                        shape=srcs[0].shape[:2] + (total,),
                        chunks=srcs[0].chunks, dtype=srcs[0].dtype)
        at = 0
        for s in srcs:
            at += _copy_slabs(dst, s, at)
        dst.attrs["frames_done"] = total
        return total
    with h5py.File(out_path, "w") as out:
        dst = None
        at = 0
        for p in part_paths:
            with h5py.File(p, "r") as f:
                src = f["/xambg"]
                n = src.shape[2]
                if dst is None:
                    dst = out.create_dataset(
                        "/xambg", shape=src.shape[:2] + (n,),
                        maxshape=src.shape[:2] + (None,),
                        dtype=src.dtype, chunks=src.chunks)
                else:
                    dst.resize(at + n, axis=2)
                at += _copy_slabs(dst, src, at)
        if dst is not None:
            dst.attrs["frames_done"] = at
    return at


class AbsMapStack:
    """Lazily-sliceable |xambg| view over a map file (hdf5 or zarr).

    Exposes ``.shape`` and numpy basic slicing returning float32 magnitudes,
    reading only the requested frames from disk — the streaming renderer's
    input contract (viz/render.iter_display_frames), so a capture-scale
    stack renders at O(chunk) host memory instead of load_maps' O(capture).
    """

    def __init__(self, cfg: RadarConfig, path: str | None = None):
        path = path or cfg.range_doppler_map_fname
        if cfg.range_doppler_map_ftype == "zarr":
            self._ds = zarr_backend().open(path, mode="r")
            self._h5 = None
        else:
            self._h5 = h5py.File(path, "r")
            self._ds = self._h5["/xambg"]
        self.shape = tuple(self._ds.shape)

    def __getitem__(self, key) -> np.ndarray:
        return np.abs(np.asarray(self._ds[key])).astype(np.float32)

    def close(self):
        if self._h5 is not None:
            self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def load_maps(cfg: RadarConfig, path: str | None = None) -> np.ndarray:
    """Load |CAF| frame stack the way the post-processing scripts do
    (reference range_doppler_plot.py:40-48): returns abs(xambg) as
    (num_doppler, num_range+1, num_frames) float32."""
    path = path or cfg.range_doppler_map_fname
    if cfg.range_doppler_map_ftype == "zarr":
        xambg = np.abs(np.asarray(zarr_backend().open(path, mode="r")))
    else:
        with h5py.File(path, "r") as f:
            xambg = np.abs(np.asarray(f["/xambg"]))
    return xambg.astype(np.float32)
