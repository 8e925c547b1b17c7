"""Chunked, prefetching HDF5 capture reader.

Feeds the device pipeline per-frame raw chunks (real interleaved IQ). The
read pattern mirrors the reference's ingest (main.py:44-120): estimate the
inter-channel offset from the head of the capture, trim both channels to
alignment, then serve fixed-length frame chunks. A background prefetch thread
keeps the next batch in flight while the device computes — the host I/O path
is as performance-critical as the kernels for the <30 s target.

Multi-host: ``shard(process_index, process_count)`` restricts a reader to a
contiguous frame range so each host feeds only its own mesh slice.
"""

from __future__ import annotations

import queue
import threading

import h5py
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.ops.util import deinterleave_iq
from passiveradar_tpu.ops.xcorr import find_channel_offset


class CaptureReader:
    def __init__(self, cfg: RadarConfig, path: str | None = None,
                 estimate_offset: bool = True, max_offset_lags: int = 5_000_000):
        self.cfg = cfg
        self.path = path or cfg.input_file
        self._file = h5py.File(self.path, "r")
        if cfg.interleaved_input_channels:
            raise NotImplementedError(
                "interleaved single-dataset captures: split channels first "
                "(reference main.py:46-75 layout)")
        self._ref = self._file[cfg.input_ref_path]
        self._srv = self._file[cfg.input_srv_path]
        self.offset = 0
        if estimate_offset:
            self.offset = self._estimate_offset(max_offset_lags)
        self._apply_offset()

    # -- channel alignment --------------------------------------------------
    def _estimate_offset(self, max_lags: int) -> int:
        """Reference main.py:79-83: offset from the first ~10 CPIs."""
        head = min(10 * self.cfg.cpi_samples, len(self._ref), len(self._srv))
        refc = deinterleave_iq(np.asarray(self._ref[:head], np.float32))
        srvc = deinterleave_iq(np.asarray(self._srv[:head], np.float32))
        nl = min(max_lags, refc.shape[0] - 1)
        return int(find_channel_offset(refc, srvc, 1, nl))

    def _apply_offset(self):
        # offset is in complex samples; raw streams are interleaved (×2)
        off2 = 2 * self.offset
        n = min(len(self._ref), len(self._srv))
        if off2 > 0:
            self._ref_start, self._srv_start = off2, 0
            usable = n - off2
        elif off2 < 0:
            self._ref_start, self._srv_start = 0, -off2
            usable = n + off2
        else:
            self._ref_start = self._srv_start = 0
            usable = n
        self.frame_len = self.cfg.input_chunk_length
        self.num_frames = usable // self.frame_len
        self._first_frame = 0

    def shard(self, process_index: int, process_count: int) -> "CaptureReader":
        """Restrict to this host's contiguous frame range (multi-host ingest)."""
        per = self.num_frames // process_count
        self._first_frame = process_index * per
        self.num_frames = per
        return self

    # -- raw frame access ---------------------------------------------------
    def read_raw_frames(self, start: int, count: int):
        """(count, input_chunk_length) float32 per channel."""
        s = (self._first_frame + start) * self.frame_len
        e = s + count * self.frame_len
        ref = np.asarray(self._ref[self._ref_start + s:self._ref_start + e],
                         np.float32).reshape(count, self.frame_len)
        srv = np.asarray(self._srv[self._srv_start + s:self._srv_start + e],
                         np.float32).reshape(count, self.frame_len)
        return ref, srv

    def read_iq_frames(self, start: int, count: int):
        """(count, input_chunk_length//2) complex64 per channel.

        Free reinterpretation of the interleaved float32 stream ([I,Q] pairs
        are bit-identical to complex64) — the fast ingest path; keeps the
        stride-2 deinterleave off the device.
        """
        ref, srv = self.read_raw_frames(start, count)
        return ref.view(np.complex64), srv.view(np.complex64)

    def close(self):
        self._file.close()


class PrefetchReader:
    """Wraps a CaptureReader with a one-batch-ahead background thread."""

    def __init__(self, reader: CaptureReader, batches, mode: str = "raw"):
        self.reader = reader
        self.num_frames = reader.num_frames
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._batches = list(batches)
        self._read = (reader.read_iq_frames if mode == "iq"
                      else reader.read_raw_frames)
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        for start, count in self._batches:
            self._q.put((start, count, self._read(start, count)))
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item
