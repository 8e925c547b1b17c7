"""Chunked, prefetching HDF5 capture reader.

Feeds the device pipeline per-frame complex chunks. The read pattern mirrors
the reference's ingest (main.py:44-120): estimate the inter-channel offset
from the head of the capture, trim both channels to alignment, then serve
fixed-length frame chunks. A background prefetch thread keeps the next batch
in flight while the device computes — the host I/O path is as
performance-critical as the kernels for the <30 s target.

Both reference capture layouts are supported (PRconfig.yaml:6-18):
  * separate per-channel datasets of interleaved IQ floats, reinterpreted as
    complex64 with a free numpy view;
  * a single interleaved dataset [refI, refQ, srvI, srvQ, ...], de-multiplexed
    by the native C++ kernel (native/pr_io.cc) with a numpy fallback.
int16 captures are converted by the native kernel as well.

Multi-host: ``shard(process_index, process_count)`` restricts a reader to a
contiguous frame range so each host feeds only its own mesh slice.
"""

from __future__ import annotations

import queue
import threading

import h5py
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.io.native import demux2, i16_to_f32
from passiveradar_tpu.ops.xcorr import find_channel_offset


class CaptureReader:
    def __init__(self, cfg: RadarConfig, path: str | None = None,
                 estimate_offset: bool = True, max_offset_lags: int = 5_000_000,
                 int16_scale: float | None = None):
        self.cfg = cfg
        self.path = path or cfg.input_file
        self.int16_scale = (getattr(cfg, "int16_scale", 1.0)
                            if int16_scale is None else int16_scale)
        self._file = h5py.File(self.path, "r")
        self.interleaved = bool(cfg.interleaved_input_channels)
        if self.interleaved:
            self._data = self._file[cfg.interleaved_data_path]
        else:
            self._ref = self._file[cfg.input_ref_path]
            self._srv = self._file[cfg.input_srv_path]
        # separate-channel int16 captures ship raw int16 to the device and
        # convert there (pipeline.preprocess_batch): half the H2D bytes.
        # The device conversion multiplies by cfg.int16_scale, so raw
        # shipping is only valid when this reader's scale agrees with it —
        # an explicitly different constructor scale falls back to host
        # conversion (float32 dispatch) to keep all read paths consistent.
        self._ships_int16 = (not self.interleaved
                             and self._ref.dtype == np.int16
                             and self.int16_scale == getattr(
                                 cfg, "int16_scale", 1.0))
        self.offset = 0
        if estimate_offset:
            self.offset = self._estimate_offset(max_offset_lags)
        self._apply_offset()

    def _to_f32(self, raw: np.ndarray) -> np.ndarray:
        if raw.dtype == np.int16:
            return i16_to_f32(raw, self.int16_scale)
        return np.asarray(raw, np.float32)

    # -- channel alignment --------------------------------------------------
    def _estimate_offset(self, max_lags: int) -> int:
        """Reference main.py:50-54 / 79-83: offset from the capture head.

        Host-side numpy views only (eager complex ops are unsupported on some
        remote backends); the correlation itself runs jitted on device.
        """
        if self.interleaved:
            head = min(20 * self.cfg.cpi_samples, len(self._data))
            refc, srvc = demux2(self._to_f32(np.asarray(self._data[:head])),
                                self.int16_scale)
        else:
            head = min(10 * self.cfg.cpi_samples, len(self._ref),
                       len(self._srv)) // 2 * 2
            refc = self._to_f32(np.asarray(self._ref[:head])).view(np.complex64)
            srvc = self._to_f32(np.asarray(self._srv[:head])).view(np.complex64)
        nl = min(max_lags, refc.shape[0] - 1)
        return int(find_channel_offset(refc, srvc, 1, nl))

    def _apply_offset(self):
        # offset is in complex channel samples
        off = self.offset
        # per-channel start offsets in complex samples
        if off > 0:
            self._ref_off, self._srv_off = off, 0
        else:
            self._ref_off, self._srv_off = 0, -off
        # frame length in complex samples per channel
        self.frame_len_c = self.cfg.input_chunk_length // 2
        # raw frame length (per channel) for the float view path
        self.frame_len = self.cfg.input_chunk_length
        if self.interleaved:
            n_pairs = len(self._data) // 4
            usable = n_pairs - abs(off)
        else:
            usable = min(len(self._ref), len(self._srv)) // 2 - abs(off)
        self.num_frames = usable // self.frame_len_c
        self._first_frame = 0

    def shard(self, process_index: int, process_count: int) -> "CaptureReader":
        """Restrict to this host's contiguous frame range (multi-host ingest).

        The last host takes the remainder frames. Interior shard edges allow
        one frame of margin reads into the neighbouring host's range
        (frame_margin_before/after), so CPI-overlap halos stay exact at host
        boundaries; frame_offset records the global index of local frame 0
        (the mixing phases depend on the global frame number).
        """
        per = self.num_frames // process_count
        self._first_frame = process_index * per
        if process_index == process_count - 1:
            self.num_frames = self.num_frames - per * (process_count - 1)
        else:
            self.num_frames = per
        self.frame_offset = self._first_frame
        self.frame_margin_before = process_index > 0
        self.frame_margin_after = process_index < process_count - 1
        return self

    # -- raw frame access ---------------------------------------------------
    def read_raw_frames(self, start: int, count: int):
        """(count, input_chunk_length) float32 interleaved IQ per channel."""
        if self.interleaved:
            ref, srv = self.read_iq_frames(start, count)
            return (ref.view(np.float32).reshape(count, self.frame_len),
                    srv.view(np.float32).reshape(count, self.frame_len))
        s_c = (self._first_frame + start) * self.frame_len_c
        e_c = s_c + count * self.frame_len_c
        ref = self._to_f32(np.asarray(
            self._ref[2 * (s_c + self._ref_off):2 * (e_c + self._ref_off)]))
        srv = self._to_f32(np.asarray(
            self._srv[2 * (s_c + self._srv_off):2 * (e_c + self._srv_off)]))
        return (ref.reshape(count, self.frame_len),
                srv.reshape(count, self.frame_len))

    @property
    def pair_dtype(self):
        """dtype of read_pair_frames: int16 when the capture ships raw."""
        return np.int16 if self._ships_int16 else np.float32

    def read_pair_frames(self, start: int, count: int):
        """(count, frame_len_c, 2) IQ pairs in ``pair_dtype``.

        The device-dispatch format: float32 pairs normally; raw int16 pairs
        for separate-channel int16 captures (converted on device by
        pipeline.preprocess_batch — bit-identical to the host i16_to_f32
        path). Interleaved int16 captures keep the host demux path.
        """
        if not self._ships_int16:
            ref, srv = self.read_raw_frames(start, count)
            return (ref.reshape(count, self.frame_len_c, 2),
                    srv.reshape(count, self.frame_len_c, 2))
        s_c = (self._first_frame + start) * self.frame_len_c
        e_c = s_c + count * self.frame_len_c
        ref = np.asarray(
            self._ref[2 * (s_c + self._ref_off):2 * (e_c + self._ref_off)])
        srv = np.asarray(
            self._srv[2 * (s_c + self._srv_off):2 * (e_c + self._srv_off)])
        return (ref.reshape(count, self.frame_len_c, 2),
                srv.reshape(count, self.frame_len_c, 2))

    def read_iq_frames(self, start: int, count: int):
        """(count, input_chunk_length//2) complex64 per channel.

        Separate-channel captures: free reinterpretation of the interleaved
        float32 stream ([I,Q] pairs are bit-identical to complex64).
        Interleaved captures: native de-multiplex of the 4-way stream.
        """
        if not self.interleaved:
            ref, srv = self.read_raw_frames(start, count)
            return ref.view(np.complex64), srv.view(np.complex64)
        s_c = (self._first_frame + start) * self.frame_len_c
        e_c = s_c + count * self.frame_len_c
        lo = s_c + min(self._ref_off, self._srv_off)
        hi = e_c + max(self._ref_off, self._srv_off)
        raw = np.asarray(self._data[4 * lo:4 * hi])
        ref, srv = demux2(raw if raw.dtype == np.int16
                          else np.asarray(raw, np.float32), self.int16_scale)
        r0 = s_c + self._ref_off - lo
        s0 = s_c + self._srv_off - lo
        n = count * self.frame_len_c
        return (ref[r0:r0 + n].reshape(count, self.frame_len_c),
                srv[s0:s0 + n].reshape(count, self.frame_len_c))

    def close(self):
        self._file.close()


class PrefetchReader:
    """Wraps a CaptureReader with a one-batch-ahead background thread."""

    def __init__(self, reader: CaptureReader, batches, mode: str = "raw"):
        self.reader = reader
        self.num_frames = reader.num_frames
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._batches = list(batches)
        self._read = getattr(reader, {"iq": "read_iq_frames",
                                      "pair": "read_pair_frames",
                                      "raw": "read_raw_frames"}[mode])
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            for start, count in self._batches:
                self._q.put((start, count, self._read(start, count)))
            self._q.put(None)
        except BaseException as e:  # propagate to the consumer, never hang it
            self._q.put(e)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
