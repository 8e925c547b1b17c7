"""Streaming (real-time) processing mode.

Push raw CPI chunks as they arrive from an SDR; each push advances the full
chain — preprocess → clutter-cancel → halo-complete CAF → CFAR → multitarget
tracker — and returns the finished results for the *previous* frame (the 50%
CPI overlap makes one frame of latency inherent: frame f's CAF needs the head
of frame f+1, reference main.py:178-181).

All state that the reference keeps implicitly in its offline batch graph
(neighbour chunks for the overlap, the per-block mixing phase, tracker state)
is carried explicitly, so the processor runs indefinitely with O(1) memory.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.detect.trackers import init_tracks, multitarget_step
from passiveradar_tpu.ops.caf import fast_xambg, resolve_window
from passiveradar_tpu.ops.cfar import cfar_2d
from passiveradar_tpu.ops.util import to_host_complex
from passiveradar_tpu.pipeline import clutter_batch, frame_phases, preprocess_batch


# jitted assembly helpers: eager complex slicing/concatenation is unsupported
# on some remote backends, so every array manipulation lives inside jit
@functools.partial(jax.jit, static_argnames=("h",))
def _edges(ref_c, srv_c, h: int):
    n = ref_c.shape[1]
    # n - h (not -h) so h == 0 (overlap_cpi: false) yields empty halos
    # instead of the whole frame
    return (ref_c[0, n - h:], srv_c[0, n - h:], ref_c[0, :h], srv_c[0, :h])


@functools.partial(jax.jit, static_argnames=("cfg", "fw", "gw"))
def _assemble_caf_cfar(left_r, left_s, ref_c, srv_c, right_r, right_s,
                       window, cfg, fw: int, gw: int):
    ref_in = jnp.concatenate([left_r, ref_c[0], right_r])
    srv_in = jnp.concatenate([left_s, srv_c[0], right_s])
    caf = fast_xambg(ref_in, srv_in, cfg.num_range_cells,
                     cfg.num_doppler_cells, window=window,
                     short_filt=cfg.caf_short_filt)
    cf = cfar_2d(jnp.abs(caf), fw, gw)
    return caf, cf


@functools.partial(jax.jit, static_argnames=("h",))
def _zeros_halo(ref_c, h: int):
    z = jnp.zeros(h, ref_c.dtype)
    return z, z


@jax.jit
def _track_summary(tracks):
    """Pack the per-track scalars into ONE tiny (n_tracks, 6) float32 array.

    Columns: status, lifetime, estimate (range, doppler), last measurement
    (range, doppler). A single ~240 B device fetch replaces the full track
    table's many-leaf pytree fetch (the Kalman covariances etc. stay on
    device) — the cheap leg of the streaming light mode.
    """
    return jnp.stack([
        tracks["status"].astype(jnp.float32),
        tracks["lifetime"].astype(jnp.float32),
        tracks["estimate"][:, 0], tracks["estimate"][:, 1],
        tracks["measurement"][:, 0], tracks["measurement"][:, 1],
    ], axis=1)


def _fetch_summary(tracks) -> dict:
    a = np.asarray(_track_summary(tracks))
    return {
        "status": a[:, 0].astype(np.int32),
        "lifetime": a[:, 1].astype(np.int32),
        "estimate": a[:, 2:4],
        "measurement": a[:, 4:6],
    }


@dataclasses.dataclass
class StreamResult:
    frame_index: int
    caf: Optional[np.ndarray]    # (num_doppler, num_range+1) complex64;
    #                              None in detail="summary" mode
    cfar: Optional[np.ndarray]   # same orientation as caf; None in summary mode
    tracks: Optional[dict]       # full track-table snapshot; None in summary mode
    summary: Optional[dict] = None   # detail="summary": {status, lifetime,
    #                                  estimate, measurement} host arrays


class StreamingProcessor:
    """Real-time frame-at-a-time processor with carried tracker state.

    ``detail`` selects the per-push result weight: "full" (default) fetches
    the CAF + CFAR maps and the whole track table to host every CPI;
    "summary" skips the map/table fetch entirely and returns only a
    device-packed confirmed-track summary (~KB — see _track_summary), with
    the latest maps still available on demand via fetch_maps(). On slow
    host↔device links the fetch is a large share of the per-push latency
    (bench_stream.py), so summary mode is the realtime-budget lever.
    """

    def __init__(self, cfg: RadarConfig, n_tracks: int = 10,
                 cfar_kernel: tuple = (18, 4), detail: str = "full"):
        if detail not in ("full", "summary"):
            raise ValueError(f"unknown detail mode {detail!r}")
        self.cfg = cfg
        self.n_tracks = n_tracks
        self.cfar_kernel = cfar_kernel
        self.detail = detail
        self._last_maps = None
        self._tracks = init_tracks(n_tracks)
        self._extent = jnp.asarray(
            (cfg.max_doppler_actual, cfg.max_range_actual), jnp.float32)
        self._hist: list = []    # [(index, ref_if, srv_clean)] last 2 frames
        self._index = 0
        win = resolve_window(cfg.caf_window, cfg.caf_input_samples)
        self._window = None if win is None else jnp.asarray(win)

    def _clean(self, raw_ref: np.ndarray, raw_srv: np.ndarray):
        cfg = self.cfg
        phases = jnp.asarray(frame_phases(cfg, [self._index]))

        def ship(raw):
            if isinstance(raw, jax.Array) and not jnp.iscomplexobj(raw):
                # already device-resident float IQ: no host round-trip
                # (np.asarray here would fetch ~19 MB back over the link)
                return raw[None]
            raw = np.asarray(raw)
            if np.iscomplexobj(raw):
                # complex transfers are unsupported on some backends: ship
                # the bit-identical float32 pair view
                raw = raw.view(np.float32).reshape(-1, 2)[None]
            else:
                raw = raw[None]
            return jnp.asarray(raw)

        r = preprocess_batch(ship(raw_ref), phases, cfg)
        s = preprocess_batch(ship(raw_srv), phases, cfg)
        s = clutter_batch(r, s, cfg)
        return r, s

    def _finish(self, prev, cur, last: bool = False,
                detail: Optional[str] = None) -> StreamResult:
        cfg = self.cfg
        detail = self.detail if detail is None else detail
        idx, ref_c, srv_c = prev
        h = cfg.window_overlap
        if idx == 0:
            left_r, left_s = _zeros_halo(ref_c, h)
        else:
            left_r, left_s = self._left_tail
        if last:
            right_r, right_s = _zeros_halo(ref_c, h)
        else:
            _, _, right_r, right_s = _edges(cur[0], cur[1], h)
        caf, cf = _assemble_caf_cfar(left_r, left_s, ref_c, srv_c,
                                     right_r, right_s, self._window, cfg,
                                     *self.cfar_kernel)
        self._tracks = multitarget_step(self._tracks, cf, self._extent,
                                        self.n_tracks, cfg.candidate_budget)
        tail_r, tail_s, _, _ = _edges(ref_c, srv_c, h)
        self._left_tail = (tail_r, tail_s)
        self._last_maps = (caf, cf)
        if detail == "summary":
            return StreamResult(
                frame_index=idx, caf=None, cfar=None, tracks=None,
                summary=_fetch_summary(self._tracks),
            )
        return StreamResult(
            frame_index=idx,
            caf=to_host_complex(caf),
            cfar=np.asarray(cf),
            tracks=jax.tree.map(np.asarray, self._tracks),
        )

    def fetch_maps(self):
        """Fetch the most recently finished frame's (caf, cfar) maps to host.

        The on-demand companion to ``detail="summary"`` pushes; returns None
        before the first finished frame.
        """
        if self._last_maps is None:
            return None
        caf, cf = self._last_maps
        return to_host_complex(caf), np.asarray(cf)

    def push(self, raw_ref: np.ndarray, raw_srv: np.ndarray,
             detail: Optional[str] = None) -> Optional[StreamResult]:
        """Feed one frame's raw chunk per channel (interleaved float32 of
        length input_chunk_length, or complex64 of half that). Returns the
        completed result for the previous frame, or None for the first push.
        ``detail`` overrides the processor default for this push ("full" /
        "summary" — see the class docstring)."""
        if detail is not None and detail not in ("full", "summary"):
            raise ValueError(f"unknown detail mode {detail!r}")
        cleaned = self._clean(raw_ref, raw_srv)
        result = None
        if self._hist:
            result = self._finish(self._hist[-1], cleaned, detail=detail)
        self._hist = [(self._index, *cleaned)]
        self._index += 1
        return result

    def flush(self, detail: Optional[str] = None) -> Optional[StreamResult]:
        """Finish the final in-flight frame (zero right halo at stream end)."""
        if not self._hist:
            return None
        result = self._finish(self._hist[-1], None, last=True, detail=detail)
        self._hist = []
        return result
