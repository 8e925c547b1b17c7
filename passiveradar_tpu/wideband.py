"""Wideband / multi-illuminator processing (BASELINE config 4/5).

For wideband captures (DVB-T-class bands, or a band spanning several FM
stations) the capture is first split by the polyphase channelizer
(ops/channelizer.py); each channel then runs its own clutter-cancellation +
CAF chain, vmapped over the channel axis — the per-illuminator parallel axis.
On a pod, channels (or channel groups) map naturally onto mesh devices.

Surfaces:
  * ``process_wideband_frame`` — the core library op (explicit parameters).
  * ``wideband_frames`` / ``run_wideband_capture`` — the config-driven batch
    pipeline and host loop (activated by ``wideband_channels`` in the YAML;
    per-channel output stacks land in ``<output>.chK.<ftype>``).
  * ``WidebandStreamingProcessor`` — real-time push-per-CPI processing with
    per-channel CAF + CFAR + multitarget tracking (BASELINE config 5).

This is a capability extension over the reference (which processes one FM
channel per run); the per-channel chain itself is the standard pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.ops.caf import fast_xambg, resolve_window
from passiveradar_tpu.ops.channelizer import channelize_pair
from passiveradar_tpu.ops.clutter import ls_filter_multiple


@functools.partial(
    jax.jit, static_argnames=("n_channels", "range_bins", "freq_bins",
                              "filter_len", "sample_rate", "doppler_bins",
                              "window"))
def process_wideband_frame(ref: jnp.ndarray, srv: jnp.ndarray,
                           n_channels: int, range_bins: int, freq_bins: int,
                           filter_len: int, sample_rate: float,
                           doppler_bins: tuple = (0,),
                           window=None) -> jnp.ndarray:
    """One wideband CPI → per-channel range-Doppler maps (K, nf, R+1).

    ref/srv: (N,) wideband complex64 at ``sample_rate``. Each of the K
    critically-sampled channels is clutter-cancelled against its own
    reference channel and correlated into a CAF frame. The per-channel
    sample count N//K must be divisible by freq_bins.
    """
    refc, srvc = channelize_pair(ref, srv, n_channels)
    m = refc.shape[0]
    ch_rate = float(sample_rate) / n_channels
    usable = (m // freq_bins) * freq_bins
    refc = refc[:usable].T          # (K, M)
    srvc = srvc[:usable].T
    win = resolve_window(window, usable)
    win_j = None if win is None else jnp.asarray(win)

    def per_channel(r, s):
        clean = ls_filter_multiple(r, s, filter_len, ch_rate, doppler_bins)
        return fast_xambg(r, clean, range_bins, freq_bins, window=win_j)

    return jax.vmap(per_channel)(refc, srvc)


def integrate_channels(maps: jnp.ndarray) -> jnp.ndarray:
    """Noncoherent multi-illuminator integration: Σ_k |CAF_k| over channels.

    Valid when the channels share the bistatic geometry (same transmitter
    site); range cells are in per-channel sample units, identical across
    channels because all channels share one sample rate.
    """
    return jnp.sum(jnp.abs(maps), axis=0)


# --------------------------------------------------------------------------
# config-driven pipeline (BASELINE config 4)
# --------------------------------------------------------------------------

def channel_path(cfg: RadarConfig, k: int) -> str:
    """Output stack path for PFB channel k (plot/track tools read these)."""
    return f"{cfg.output_fname}.ch{k}.{cfg.range_doppler_map_ftype}"


def integrated_path(cfg: RadarConfig) -> str:
    """Output stack path for the noncoherently integrated multi-channel map
    (integrate_channels over the selected channels; same /xambg contract as
    a per-channel stack, so the plot/track tools read it unchanged)."""
    return f"{cfg.output_fname}.integrated.{cfg.range_doppler_map_ftype}"


def _to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """(…, 2) float32 IQ pairs → complex64 (complex input passes through)."""
    if jnp.iscomplexobj(x):
        return x
    return jax.lax.complex(x[..., 0], x[..., 1]).astype(jnp.complex64)


def _wideband_channel_chain(cfg: RadarConfig, win_j):
    """Per-channel clutter + CAF closure shared by all wideband paths."""
    def per_channel(rc, sc):
        clean = ls_filter_multiple(rc, sc, cfg.num_range_cells,
                                   cfg.IF_sample_rate,
                                   cfg.clutter_doppler_bins)
        return fast_xambg(rc, clean, cfg.num_range_cells,
                          cfg.num_doppler_cells, window=win_j,
                          short_filt=cfg.caf_short_filt)
    return per_channel


@functools.partial(jax.jit, static_argnames=("cfg",))
def wideband_frames(raw_ref: jnp.ndarray, raw_srv: jnp.ndarray,
                    cfg: RadarConfig) -> jnp.ndarray:
    """Wideband frame batch → per-channel range-Doppler maps.

    raw_*: (F, N) complex64 or (F, N, 2) float32 IQ pairs with
    N = wideband_channels · cpi_samples (one full CPI per frame — wideband
    CPIs are non-overlapping, config._derive_wideband). Returns
    (F, len(select), num_doppler_cells, num_range_cells+1) complex64.
    """
    win = resolve_window(cfg.caf_window, cfg.cpi_samples)
    win_j = None if win is None else jnp.asarray(win)
    select = jnp.asarray(np.asarray(cfg.wideband_channel_select, np.int32))
    per_channel = _wideband_channel_chain(cfg, win_j)

    def per_frame(r, s):
        refc, srvc = channelize_pair(r, s, cfg.wideband_channels,
                                     taps_per_branch=cfg.wideband_taps_per_branch)
        refc = refc.T[select]                # (S, cpi_samples)
        srvc = srvc.T[select]
        return jax.vmap(per_channel)(refc, srvc)

    return jax.vmap(per_frame)(_to_complex(raw_ref), _to_complex(raw_srv))


@functools.lru_cache(maxsize=8)
def _wideband_shmap_program(cfg: RadarConfig, mesh, axis_name: str):
    """Jitted shard_map wideband pipeline: channels → mesh axis.

    The per-illuminator ("expert") parallel axis of SURVEY §2.3. The
    channelizer is NOT replicated: an earlier design channelized the full
    (replicated) band on every device, which a bench_wideband ablation
    measured at ~25-44% of per-CPI time (docs/PERFORMANCE.md 2026-08-20) —
    n× redundant front-end work at n devices. Instead the input TIME axis
    is sharded: each device branch-filters + FFTs only its own time block
    (exact, because the per-branch FIR is causal: a (taps_per_branch − 1)-
    row halo from the left neighbour via ONE lax.ppermute reproduces the
    global filter bit-for-bit, with device 0's zero halo matching the
    global zero pad), then one tiled ``all_to_all`` transposes
    (time-block, all selected channels) → (full time, local channel block)
    over ICI, and each device runs its own channels' clutter+CAF chains.
    Per-CPI collective traffic: 2·(t−1)·K halo samples + 2·m·S transpose
    samples — the transpose equals one pass over the channelized data,
    far below the n× channelizer compute it replaces. Cached so repeated
    batch dispatches reuse one compiled program.
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    k = cfg.wideband_channels
    t = cfg.wideband_taps_per_branch
    select = np.asarray(cfg.wideband_channel_select, np.int32)
    s_total = len(select)
    if s_total % n:
        raise ValueError(
            f"wideband_frames_shmap: {s_total} selected channels do not "
            f"divide the {n}-device '{axis_name}' mesh axis")
    if cfg.cpi_samples % n:
        raise ValueError(
            f"wideband_frames_shmap: {cfg.cpi_samples} per-channel samples "
            f"do not divide the {n}-device '{axis_name}' mesh axis")
    mb = cfg.cpi_samples // n           # per-device channel-rate samples
    win = resolve_window(cfg.caf_window, cfg.cpi_samples)
    from passiveradar_tpu.ops.channelizer import design_prototype
    proto = design_prototype(k, t)
    hbf = proto.reshape(t, k).astype(np.float32)
    perm = [(i, i + 1) for i in range(n - 1)]   # no wrap: device 0 gets 0s

    def local(r, s):
        win_j = None if win is None else jnp.asarray(win)
        per_channel = _wideband_channel_chain(cfg, win_j)
        hb = jnp.asarray(hbf)
        sel = jnp.asarray(select)

        def chan_local(x):
            # x: (F, mb·k) complex — this device's contiguous time block
            f = x.shape[0]
            xb = x.reshape(f, mb, k)
            # causal-FIR halo: the left neighbour's last t-1 polyphase rows
            halo = jax.lax.ppermute(xb[:, mb - (t - 1):, :], axis_name, perm)
            ext = jnp.concatenate([halo, xb], axis=1)   # (F, mb+t-1, k)
            yb = xb * hb[0]
            for i in range(1, t):
                yb = yb + ext[:, t - 1 - i:mb + t - 1 - i, :] * hb[i]
            ych = jnp.fft.fft(yb, axis=2).astype(jnp.complex64)
            ysel = ych[:, :, sel]                       # (F, mb, S)
            # transpose (time-block, all channels) -> (all time, local
            # channels): device d ends with channels select[d·s_local:...]
            full = jax.lax.all_to_all(ysel, axis_name, split_axis=2,
                                      concat_axis=1, tiled=True)
            return jnp.swapaxes(full, 1, 2)             # (F, s_local, m)

        refc = chan_local(_to_complex(r))
        srvc = chan_local(_to_complex(s))
        return jax.vmap(jax.vmap(per_channel))(refc, srvc)

    pair_spec = P(None, axis_name)      # (F, N) complex input
    in_specs = lambda a: (P(None, axis_name, None)
                          if a == 3 else pair_spec)

    def run(raw_ref, raw_srv):
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(in_specs(raw_ref.ndim), in_specs(raw_srv.ndim)),
            out_specs=P(None, axis_name), check_vma=False)
        return fn(raw_ref, raw_srv)

    return jax.jit(run)


def wideband_frames_shmap(raw_ref: jnp.ndarray, raw_srv: jnp.ndarray,
                          cfg: RadarConfig, mesh,
                          axis_name: str = "channels") -> jnp.ndarray:
    """wideband_frames with the selected-channel axis sharded over ``mesh``.

    Equality with the single-device vmap path is tested on a CPU mesh
    (tests/test_wideband.py) and compile-validated by dryrun_multichip.
    The number of selected channels must divide the mesh axis.
    """
    return _wideband_shmap_program(cfg, mesh, axis_name)(raw_ref, raw_srv)


@jax.jit
def _integrate_batch(maps: jnp.ndarray) -> jnp.ndarray:
    """(F, S, nf, R+1) per-channel maps → (F, nf, R+1) noncoherent sum
    Σ_k |CAF_k| (integrate_channels over the batch's channel axis),
    computed device-side before the host fetch."""
    return jnp.sum(jnp.abs(maps), axis=1)


def run_wideband_capture(reader, cfg: RadarConfig,
                         batch_frames: int | None = None,
                         writers: dict | None = None,
                         progress: bool = True, mesh=None,
                         axis_name: str = "channels",
                         integrate: bool = False) -> int:
    """Host loop: stream a wideband capture into per-channel map stacks.

    ``writers``: {channel_index: MapWriter-like} (default: one MapWriter per
    selected channel at channel_path(cfg, k)). Every dispatch uses one fixed
    shape (zero-padded final batch) so exactly one XLA program compiles.
    ``mesh``: optional 1-D device mesh — the selected-channel axis shards
    over it via wideband_frames_shmap (the per-illuminator parallel axis).
    ``integrate``: additionally write the noncoherently integrated
    multi-illuminator stack (integrate_channels, computed on device) to
    integrated_path(cfg) — same /xambg file contract, readable by the
    standard plot/track tools.
    """
    from passiveradar_tpu.io.hdf5 import PrefetchReader
    from passiveradar_tpu.io.writers import MapWriter
    from passiveradar_tpu.ops.util import to_host_complex

    total = min(reader.num_frames, cfg.num_frames)
    bf = batch_frames or cfg.frame_batch
    select = cfg.wideband_channel_select
    own_writers = writers is None
    if own_writers:
        writers = {k: MapWriter(cfg, total, channel_path(cfg, k))
                   for k in select}
    int_writer = MapWriter(cfg, total, integrated_path(cfg)) \
        if integrate else None

    batches = [(s, min(bf, total - s)) for s in range(0, total, bf)]
    prefetch = PrefetchReader(reader, batches, mode="iq")
    lc = cfg.input_chunk_length // 2
    if mesh is not None:
        # place inputs with the shmap program's parameter sharding up
        # front — feeding differently-committed arrays makes jax reshard
        # (copy) every operand on every dispatch (measured +99 ms/batch4
        # on v5e before this, docs/PERFORMANCE.md round-5 note)
        from jax.sharding import NamedSharding, PartitionSpec
        in_sh = NamedSharding(mesh, PartitionSpec(None, axis_name, None))
        ship = functools.partial(jax.device_put, device=in_sh)
    else:
        ship = jnp.asarray
    done = 0
    for (start, count), (_, _, (ref_raw, srv_raw)) in zip(batches, prefetch):
        buf_ref = np.zeros((bf, lc, 2), np.float32)
        buf_srv = np.zeros((bf, lc, 2), np.float32)
        buf_ref[:count] = ref_raw.view(np.float32).reshape(count, lc, 2)
        buf_srv[:count] = srv_raw.view(np.float32).reshape(count, lc, 2)
        if mesh is not None:
            maps_dev = wideband_frames_shmap(ship(buf_ref),
                                             ship(buf_srv), cfg,
                                             mesh, axis_name)
        else:
            maps_dev = wideband_frames(ship(buf_ref),
                                       ship(buf_srv), cfg)
        maps = to_host_complex(maps_dev)[:count]     # (count, S, nf, R+1)
        for i, k in enumerate(select):
            writers[k].write(maps[:, i], start)
        if int_writer is not None:
            integ = np.asarray(_integrate_batch(maps_dev))[:count]
            int_writer.write(integ.astype(np.complex64), start)
        done += count
        if progress:
            print(f"\r  processed {done}/{total} wideband CPIs", end="",
                  flush=True)
    if progress:
        print()
    if own_writers:
        for w in writers.values():
            w.close()
    if int_writer is not None:
        int_writer.close()
    return total


# --------------------------------------------------------------------------
# streaming multi-illuminator mode (BASELINE config 5)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "fw", "gw"))
def _wideband_step(raw_ref, raw_srv, cfg: RadarConfig, fw: int, gw: int):
    """One wideband CPI → per-channel (caf, cfar) stacks."""
    from passiveradar_tpu.ops.cfar import cfar_2d
    maps = wideband_frames(raw_ref[None], raw_srv[None], cfg)[0]
    cf = jax.vmap(lambda m: cfar_2d(jnp.abs(m), fw, gw))(maps)
    return maps, cf


class WidebandStreamingProcessor:
    """Real-time wideband processor: one push per wideband CPI.

    Each push channelizes the CPI, runs per-channel clutter + CAF + CFAR in
    one compiled step, then advances an independent multitarget tracker per
    selected channel (each illuminator has its own bistatic geometry).
    Unlike the narrowband StreamingProcessor there is no one-frame latency:
    wideband CPIs are non-overlapping, so results return immediately.
    """

    def __init__(self, cfg: RadarConfig, n_tracks: int = 10,
                 cfar_kernel: tuple = (18, 4), detail: str = "full"):
        from passiveradar_tpu.detect.trackers import init_tracks
        if cfg.wideband_channels < 2:
            raise ValueError("cfg.wideband_channels must be >= 2; "
                             "set it in the YAML to enable wideband mode")
        if detail not in ("full", "summary"):
            raise ValueError(f"unknown detail mode {detail!r}")
        self.cfg = cfg
        self.n_tracks = n_tracks
        self.cfar_kernel = cfar_kernel
        self.detail = detail
        self._last_maps = None
        self._tracks = {k: init_tracks(n_tracks)
                        for k in cfg.wideband_channel_select}
        self._extent = jnp.asarray(
            (cfg.max_doppler_actual, cfg.max_range_actual), jnp.float32)
        self._index = 0

    def push(self, raw_ref: np.ndarray, raw_srv: np.ndarray,
             detail: str | None = None) -> dict:
        """Feed one wideband CPI per channel pair (complex64 of
        wideband_channels·cpi_samples, or the float32 IQ-pair view).
        Returns {channel_index: StreamResult} for this CPI. In
        ``detail="summary"`` mode (per-push override of the constructor
        default) the per-channel map/track fetch is skipped — each
        StreamResult carries only the tiny track summary; the CPI's maps
        stay on device, fetchable via fetch_maps()."""
        from passiveradar_tpu.detect.trackers import multitarget_step
        from passiveradar_tpu.ops.util import to_host_complex
        from passiveradar_tpu.streaming import StreamResult, _fetch_summary
        cfg = self.cfg
        detail = self.detail if detail is None else detail
        if detail not in ("full", "summary"):
            raise ValueError(f"unknown detail mode {detail!r}")

        def ship(raw):
            if isinstance(raw, jax.Array) and not jnp.iscomplexobj(raw):
                return raw          # device-resident IQ: no host round-trip
            raw = np.asarray(raw)
            if np.iscomplexobj(raw):
                raw = raw.view(np.float32).reshape(-1, 2)
            return jnp.asarray(raw)

        maps, cf = _wideband_step(ship(raw_ref), ship(raw_srv), cfg,
                                  *self.cfar_kernel)
        self._last_maps = (maps, cf)
        results = {}
        for i, k in enumerate(cfg.wideband_channel_select):
            self._tracks[k] = multitarget_step(
                self._tracks[k], cf[i], self._extent, self.n_tracks,
                cfg.candidate_budget)
            if detail == "summary":
                results[k] = StreamResult(
                    frame_index=self._index, caf=None, cfar=None,
                    tracks=None, summary=_fetch_summary(self._tracks[k]),
                )
            else:
                results[k] = StreamResult(
                    frame_index=self._index,
                    caf=to_host_complex(maps[i]),
                    cfar=np.asarray(cf[i]),
                    tracks=jax.tree.map(np.asarray, self._tracks[k]),
                )
        self._index += 1
        return results

    def fetch_maps(self) -> dict | None:
        """Fetch the latest CPI's per-channel (caf, cfar) maps to host —
        the on-demand companion to detail="summary" pushes. Returns
        {channel_index: (caf, cfar)}, or None before the first push."""
        from passiveradar_tpu.ops.util import to_host_complex
        if self._last_maps is None:
            return None
        maps, cf = self._last_maps
        return {k: (to_host_complex(maps[i]), np.asarray(cf[i]))
                for i, k in enumerate(self.cfg.wideband_channel_select)}
