"""Polyphase channelizer and wideband multi-illuminator pipeline."""

import h5py
import numpy as np
import pytest

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.ops.channelizer import channelize, channelize_pair
from passiveradar_tpu.wideband import (
    WidebandStreamingProcessor,
    channel_path,
    integrate_channels,
    process_wideband_frame,
    run_wideband_capture,
    wideband_frames,
)

WB = dict(
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="hdf5",
    num_frames=3,
    input_sample_rate=65536,
    input_center_freq=0,
    channel_freq=0,
    channel_bandwidth=65536,
    cpi_seconds_nominal=0.25,
    max_doppler_nominal=128.0,
    max_range_nominal=150.0,
    wideband_channels=4,
    wideband_channel_select=(1, 2),
    frame_batch=2,
)


def _wb_cfg(tmp_path, **over):
    params = dict(WB, input_file=str(tmp_path / "wb.hdf5"),
                  output_fname=str(tmp_path / "WB"), **over)
    return params, derive_config(params)


def _wb_signals(cfg, n_frames, rng, delay=8, dop=6.0):
    """Wideband ref/srv with one station per selected channel and a common
    target echo (delay wideband samples, +dop Hz)."""
    k = cfg.wideband_channels
    fs = float(cfg.input_sample_rate)
    n = cfg.cpi_samples * k * n_frames
    t = np.arange(n) / fs
    ref = np.zeros(n, np.complex64)
    for ch in cfg.wideband_channel_select:
        s = np.convolve(rng.standard_normal(n) + 1j * rng.standard_normal(n),
                        np.ones(8) / 8, "same")
        ref += (s * np.exp(1j * 2 * np.pi * (ch * fs / k) * t)).astype(
            np.complex64)
    echo = np.roll(ref, delay) * np.exp(1j * 2 * np.pi * dop * t)
    srv = (0.7 * ref + 0.1 * echo
           + 1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
           ).astype(np.complex64)
    return ref.astype(np.complex64), srv


def test_wideband_config_derivation(tmp_path):
    _, cfg = _wb_cfg(tmp_path)
    assert cfg.IF_sample_rate == 16384.0
    assert cfg.cpi_samples == 4096            # nextpow2(16384 * 0.25)
    assert cfg.input_chunk_length == 2 * 4 * 4096
    assert cfg.output_chunk_length == 4096
    assert cfg.window_overlap == 0            # wideband CPIs don't overlap
    assert cfg.num_doppler_cells == 64
    assert cfg.num_range_cells == 8
    assert cfg.wideband_channel_select == (1, 2)
    assert (cfg.resamp_up, cfg.resamp_dn) == (1, 1)
    # select defaults to all channels; out-of-range selections are rejected
    _, cfg_all = _wb_cfg(tmp_path, wideband_channel_select=())
    assert cfg_all.wideband_channel_select == (0, 1, 2, 3)
    with pytest.raises(ValueError):
        _wb_cfg(tmp_path, wideband_channel_select=(5,))


def test_wideband_capture_end_to_end(tmp_path, rng):
    params, cfg = _wb_cfg(tmp_path)
    delay, dop = 8, 6.0
    ref, srv = _wb_signals(cfg, 3, rng, delay, dop)
    with h5py.File(params["input_file"], "w") as f:
        f.create_dataset("/data/ref", data=ref.view(np.float32))
        f.create_dataset("/data/srv", data=srv.view(np.float32))

    from passiveradar_tpu.cli.wideband import main as wb_main
    import yaml
    cfg_path = str(tmp_path / "wb.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(params, f)
    wb_main(["--config", cfg_path, "--integrate"])

    nf, r = cfg.num_doppler_cells, cfg.num_range_cells
    k = cfg.wideband_channels
    stacks = {}
    for ch in (1, 2):
        with h5py.File(channel_path(cfg, ch)) as f:
            stack = np.asarray(f["/xambg"])
        stacks[ch] = stack
        assert stack.shape == (nf, r + 1, 3)
        for fr in range(3):
            m = np.abs(stack[:, :, fr])
            fbin, rbin = np.unravel_index(np.argmax(m), m.shape)
            assert rbin == r - delay // k, (ch, fr, rbin)
            assert abs(fbin - (nf // 2 - round(dop / cfg.doppler_cell_width))
                       ) <= 1, (ch, fr, fbin)
    # --integrate: the noncoherent sum over the selected channels, same
    # /xambg contract (integrate_channels math, wideband.py:_integrate_batch)
    from passiveradar_tpu.wideband import integrated_path
    with h5py.File(integrated_path(cfg)) as f:
        integ = np.asarray(f["/xambg"])
    assert integ.shape == (nf, r + 1, 3)
    want = np.abs(stacks[1]) + np.abs(stacks[2])
    np.testing.assert_allclose(np.real(integ), want, rtol=1e-5,
                               atol=1e-5 * np.max(want))
    assert np.max(np.abs(np.imag(integ))) == 0.0
    meta = np.load(cfg.meta_fname)
    assert meta["frame_timestamps"].shape == (3,)
    assert meta["range_bins"].shape == (r + 1,)

    # the integrated stack renders through the standard plot CLI via --input
    import os
    os.makedirs(tmp_path / "render", exist_ok=True)
    cwd = os.getcwd()
    os.chdir(tmp_path / "render")
    try:
        from passiveradar_tpu.cli.plot import main as plot_main
        plot_main(["--config", cfg_path, "--mode", "frames",
                   "--input", integrated_path(cfg)])
        pngs = [f for f in os.listdir("IMG") if f.endswith(".png")]
        assert len(pngs) == 3
    finally:
        os.chdir(cwd)


def test_wideband_streaming_matches_offline(tmp_path, rng):
    params, cfg = _wb_cfg(tmp_path)
    ref, srv = _wb_signals(cfg, 3, rng)
    n = cfg.cpi_samples * cfg.wideband_channels
    offline = np.asarray(wideband_frames(
        ref.reshape(3, n), srv.reshape(3, n), cfg))

    sp = WidebandStreamingProcessor(cfg, n_tracks=4)
    for fr in range(3):
        results = sp.push(ref[fr * n:(fr + 1) * n], srv[fr * n:(fr + 1) * n])
        assert set(results) == {1, 2}
        for i, ch in enumerate((1, 2)):
            res = results[ch]
            assert res.frame_index == fr
            assert np.max(np.abs(res.caf - offline[fr, i])) \
                <= 1e-4 * np.max(np.abs(offline[fr, i]))
            assert res.cfar.shape == res.caf.shape
            assert res.tracks["status"].shape == (4,)


def test_wideband_streaming_summary_mode(tmp_path, rng):
    """detail="summary" pushes skip the per-channel map fetch and return the
    packed track summary; fetch_maps() returns the same maps a full push
    would have."""
    params, cfg = _wb_cfg(tmp_path)
    ref, srv = _wb_signals(cfg, 2, rng)
    n = cfg.cpi_samples * cfg.wideband_channels

    full = WidebandStreamingProcessor(cfg, n_tracks=4)
    light = WidebandStreamingProcessor(cfg, n_tracks=4, detail="summary")
    for fr in range(2):
        chunk = (ref[fr * n:(fr + 1) * n], srv[fr * n:(fr + 1) * n])
        want = full.push(*chunk)
        got = light.push(*chunk)
        assert set(got) == set(want)
        maps = light.fetch_maps()
        for ch in want:
            assert got[ch].caf is None and got[ch].tracks is None
            np.testing.assert_array_equal(got[ch].summary["status"],
                                          want[ch].tracks["status"])
            np.testing.assert_allclose(got[ch].summary["estimate"],
                                       want[ch].tracks["estimate"],
                                       rtol=1e-6)
            caf, cf = maps[ch]
            np.testing.assert_allclose(
                np.abs(caf), np.abs(want[ch].caf), rtol=1e-5,
                atol=1e-6 * np.max(np.abs(want[ch].caf)))


def test_wideband_shmap_matches_vmap(tmp_path, rng):
    """Channel-axis shard_map path (SURVEY §2.3's per-illuminator/'expert'
    mesh axis) must equal the single-device vmap path, via both
    wideband_frames_shmap directly and run_wideband_capture(mesh=...)."""
    import jax
    from jax.sharding import Mesh

    from passiveradar_tpu.wideband import wideband_frames_shmap

    params, cfg = _wb_cfg(tmp_path)
    ref, srv = _wb_signals(cfg, 2, rng)
    n = cfg.cpi_samples * cfg.wideband_channels
    r2 = ref.reshape(2, n)
    s2 = srv.reshape(2, n)
    want = np.asarray(wideband_frames(r2, s2, cfg))
    scale = np.max(np.abs(want))

    # 2 selected channels over a 2-device mesh
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("channels",))
    got = np.asarray(wideband_frames_shmap(r2, s2, cfg, mesh))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-4 * scale

    # channel count must divide the mesh axis
    mesh3 = Mesh(np.asarray(jax.devices()[:3]), ("channels",))
    with pytest.raises(ValueError):
        wideband_frames_shmap(r2, s2, cfg, mesh3)

    # the host loop takes the same path end-to-end
    with h5py.File(params["input_file"], "w") as f:
        f.create_dataset("/data/ref", data=ref.view(np.float32))
        f.create_dataset("/data/srv", data=srv.view(np.float32))
    from passiveradar_tpu.io.hdf5 import CaptureReader
    reader = CaptureReader(cfg, estimate_offset=False)
    run_wideband_capture(reader, cfg, progress=False, mesh=mesh)
    reader.close()
    for i, ch in enumerate((1, 2)):
        with h5py.File(channel_path(cfg, ch)) as f:
            stack = np.asarray(f["/xambg"])       # (nf, r+1, frames)
        got_ch = np.transpose(stack, (2, 0, 1))
        assert np.max(np.abs(got_ch - want[:, i])) < 1e-4 * scale


def _cnoise(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


def test_tone_lands_in_its_channel(rng):
    k, n = 8, 8192
    fs = 8192.0
    # tone inside channel 3 at +5 Hz from the channel centre
    f0 = 3 * fs / k + 5.0
    t = np.arange(n) / fs
    x = np.exp(1j * 2 * np.pi * f0 * t).astype(np.complex64)
    ch = np.asarray(channelize(x, k))
    power = np.mean(np.abs(ch) ** 2, axis=0)
    assert np.argmax(power) == 3
    # adjacent-channel rejection > 30 dB
    assert power[3] > 1000 * np.sort(power)[-2]
    # inside the channel, the tone sits at +5 Hz of the decimated rate
    spec = np.abs(np.fft.fft(ch[64:, 3]))
    m = ch[64:, 3].shape[0]
    f_in_ch = np.argmax(spec) / m * (fs / k)
    assert abs(f_in_ch - 5.0) < 2 * (fs / k) / m


def test_channelizer_preserves_cross_channel_correlation(rng):
    """ref/srv banks are phase-matched: a delay in the wideband domain stays
    a (fractional) delay with coherent phase in every channel."""
    k, n = 4, 4096
    base = _cnoise(rng, n)
    base = np.convolve(base, np.ones(4) / 4, "same").astype(np.complex64)
    srv = np.roll(base, 8)  # 8 wideband samples = 2 channel samples
    rc, sc = channelize_pair(base, srv, k)
    rc, sc = np.asarray(rc), np.asarray(sc)
    for ch in range(k):
        r, s = rc[32:, ch], sc[32:, ch]
        lags = [np.abs(np.vdot(r[:-4], s[d:d + len(r) - 4])) for d in range(4)]
        assert np.argmax(lags) == 2


def test_wideband_pipeline_finds_target_per_channel(rng):
    k = 4
    n = 4096 * k          # per-channel 4096 samples
    fs = float(n)         # 1 s CPI → per-channel rate n/k
    t = np.arange(n) / fs
    # two "stations", one per channel 1 and 2
    s1 = np.convolve(_cnoise(rng, n), np.ones(8) / 8, "same")
    s2 = np.convolve(_cnoise(rng, n), np.ones(8) / 8, "same")
    c1 = s1 * np.exp(1j * 2 * np.pi * (1 * fs / k) * t)
    c2 = s2 * np.exp(1j * 2 * np.pi * (2 * fs / k) * t)
    ref = (c1 + c2).astype(np.complex64)
    # echo: delay 8 wideband samples (= 2 channel samples), +6 Hz Doppler
    delay, dop = 8, 6.0
    echo = np.roll(ref, delay) * np.exp(1j * 2 * np.pi * dop * t)
    srv = (0.7 * ref + 0.1 * echo + 1e-3 * _cnoise(rng, n)).astype(np.complex64)

    nf, r_bins = 64, 8
    maps = np.asarray(process_wideband_frame(
        ref, srv, k, r_bins, nf, filter_len=6, sample_rate=fs,
        doppler_bins=(0,), window=("kaiser", 5.0)))
    assert maps.shape == (k, nf, r_bins + 1)
    for ch in (1, 2):
        m = np.abs(maps[ch])
        fbin, rbin = np.unravel_index(np.argmax(m), m.shape)
        assert rbin == r_bins - delay // k
        assert abs(fbin - (nf // 2 - dop)) <= 1

    integ = np.asarray(integrate_channels(maps))
    fbin, rbin = np.unravel_index(np.argmax(integ), integ.shape)
    assert rbin == r_bins - delay // k


def test_wideband_shmap_collective_budget(tmp_path):
    """HLO-level contract for the time-sharded channelizer (the expert-axis
    scaling argument in docs/SCALING.md): exactly 2 collective-permutes
    (one causal-FIR halo per radar channel) and 2 all-to-alls (one
    channelized-data transpose per radar channel) — nothing else crosses
    devices."""
    import re

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from passiveradar_tpu.wideband import _wideband_shmap_program

    _, cfg = _wb_cfg(tmp_path)
    n = cfg.cpi_samples * cfg.wideband_channels
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("channels",))
    fn = _wideband_shmap_program(cfg, mesh, "channels")
    r = jnp.zeros((2, n), jnp.complex64)
    hlo = fn.lower(r, r).compile().as_text()

    def count(op):
        starts = len(re.findall(rf"= \(?\w+\[[\d,]*\][^=]*? {op}-start\(",
                                hlo))
        if starts:
            return starts
        return len(re.findall(rf"= \(?\w+\[[\d,]*\][^=]*? {op}\(", hlo))

    assert count("collective-permute") == 2, hlo.count("collective-permute")
    assert count("all-to-all") == 2, hlo.count("all-to-all")
