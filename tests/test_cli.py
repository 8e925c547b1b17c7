"""CLI surface smoke tests over a tiny synthetic capture (CPU backend)."""

import os

import numpy as np
import pytest
import yaml

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.synthetic import Target, write_synth_capture

TINY = dict(
    interleaved_input_channels=False,
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="hdf5",
    num_frames=6,
    input_sample_rate=49152,
    input_center_freq=1_000_000,
    channel_freq=990_170,
    channel_bandwidth=12800,
    cpi_seconds_nominal=1.0,
    max_doppler_nominal=128.0,
    max_range_nominal=400.0,
    overlap_cpi=True,
    frame_batch=4,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli")
    params = dict(TINY)
    params["input_file"] = str(ws / "cap.hdf5")
    params["output_fname"] = str(ws / "XAMBG")
    cfg = derive_config(params)
    write_synth_capture(params["input_file"], cfg, 6,
                        targets=(Target(40, 20.0, 0.12),))
    cfg_path = ws / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(params, f)
    return ws, str(cfg_path), cfg


def test_process_cli(workspace):
    ws, cfg_path, cfg = workspace
    from passiveradar_tpu.cli.process import main
    main(["--config", cfg_path])
    assert os.path.exists(cfg.range_doppler_map_fname)
    assert os.path.exists(cfg.meta_fname)


def test_plot_cli_frames(workspace, monkeypatch):
    ws, cfg_path, cfg = workspace
    monkeypatch.chdir(ws)
    from passiveradar_tpu.cli.plot import main
    main(["--config", cfg_path, "--mode", "frames"])
    pngs = [f for f in os.listdir(ws / "IMG") if f.endswith(".png")]
    assert len(pngs) == 6


def test_track_multi_cli_plot(workspace, monkeypatch):
    ws, cfg_path, cfg = workspace
    monkeypatch.chdir(ws)
    from passiveradar_tpu.cli.track_multi import main
    main(["--config", cfg_path, "--mode", "plot"])
    assert os.path.exists(ws / "MULTITARGET_PLOT.png")


def test_track_simple_cli_plot(workspace, monkeypatch):
    ws, cfg_path, cfg = workspace
    monkeypatch.chdir(ws)
    from passiveradar_tpu.cli.track_simple import main
    main(["--config", cfg_path, "--mode", "plot"])
    assert os.path.exists(ws / "TRACKER_PLOT.png")


@pytest.mark.parametrize("detail", ["full", "summary"])
def test_stream_cli(workspace, capsys, detail):
    ws, cfg_path, cfg = workspace
    from passiveradar_tpu.cli.stream import main
    main(["--config", cfg_path, "--max-frames", "3", "--detail", detail])
    out = capsys.readouterr().out
    assert "Streamed 3 frames" in out
    assert "frame    0" in out


def test_preview_cli(workspace, monkeypatch):
    ws, cfg_path, cfg = workspace
    monkeypatch.chdir(ws)
    from passiveradar_tpu.cli.preview import main
    main(["--config", cfg_path])
    assert os.path.exists(ws / "SIGNAL_PREVIEW.png")
