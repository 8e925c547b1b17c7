"""Multi-host runtime: 2 real processes over jax.distributed (CPU/gloo).

Executes parallel/distributed.py for real: two OS processes initialise a
distributed runtime, each processes its contiguous reader shard over its own
local mesh, writes a .partN output shard, and process 0 writes global
metadata. cli.concat reassembles the shards, which must match a single-host
run of the same capture (host-boundary halos come from one-frame disk
margins, so the split is exact up to float noise).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.synthetic import Target, write_synth_capture

TINY = dict(
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="hdf5",
    num_frames=7,
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
def capture(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    params = dict(TINY, input_file=str(d / "cap.hdf5"),
                  output_fname=str(d / "MH"))
    cfg = derive_config(params)
    write_synth_capture(params["input_file"], cfg, 7,
                        targets=(Target(40, 20.0, 0.1),))
    cfg_path = str(d / "mh.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(params, f)
    return d, cfg, cfg_path


def test_single_process_multihost_path(capture):
    """run_capture_multihost degrades to the plain local-mesh run when the
    runtime is single-process (covers the non-sharded branch in-process)."""
    d, cfg, _ = capture
    import dataclasses
    cfg1 = dataclasses.replace(
        cfg, output_fname=str(d / "ONE"),
        range_doppler_map_fname=str(d / "ONE.hdf5"),
        meta_fname=str(d / "ONE.npz"))
    from passiveradar_tpu.parallel.distributed import run_capture_multihost
    n, global_n = run_capture_multihost(cfg1, progress=False)
    assert n == global_n == 7
    assert os.path.exists(str(d / "ONE.hdf5"))
    assert os.path.exists(str(d / "ONE.npz"))


def test_two_process_run_matches_single_host(capture):
    d, cfg, cfg_path = capture
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_ENABLE_COMPILATION_CACHE="false",
    )
    # this container's sitecustomize force-registers a remote TPU backend
    # whenever this var is set; the workers must stay on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "passiveradar_tpu.cli.process",
             "--config", cfg_path, "--num-processes", "2",
             "--process-id", str(p), "--coordinator", "localhost:12639"],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    # per-host shard files: 7 frames split 3 + 4 (remainder on the last host)
    import h5py
    with h5py.File(str(d / "MH.part0.hdf5")) as f:
        assert f["/xambg"].shape[2] == 3
    with h5py.File(str(d / "MH.part1.hdf5")) as f:
        assert f["/xambg"].shape[2] == 4
    # process 0 wrote metadata for the GLOBAL stack
    meta = np.load(str(d / "MH.npz"))
    assert meta["frame_timestamps"].shape == (7,)

    # reassemble with the CLI tool
    from passiveradar_tpu.cli.concat import main as concat_main
    concat_main(["--config", cfg_path])
    assert not os.path.exists(str(d / "MH.part0.hdf5"))  # cleaned up
    with h5py.File(str(d / "MH.hdf5")) as f:
        merged = np.asarray(f["/xambg"])
        assert f["/xambg"].attrs["frames_done"] == 7
    assert merged.shape[2] == 7

    # must match the single-host output (test_single_process ran first)
    with h5py.File(str(d / "ONE.hdf5")) as f:
        want = np.asarray(f["/xambg"])
    assert np.max(np.abs(merged - want)) < 1e-3 * np.max(np.abs(want))


def test_init_distributed_rejects_coordinator_without_layout():
    """--coordinator alone must fail loudly, not run single-process."""
    import pytest

    from passiveradar_tpu.parallel.distributed import init_distributed

    with pytest.raises(ValueError, match="num_processes"):
        init_distributed(coordinator_address="127.0.0.1:1234")
