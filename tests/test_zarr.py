"""zarr v2 output path: vendored directory-store backend + writer contract.

The reference writes its map stacks straight to zarr (main.py:216-224).
zarr is not installed in this environment, so these tests exercise the
vendored spec-subset implementation (io/zarr_min.py) through the same
writer/loader/concat surfaces the HDF5 path uses — a requested zarr output
must be real zarr v2 on disk, never a silent HDF5 fallback.
"""

import json
import os

import numpy as np
import pytest

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io import zarr_min
from passiveradar_tpu.io.writers import (MapWriter, concat_parts, load_maps,
                                         zarr_backend)

TINY = dict(
    input_file="",
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="zarr",
    output_fname="",
    num_frames=8,
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


def _cfg(tmp_path, **over):
    return derive_config(dict(TINY, output_fname=str(tmp_path / "Z"), **over))


def test_zarr_min_roundtrip_and_format(tmp_path):
    p = str(tmp_path / "a.zarr")
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((16, 9, 7))
            + 1j * rng.standard_normal((16, 9, 7))).astype(np.complex64)
    z = zarr_min.open(p, "w", shape=(16, 9, 7), chunks=(16, 9, 1),
                      dtype=np.complex64)
    # whole-chunk writes, partial-chunk writes, scalar-ish edge slices
    z[:, :, 0:3] = data[:, :, 0:3]
    z[:, :, 3:7] = data[:, :, 3:7]
    z[2:5, 1:4, 2:4] = data[2:5, 1:4, 2:4]          # read-modify-write
    z.attrs["frames_done"] = 7

    # spec-conformant .zarray metadata on disk
    with open(os.path.join(p, ".zarray")) as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [16, 9, 7] and meta["chunks"] == [16, 9, 1]
    assert meta["dtype"] == "<c8" and meta["order"] == "C"
    assert meta["compressor"]["id"] == "zlib"
    assert sorted(os.listdir(p))[:2] == [".zarray", ".zattrs"]
    assert os.path.exists(os.path.join(p, "0.0.3"))  # C-order chunk keys

    r = zarr_min.open(p, "r")
    assert r.shape == (16, 9, 7) and r.dtype == np.complex64
    assert int(r.attrs["frames_done"]) == 7
    np.testing.assert_array_equal(np.asarray(r), data)
    np.testing.assert_array_equal(r[3:9, 2:5, 1:6], data[3:9, 2:5, 1:6])
    with pytest.raises(PermissionError):
        r[:, :, 0:1] = 0


def test_zarr_min_fill_value_and_modes(tmp_path):
    p = str(tmp_path / "b.zarr")
    z = zarr_min.open(p, "w", shape=(4, 6), chunks=(2, 3), dtype=np.float32)
    z[0:2, 0:3] = 1.5
    # untouched chunks read as fill_value (partial-output semantics)
    out = np.asarray(zarr_min.open(p, "r"))
    assert np.all(out[:2, :3] == 1.5) and np.all(out[2:, :] == 0)
    # mode 'a' reopens in place; 'r' on a missing array raises
    za = zarr_min.open(p, "a")
    za[2:4, 3:6] = 2.5
    assert np.all(np.asarray(zarr_min.open(p, "r"))[2:, 3:] == 2.5)
    with pytest.raises(FileNotFoundError):
        zarr_min.open(str(tmp_path / "missing.zarr"), "r")
    # raw (uncompressed) codec roundtrip
    p2 = str(tmp_path / "c.zarr")
    z2 = zarr_min.open(p2, "w", shape=(3,), dtype=np.int16, compressor=None)
    z2[0:3] = np.array([1, -2, 3], np.int16)
    raw = open(os.path.join(p2, "0"), "rb").read()
    assert raw == np.array([1, -2, 3], np.int16).tobytes()
    # unsupported codec is a loud error, not silent misbehaviour
    meta = json.load(open(os.path.join(p2, ".zarray")))
    meta["compressor"] = {"id": "blosc"}
    json.dump(meta, open(os.path.join(p2, ".zarray"), "w"))
    with pytest.raises(ValueError, match="unsupported compressor"):
        zarr_min.open(p2, "r")


def test_zarr_min_mode_w_clears_previous_array(tmp_path):
    """Real zarr's mode 'w' clears the store: stale chunk data and the
    stale resume counter from a previous array at the same path must not
    survive (a fresh run interrupted before its first write, then resumed,
    must not silently return the PREVIOUS run's output)."""
    p = str(tmp_path / "w.zarr")
    z = zarr_min.open(p, "w", shape=(4, 6), chunks=(2, 3), dtype=np.float32)
    z[:, :] = 7.0
    z.attrs["frames_done"] = 99
    # recreate at the same path: smaller array, nothing written yet
    z2 = zarr_min.open(p, "w", shape=(4, 6), chunks=(2, 3), dtype=np.float32)
    assert dict(z2.attrs) == {}
    out = np.asarray(zarr_min.open(p, "r"))
    assert np.all(out == 0), "stale chunk data leaked through mode 'w'"
    # mode 'w-': create-or-fail semantics
    with pytest.raises(FileExistsError):
        zarr_min.open(p, "w-", shape=(4, 6), dtype=np.float32)
    p2 = str(tmp_path / "fresh.zarr")
    znew = zarr_min.open(p2, "w-", shape=(2,), dtype=np.int16)
    znew[0:2] = np.array([3, 4], np.int16)
    np.testing.assert_array_equal(np.asarray(zarr_min.open(p2, "r")), [3, 4])


def test_map_writer_fresh_zarr_pins_resume_counter(tmp_path):
    """A non-resume MapWriter must leave frames_done=0 on disk immediately,
    so a crash during the (minutes-long) first compile resumes from 0."""
    cfg = _cfg(tmp_path)
    MapWriter(cfg, 6).close()
    z = zarr_min.open(cfg.range_doppler_map_fname, "r")
    assert int(z.attrs.get("frames_done", -1)) == 0


def test_map_writer_zarr_resume_and_load(tmp_path):
    cfg = _cfg(tmp_path)
    assert zarr_backend() is zarr_min   # zarr package absent here
    nf, rr = cfg.num_doppler_cells, cfg.num_range_cells + 1
    rng = np.random.default_rng(1)
    frames = (rng.standard_normal((6, nf, rr))
              + 1j * rng.standard_normal((6, nf, rr))).astype(np.complex64)

    w = MapWriter(cfg, 6)
    assert w.path.endswith(".zarr")
    w.write(frames[:4], 0)
    w.close()
    # interrupted after 4 frames → resume picks up the counter and finishes
    w2 = MapWriter(cfg, 6, resume=True)
    assert w2.frames_done == 4
    w2.write(frames[4:], 4)
    w2.close()

    got = load_maps(cfg)
    assert got.shape == (nf, rr, 6)
    np.testing.assert_allclose(got, np.abs(np.moveaxis(frames, 0, 2)),
                               rtol=1e-6)


def test_concat_parts_zarr(tmp_path):
    nf, rr = 8, 5
    rng = np.random.default_rng(2)
    parts, all_frames = [], []
    for i, n in enumerate((3, 4)):
        x = (rng.standard_normal((nf, rr, n))
             + 1j * rng.standard_normal((nf, rr, n))).astype(np.complex64)
        p = str(tmp_path / f"p{i}.zarr")
        z = zarr_min.open(p, "w", shape=(nf, rr, n), chunks=(nf, rr, 1),
                          dtype=np.complex64)
        z[:, :, :] = x
        parts.append(p)
        all_frames.append(x)
    out = str(tmp_path / "all.zarr")
    total = concat_parts(parts, out, ftype="zarr")
    assert total == 7
    got = np.asarray(zarr_min.open(out, "r"))
    np.testing.assert_array_equal(got, np.concatenate(all_frames, axis=2))
    assert int(zarr_min.open(out, "r").attrs["frames_done"]) == 7


def test_run_capture_to_zarr_end_to_end(tmp_path):
    from passiveradar_tpu.io.hdf5 import CaptureReader
    from passiveradar_tpu.io.synthetic import Target, write_synth_capture
    from passiveradar_tpu.pipeline import run_capture

    cfg = _cfg(tmp_path, input_file=str(tmp_path / "cap.hdf5"))
    write_synth_capture(cfg.input_file, cfg, 4,
                        targets=(Target(40, 20.0, 0.1),))
    reader = CaptureReader(cfg, estimate_offset=False)
    total = min(reader.num_frames, cfg.num_frames)
    w = MapWriter(cfg, total)
    n = run_capture(reader, w, cfg, batch_frames=4, progress=False)
    w.close()
    reader.close()
    assert n == total
    assert os.path.isdir(cfg.range_doppler_map_fname)       # real zarr dir

    # identical to the hdf5 output path
    cfg_h = _cfg(tmp_path, input_file=str(tmp_path / "cap.hdf5"),
                 range_doppler_map_ftype="hdf5")
    reader = CaptureReader(cfg_h, estimate_offset=False)
    wh = MapWriter(cfg_h, total)
    run_capture(reader, wh, cfg_h, batch_frames=4, progress=False)
    wh.close()
    reader.close()
    np.testing.assert_array_equal(load_maps(cfg), load_maps(cfg_h))
