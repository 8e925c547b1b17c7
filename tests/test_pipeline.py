"""End-to-end pipeline tests on a small synthetic capture, plus sharding.

The tiny config keeps the full derivation chain realistic (pow2 CPI, rational
resample, pow2 Doppler bins) at test-friendly sizes: cpi 16384 samples, 1 s
CPI, 256 Doppler × 23 range cells.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.io.synthetic import Target, synth_capture_arrays, write_synth_capture
from passiveradar_tpu.io.writers import MapWriter, load_maps, write_metadata
from passiveradar_tpu.parallel.halo import overlap_frames, overlap_frames_shmap
from passiveradar_tpu.parallel.mesh import frame_sharding, make_mesh
from passiveradar_tpu.pipeline import frame_phases, process_frames, run_capture

TINY = dict(
    input_file="",
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="hdf5",
    output_fname="tiny_maps",
    num_frames=8,
    input_sample_rate=49152,
    input_center_freq=1_000_000,
    channel_freq=990_170,        # offset 9830 → nonzero per-frame phases
    channel_bandwidth=12800,
    cpi_seconds_nominal=1.0,
    max_doppler_nominal=128.0,
    max_range_nominal=400.0,
    overlap_cpi=True,
    frame_batch=4,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return derive_config(TINY)


def test_tiny_cfg_geometry(tiny_cfg):
    c = tiny_cfg
    assert c.cpi_samples == 16384
    assert (c.resamp_up, c.resamp_dn) == (1, 3)
    assert c.num_doppler_cells == 256
    assert c.output_chunk_length == 8192
    assert c.window_overlap == 4096
    assert c.caf_input_samples == 16384


def _make_frames(cfg, n_frames, targets, seed=0, **kw):
    ref, srv = synth_capture_arrays(cfg, n_frames, targets=targets, seed=seed,
                                    **kw)
    L = cfg.input_chunk_length
    ref = ref[:n_frames * L].reshape(n_frames, L)
    srv = srv[:n_frames * L].reshape(n_frames, L)
    return ref, srv


def test_end_to_end_target_recovery(tiny_cfg):
    cfg = tiny_cfg
    n_frames = 4
    tgt = Target(delay_samples=40, doppler_hz=20.0, amplitude=0.1)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = frame_phases(cfg, list(range(n_frames)))
    maps = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    assert maps.shape == (n_frames, cfg.num_doppler_cells,
                          cfg.num_range_cells + 1)
    # expected cell: IF delay = 40 * up/dn; raw Doppler row = nf/2 - doppler
    delay_if = tgt.delay_samples * cfg.resamp_up / cfg.resamp_dn
    expect_col = cfg.num_range_cells - round(delay_if)
    expect_row = cfg.num_doppler_cells // 2 - round(
        tgt.doppler_hz / cfg.doppler_cell_width)
    for f in range(1, n_frames - 1):  # interior frames (full halo)
        r, c = np.unravel_index(np.argmax(maps[f]), maps[f].shape)
        assert abs(r - expect_row) <= 1, (r, expect_row)
        assert abs(c - expect_col) <= 1, (c, expect_col)


def test_clutter_cancellation_suppresses_direct_path(tiny_cfg):
    cfg = tiny_cfg
    n_frames = 3
    ref, srv = _make_frames(cfg, n_frames, (), direct_gain=1.0)
    phases = frame_phases(cfg, list(range(n_frames)))
    maps = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    nf = cfg.num_doppler_cells
    # with the canceller active, the zero-Doppler ridge must not dominate:
    # compare the zero-Doppler row's peak against an un-cancelled run
    from passiveradar_tpu.pipeline import caf_batch, preprocess_batch
    r_if = preprocess_batch(jnp.asarray(ref), jnp.asarray(phases), cfg)
    s_if = preprocess_batch(jnp.asarray(srv), jnp.asarray(phases), cfg)
    raw_maps = np.abs(np.asarray(caf_batch(r_if, s_if, cfg)))
    ridge_clean = maps[1, nf // 2 - 1:nf // 2 + 2].max()
    ridge_raw = raw_maps[1, nf // 2 - 1:nf // 2 + 2].max()
    assert ridge_clean < ridge_raw / 30


def test_sharded_pipeline_matches_single_device(tiny_cfg):
    cfg = tiny_cfg
    n_frames = 8
    tgt = Target(delay_samples=30, doppler_hz=-15.0, amplitude=0.1)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = jnp.asarray(frame_phases(cfg, list(range(n_frames))))

    single = np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), phases, cfg))

    mesh = make_mesh(8)
    sh = frame_sharding(mesh)
    ref_s = jax.device_put(jnp.asarray(ref), sh)
    srv_s = jax.device_put(jnp.asarray(srv), sh)
    ph_s = jax.device_put(phases, sh)
    sharded = np.asarray(process_frames(ref_s, srv_s, ph_s, cfg))

    scale = np.max(np.abs(single))
    assert np.max(np.abs(sharded - single)) < 1e-3 * scale


def test_halo_exchange_shmap_matches_roll():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((8, 32)) + 1j * rng.standard_normal((8, 32))
         ).astype(np.complex64)
    want = np.asarray(overlap_frames(jnp.asarray(x), 8))
    xs = jax.device_put(jnp.asarray(x), frame_sharding(mesh))
    got = np.asarray(overlap_frames_shmap(xs, 8, mesh))
    assert np.array_equal(got, want)
    # boundary frames must have zero halos
    assert np.all(got[0, :8] == 0)
    assert np.all(got[-1, -8:] == 0)


def test_file_roundtrip_and_run_capture(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    os.chdir(tmp_path)
    n_frames = 6
    path = str(tmp_path / "cap.hdf5")
    write_synth_capture(path, cfg, n_frames,
                        targets=(Target(40, 20.0, 0.1),), channel_offset=7)
    reader = CaptureReader(cfg, path)
    assert reader.offset == -7  # srv delayed by 7 → negative reported offset
    total = min(reader.num_frames, cfg.num_frames)
    writer = MapWriter(cfg, total, str(tmp_path / "maps.hdf5"))
    n_done = run_capture(reader, writer, cfg, batch_frames=3, progress=False)
    writer.close()
    write_metadata(cfg, n_done, str(tmp_path / "maps.npz"))
    assert n_done == total

    maps = load_maps(cfg, str(tmp_path / "maps.hdf5"))
    assert maps.shape == (cfg.num_doppler_cells, cfg.num_range_cells + 1, n_done)

    # batch-boundary frames must match a single whole-capture evaluation
    ref, srv = reader.read_raw_frames(0, n_done)
    phases = frame_phases(cfg, list(range(n_done)))
    whole = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    whole = np.moveaxis(whole, 0, 2)
    assert np.max(np.abs(maps - whole)) < 1e-3 * np.max(whole)

    meta = np.load(str(tmp_path / "maps.npz"))
    assert meta["doppler_bins"].shape == (cfg.num_doppler_cells,)
    reader.close()


def test_run_capture_dispatch_groups(tiny_cfg, tmp_path):
    """dispatch_groups=G (scan of G batches per program) must match the
    ungrouped loop frame-for-frame, including the zero-padded final partial
    group (7 frames = 4 batches of 2 over G=3 → groups of 3+1)."""
    cfg = tiny_cfg
    n_frames = 7
    path = str(tmp_path / "cap_g.hdf5")
    write_synth_capture(path, cfg, n_frames, targets=(Target(40, 20.0, 0.1),))
    reader = CaptureReader(cfg, path, estimate_offset=False)
    total = min(reader.num_frames, cfg.num_frames)

    w1 = MapWriter(cfg, total, str(tmp_path / "ung.hdf5"))
    run_capture(reader, w1, cfg, batch_frames=2, progress=False)
    w1.close()
    w2 = MapWriter(cfg, total, str(tmp_path / "grp.hdf5"))
    n = run_capture(reader, w2, cfg, batch_frames=2, progress=False,
                    dispatch_groups=3)
    w2.close()
    assert n == total

    import h5py
    with h5py.File(str(tmp_path / "ung.hdf5")) as f:
        want = np.asarray(f["/xambg"])
    with h5py.File(str(tmp_path / "grp.hdf5")) as f:
        got = np.asarray(f["/xambg"])
    assert np.array_equal(got, want)
    reader.close()


def test_resume_after_interruption(tiny_cfg, tmp_path):
    """MapWriter resume: an interrupted run restarts where it stopped and the
    result matches an uninterrupted run."""
    cfg = tiny_cfg
    n_frames = 6
    path = str(tmp_path / "cap_r.hdf5")
    write_synth_capture(path, cfg, n_frames, targets=(Target(40, 20.0, 0.1),))
    reader = CaptureReader(cfg, path, estimate_offset=False)
    total = min(reader.num_frames, cfg.num_frames)

    # full run for reference output
    w_full = MapWriter(cfg, total, str(tmp_path / "full.hdf5"))
    run_capture(reader, w_full, cfg, batch_frames=2, progress=False)
    w_full.close()

    # interrupted: process only the first batch, then resume
    w1 = MapWriter(cfg, total, str(tmp_path / "part.hdf5"))
    batches_done = []
    orig_write = w1.write
    def write_once(frames, start):
        orig_write(frames, start)
        batches_done.append(start)
        if len(batches_done) == 1:
            raise KeyboardInterrupt
    w1.write = write_once
    try:
        run_capture(reader, w1, cfg, batch_frames=2, progress=False)
    except KeyboardInterrupt:
        pass
    w1.close()

    w2 = MapWriter(cfg, total, str(tmp_path / "part.hdf5"), resume=True)
    assert w2.frames_done == 2
    run_capture(reader, w2, cfg, batch_frames=2, progress=False)
    w2.close()

    import h5py
    with h5py.File(str(tmp_path / "full.hdf5")) as f:
        want = np.asarray(f["/xambg"])
    with h5py.File(str(tmp_path / "part.hdf5")) as f:
        got = np.asarray(f["/xambg"])
    assert np.array_equal(got, want)
    reader.close()


def test_non_overlap_mode_end_to_end(rng):
    """overlap_cpi=False (fixed relative to the reference, whose non-overlap
    branch crashes on an undefined key — config.py:77): full CPIs, no halo."""
    params = dict(TINY, overlap_cpi=False, num_frames=3)
    cfg = derive_config(params)
    assert cfg.window_overlap == 0
    n_frames = 3
    tgt = Target(delay_samples=40, doppler_hz=20.0, amplitude=0.15)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = frame_phases(cfg, list(range(n_frames)))
    maps = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    assert maps.shape == (n_frames, cfg.num_doppler_cells,
                          cfg.num_range_cells + 1)
    delay_if = tgt.delay_samples * cfg.resamp_up / cfg.resamp_dn
    expect_col = cfg.num_range_cells - round(delay_if)
    expect_row = cfg.num_doppler_cells // 2 - round(
        tgt.doppler_hz / cfg.doppler_cell_width)
    for f in range(n_frames):
        r, c = np.unravel_index(np.argmax(maps[f]), maps[f].shape)
        assert abs(r - expect_row) <= 1
        assert abs(c - expect_col) <= 1


def test_run_capture_sharded_default_batch(tiny_cfg, tmp_path):
    """Regression: the bf+2 dispatch buffer must round up to the device count
    (bf=8 → 10 frames over 8 devices used to crash device_put)."""
    cfg = tiny_cfg
    path = str(tmp_path / "cap_s.hdf5")
    write_synth_capture(path, cfg, 6, targets=(Target(40, 20.0, 0.1),))
    reader = CaptureReader(cfg, path, estimate_offset=False)
    total = min(reader.num_frames, cfg.num_frames)
    mesh = make_mesh(8)
    w = MapWriter(cfg, total, str(tmp_path / "maps_s.hdf5"))
    n = run_capture(reader, w, cfg, batch_frames=8,
                    sharding=frame_sharding(mesh), progress=False)
    w.close()
    assert n == total
    # sharded output equals unsharded output
    w2 = MapWriter(cfg, total, str(tmp_path / "maps_u.hdf5"))
    run_capture(reader, w2, cfg, batch_frames=8, progress=False)
    w2.close()
    import h5py
    with h5py.File(str(tmp_path / "maps_s.hdf5")) as f:
        a = np.asarray(f["/xambg"])
    with h5py.File(str(tmp_path / "maps_u.hdf5")) as f:
        b = np.asarray(f["/xambg"])
    assert np.max(np.abs(a - b)) < 1e-3 * np.max(np.abs(b))
    reader.close()


def test_sharded_readers_match_single_host(tiny_cfg, tmp_path):
    """Two sequential reader shards (simulating two hosts) must reproduce the
    single-reader output exactly: host-boundary halos read into the
    neighbour's range, phases use global frame indices, and the remainder
    goes to the last shard."""
    cfg = tiny_cfg
    n_frames = 7  # odd → shard sizes 3 + 4 (remainder exercise)
    path = str(tmp_path / "cap_m.hdf5")
    write_synth_capture(path, cfg, n_frames, targets=(Target(40, 20.0, 0.1),))

    single = CaptureReader(cfg, path, estimate_offset=False)
    total = min(single.num_frames, cfg.num_frames)
    w = MapWriter(cfg, total, str(tmp_path / "one.hdf5"))
    run_capture(single, w, cfg, batch_frames=3, progress=False)
    w.close()
    single.close()

    parts = []
    counts = []
    for p in range(2):
        r = CaptureReader(cfg, path, estimate_offset=False).shard(p, 2)
        counts.append(r.num_frames)
        wp = MapWriter(cfg, r.num_frames, str(tmp_path / f"part{p}.hdf5"))
        run_capture(r, wp, cfg, batch_frames=3, progress=False)
        wp.close()
        import h5py
        with h5py.File(str(tmp_path / f"part{p}.hdf5")) as f:
            parts.append(np.asarray(f["/xambg"]))
        r.close()
    assert sum(counts) == total
    combined = np.concatenate(parts, axis=2)

    import h5py
    with h5py.File(str(tmp_path / "one.hdf5")) as f:
        want = np.asarray(f["/xambg"])[:, :, :combined.shape[2]]
    assert np.max(np.abs(combined - want)) < 1e-3 * np.max(np.abs(want))


@pytest.mark.parametrize("method", ["nlms", "nlms_pallas", "none"])
def test_clutter_method_selection(tiny_cfg, method):
    """Pipeline clutter backend knob: NLMS (scan & Pallas-interpret) and
    passthrough all run end-to-end and still localise the target."""
    import dataclasses
    import jax
    cfg = dataclasses.replace(tiny_cfg, clutter_method=method)
    n_frames = 3
    tgt = Target(delay_samples=40, doppler_hz=20.0, amplitude=0.2)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = frame_phases(cfg, list(range(n_frames)))
    maps = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    nf = cfg.num_doppler_cells
    m = maps[1].copy()
    m[nf // 2 - 3:nf // 2 + 4, :] = 0  # mask the (uncancelled) clutter ridge
    r, c = np.unravel_index(np.argmax(m), m.shape)
    delay_if = tgt.delay_samples * cfg.resamp_up / cfg.resamp_dn
    assert abs(c - (cfg.num_range_cells - round(delay_if))) <= 1
    assert abs(r - (nf // 2 - round(tgt.doppler_hz / cfg.doppler_cell_width))) <= 1


def test_caf_flattop_mode_in_pipeline(tiny_cfg):
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg, caf_short_filt=False)
    n_frames = 3
    tgt = Target(delay_samples=40, doppler_hz=20.0, amplitude=0.15)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = frame_phases(cfg, list(range(n_frames)))
    maps = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), jnp.asarray(phases), cfg)))
    r, c = np.unravel_index(np.argmax(maps[1]), maps[1].shape)
    delay_if = tgt.delay_samples * cfg.resamp_up / cfg.resamp_dn
    assert abs(c - (cfg.num_range_cells - round(delay_if))) <= 1


def test_int16_capture_ships_raw_and_matches_float32(tiny_cfg, tmp_path):
    """int16 captures dispatch raw int16 to the device (half the H2D bytes)
    and the on-device convert matches the float32 path bit-for-bit."""
    cfg = derive_config(dict(TINY, int16_scale=1.0 / 32768.0))
    n_frames = 5
    p16 = str(tmp_path / "cap16.hdf5")
    write_synth_capture(p16, cfg, n_frames, dtype=np.int16,
                        targets=(Target(40, 20.0, 0.1),))

    # float32 twin: the same int16 samples host-converted with the same scale
    import h5py
    with h5py.File(p16) as f:
        r16 = np.asarray(f[cfg.input_ref_path])
        s16 = np.asarray(f[cfg.input_srv_path])
    p32 = str(tmp_path / "cap32.hdf5")
    with h5py.File(p32, "w") as f:
        f.create_dataset(cfg.input_ref_path,
                         data=r16.astype(np.float32) * cfg.int16_scale)
        f.create_dataset(cfg.input_srv_path,
                         data=s16.astype(np.float32) * cfg.int16_scale)

    reader16 = CaptureReader(cfg, p16, estimate_offset=False)
    assert reader16.pair_dtype == np.int16
    pr, _ = reader16.read_pair_frames(0, 2)
    assert pr.dtype == np.int16 and pr.shape == (2, reader16.frame_len_c, 2)

    nt = min(reader16.num_frames, cfg.num_frames)
    w16 = MapWriter(cfg, nt, str(tmp_path / "m16.hdf5"))
    run_capture(reader16, w16, cfg, batch_frames=3, progress=False)
    w16.close()
    # grouped dispatch must match on the raw-int16 pair path too (device
    # zero-padding of the partial group uses the int16 dispatch dtype)
    wg = MapWriter(cfg, nt, str(tmp_path / "m16g.hdf5"))
    run_capture(reader16, wg, cfg, batch_frames=2, progress=False,
                dispatch_groups=2)
    wg.close()
    reader32 = CaptureReader(cfg, p32, estimate_offset=False)
    assert reader32.pair_dtype == np.float32
    w32 = MapWriter(cfg, nt, str(tmp_path / "m32.hdf5"))
    run_capture(reader32, w32, cfg, batch_frames=3, progress=False)
    w32.close()
    reader16.close()
    reader32.close()

    m16 = load_maps(cfg, str(tmp_path / "m16.hdf5"))
    m32 = load_maps(cfg, str(tmp_path / "m32.hdf5"))
    scale = np.max(np.abs(m32))
    assert np.max(np.abs(m16 - m32)) <= 1e-6 * scale
    m16g = load_maps(cfg, str(tmp_path / "m16g.hdf5"))
    assert np.array_equal(m16g, m16)


def test_shmap_pipeline_matches_single_device(tiny_cfg, monkeypatch):
    """The explicit-collective shard_map pipeline must match the single-
    device evaluation — with the einsum resampler AND with the Pallas
    kernel running per-device inside the manual region (interpret mode)."""
    from passiveradar_tpu.pipeline import process_frames_shmap

    cfg = tiny_cfg
    n_frames = 8
    tgt = Target(delay_samples=30, doppler_hz=-15.0, amplitude=0.1)
    ref, srv = _make_frames(cfg, n_frames, (tgt,))
    phases = jnp.asarray(frame_phases(cfg, list(range(n_frames))))

    single = np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv), phases, cfg))
    scale = np.max(np.abs(single))

    mesh = make_mesh(8)
    sh = frame_sharding(mesh)
    ref_s = jax.device_put(jnp.asarray(ref), sh)
    srv_s = jax.device_put(jnp.asarray(srv), sh)
    ph_s = jax.device_put(phases, sh)

    got = np.asarray(process_frames_shmap(ref_s, srv_s, ph_s, cfg, mesh))
    assert np.max(np.abs(got - single)) < 1e-3 * scale

    monkeypatch.setenv("PASSIVERADAR_PALLAS_RESAMPLE", "1")
    got_pl = np.asarray(process_frames_shmap(ref_s, srv_s, ph_s, cfg, mesh))
    assert np.max(np.abs(got_pl - single)) < 1e-3 * scale


def test_strict_frame_parity_matches_reference_trim(tiny_cfg, tmp_path):
    """strict_frame_parity replicates the reference's final-chunk trim
    (main.py:116-120): one fewer output frame, and the kept final frame's
    right halo is ZERO (trim happens before the boundary=0 overlap) — i.e.
    the run equals a default run over the capture physically truncated by
    one frame."""
    import dataclasses
    import h5py
    cfg = tiny_cfg
    cfg_s = dataclasses.replace(cfg, strict_frame_parity=True)
    p5 = str(tmp_path / "cap5.hdf5")
    # the synth writer emits n+1 chunks → this file holds 6 whole frames
    write_synth_capture(p5, cfg, 5, targets=(Target(40, 20.0, 0.1),))
    # byte-exact 5-frame truncation of the same capture
    p4 = str(tmp_path / "cap4.hdf5")
    n4 = 5 * cfg.input_chunk_length
    with h5py.File(p5) as src, h5py.File(p4, "w") as dst:
        dst.create_dataset(cfg.input_ref_path, data=src[cfg.input_ref_path][:n4])
        dst.create_dataset(cfg.input_srv_path, data=src[cfg.input_srv_path][:n4])

    def run(cfg_x, path, out):
        r = CaptureReader(cfg_x, path, estimate_offset=False)
        from passiveradar_tpu.pipeline import capture_frame_count
        total = capture_frame_count(r, cfg_x)
        w = MapWriter(cfg_x, total, str(tmp_path / out))
        run_capture(r, w, cfg_x, batch_frames=3, progress=False)
        w.close()
        r.close()
        with h5py.File(str(tmp_path / out)) as f:
            return np.asarray(f["/xambg"])

    strict = run(cfg_s, p5, "strict.hdf5")
    default6 = run(cfg, p5, "default6.hdf5")
    default5 = run(cfg, p4, "default5.hdf5")
    assert default6.shape[2] == 6 and strict.shape[2] == 5
    scale = np.max(np.abs(default5))
    assert np.max(np.abs(strict - default5)) < 1e-4 * scale
    # ...and differs from naive truncation of the 6-frame run in the final
    # frame (whose right halo there is frame 5's real data, not zero)
    assert np.max(np.abs(strict[:, :, 4] - default6[:, :, 4])) > 1e-3 * scale


def test_shmap_program_emits_exactly_four_ppermutes(tiny_cfg):
    """HLO-level scaling contract: the explicit-collective pipeline's only
    cross-device traffic is the CPI-overlap halo — one ppermute pair per
    channel, so exactly 4 collective-permutes in the whole compiled step
    (the ≥80%-scaling-efficiency BASELINE proxy: everything else is local)."""
    import re

    from passiveradar_tpu.pipeline import _pallas_decision, _shmap_program

    cfg = tiny_cfg
    n_frames = 8
    mesh = make_mesh(8)
    fn = _shmap_program(cfg, mesh, "frames", _pallas_decision())
    lc = cfg.input_chunk_length // 2
    ref = jnp.zeros((n_frames, lc, 2), jnp.float32)
    ph = jnp.zeros((n_frames,), jnp.float32)
    hlo = fn.lower(ref, ref, ph).compile().as_text()
    # count distinct collective-permute ops (async pairs count once) and
    # extract each one's result shape
    shapes = re.findall(
        r"= \(?(\w+)\[([\d,]*)\][^=]*? collective-permute(?:-start)?\(", hlo)
    starts = [s for s in re.findall(
        r"= \(?(\w+)\[([\d,]*)\][^=]*? (collective-permute(?:-start)?)\(",
        hlo) if s[2].endswith("start")]
    if starts:
        shapes = [(d, s) for d, s, _ in starts]
    assert len(shapes) == 4, f"expected 4 collective-permutes, got {shapes}"
    # byte budget: each permute moves one frame-edge halo of window_overlap
    # complex64 samples — 4·depth·8 bytes per step total, independent of
    # device count (the docs/SCALING.md efficiency argument)
    itemsize = {"c64": 8, "f32": 4, "f64": 8, "c128": 16}
    total = 0
    for dt, dims in shapes:
        n = 1
        for d in dims.split(","):
            n *= int(d)
        total += n * itemsize[dt]
    assert total == 4 * cfg.window_overlap * 8, (
        f"halo byte budget changed: {shapes} -> {total} B, expected "
        f"{4 * cfg.window_overlap * 8}")


def test_run_capture_sharded_routes_through_shmap(tiny_cfg, tmp_path,
                                                  monkeypatch):
    """run_capture(sharding=1-D NamedSharding) must use the explicit-
    collective shard_map program (the production multi-chip path), never
    the auto-pjit process_frames."""
    import passiveradar_tpu.pipeline as pl

    cfg = tiny_cfg
    path = str(tmp_path / "cap_rt.hdf5")
    write_synth_capture(path, cfg, 4, targets=(Target(40, 20.0, 0.1),))
    reader = CaptureReader(cfg, path, estimate_offset=False)
    total = min(reader.num_frames, cfg.num_frames)

    def boom(*a, **k):
        raise AssertionError("auto-pjit path used under a frame mesh")

    monkeypatch.setattr(pl, "process_frames", boom)
    w = MapWriter(cfg, total, str(tmp_path / "maps_rt.hdf5"))
    n = run_capture(reader, w, cfg, batch_frames=4,
                    sharding=frame_sharding(make_mesh(8)), progress=False)
    w.close()
    reader.close()
    assert n == total


def test_env_gates_key_the_jit_caches(tiny_cfg, monkeypatch):
    """Flipping PASSIVERADAR_{MXU_FFT,PALLAS_FFT,PALLAS_RESAMPLE} between
    calls must take effect: the gates are read at trace time, so every
    pipeline-level jit keys on the _routing_key snapshot — a flipped env
    produces a fresh trace (same math, different kernel routing), never a
    silently reused stale program."""
    import passiveradar_tpu.pipeline as pl

    for env in ("PASSIVERADAR_MXU_FFT", "PASSIVERADAR_PALLAS_FFT",
                "PASSIVERADAR_PALLAS_RESAMPLE"):
        monkeypatch.delenv(env, raising=False)
    base = pl._routing_key()
    base_manual = pl._routing_key(manual=True)
    for env in ("PASSIVERADAR_MXU_FFT", "PASSIVERADAR_PALLAS_FFT",
                "PASSIVERADAR_PALLAS_RESAMPLE"):
        monkeypatch.setenv(env, "1")
        assert pl._routing_key() != base, env
        assert pl._routing_key(manual=True) != base_manual, env
        monkeypatch.delenv(env)
    assert pl._routing_key() == base

    # and the key actually reaches the program cache: a flipped gate is a
    # different static argument -> a new executable, observed via lowering
    cfg = tiny_cfg
    ref = jnp.zeros((2, cfg.output_chunk_length), jnp.complex64)
    n0 = pl._clutter_jit._cache_size()
    pl.clutter_batch(ref, ref, cfg)
    n1 = pl._clutter_jit._cache_size()
    pl.clutter_batch(ref, ref, cfg)
    assert pl._clutter_jit._cache_size() == n1  # same routing: cache hit
    monkeypatch.setenv("PASSIVERADAR_MXU_FFT", "1")
    pl.clutter_batch(ref, ref, cfg)
    assert pl._clutter_jit._cache_size() == n1 + 1, (
        "flipped env gate did not retrace")
    assert n1 == n0 + 1


def test_strict_parity_metadata_replicates_reference_axes(tiny_cfg, tmp_path):
    """Under strict_frame_parity the .npz axes must byte-match what the
    reference writes (main.py:200-206), INCLUDING its doubled doppler_bins
    axis (a factor-of-2 metadata bug, replicated only in strict mode)."""
    import dataclasses

    cfg = tiny_cfg
    nfr = 5
    # reference oracle, transcribed from /root/reference/main.py:200-206
    # (xambg.shape = (num_doppler_cells, num_range_cells+1, frames))
    ref_ts = np.arange(nfr) * cfg.frame_interval
    ref_rb = np.arange(cfg.num_range_cells + 1) * cfg.range_cell_width
    ref_db = np.arange(-cfg.num_doppler_cells,
                       cfg.num_doppler_cells) * cfg.doppler_cell_width

    strict = dataclasses.replace(cfg, strict_frame_parity=True)
    p = str(tmp_path / "meta_strict.npz")
    write_metadata(strict, nfr, p)
    z = np.load(p)
    np.testing.assert_array_equal(z["frame_timestamps"], ref_ts)
    np.testing.assert_array_equal(z["range_bins"], ref_rb)
    np.testing.assert_array_equal(z["doppler_bins"], ref_db)

    # default mode writes the CORRECT axis: num_doppler_cells rows, zero
    # Doppler exactly at the centre row
    p2 = str(tmp_path / "meta_default.npz")
    write_metadata(cfg, nfr, p2)
    db = np.load(p2)["doppler_bins"]
    assert db.shape == (cfg.num_doppler_cells,)
    assert db[cfg.num_doppler_cells // 2] == 0.0
