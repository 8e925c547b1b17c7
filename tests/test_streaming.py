"""Streaming mode: push-at-a-time results must match the offline batch run."""

import numpy as np
import pytest

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.synthetic import Target, synth_capture_arrays
from passiveradar_tpu.streaming import StreamingProcessor

from tests.test_pipeline import TINY, _make_frames


@pytest.fixture(scope="module")
def tiny_cfg():
    return derive_config(TINY)


def test_streaming_matches_batch(tiny_cfg):
    import jax.numpy as jnp
    from passiveradar_tpu.pipeline import frame_phases, process_frames

    cfg = tiny_cfg
    n_frames = 5
    ref, srv = _make_frames(cfg, n_frames, (Target(40, 20.0, 0.12),))

    batch = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv),
        jnp.asarray(frame_phases(cfg, list(range(n_frames)))), cfg)))

    sp = StreamingProcessor(cfg, n_tracks=4)
    results = []
    for f in range(n_frames):
        out = sp.push(ref[f], srv[f])
        if out is not None:
            results.append(out)
    results.append(sp.flush())

    assert [r.frame_index for r in results] == list(range(n_frames))
    for r in results:
        got = np.abs(r.caf)
        want = batch[r.frame_index]
        assert np.max(np.abs(got - want)) < 1e-3 * np.max(want), r.frame_index


@pytest.mark.parametrize("variant", ["no_overlap", "flattop"])
def test_streaming_matches_batch_variants(variant):
    """Streaming must honor overlap_cpi=False and caf_short_filt=False."""
    import dataclasses

    import jax.numpy as jnp
    from passiveradar_tpu.pipeline import frame_phases, process_frames

    params = dict(TINY)
    if variant == "no_overlap":
        params["overlap_cpi"] = False
    cfg = derive_config(params)
    if variant == "flattop":
        cfg = dataclasses.replace(cfg, caf_short_filt=False)
    n_frames = 3
    ref, srv = _make_frames(cfg, n_frames, (Target(40, 20.0, 0.12),))

    batch = np.abs(np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv),
        jnp.asarray(frame_phases(cfg, list(range(n_frames)))), cfg)))

    sp = StreamingProcessor(cfg, n_tracks=4)
    results = []
    for f in range(n_frames):
        out = sp.push(ref[f], srv[f])
        if out is not None:
            results.append(out)
    results.append(sp.flush())

    assert [r.frame_index for r in results] == list(range(n_frames))
    for r in results:
        got = np.abs(r.caf)
        want = batch[r.frame_index]
        assert np.max(np.abs(got - want)) < 1e-3 * np.max(want), r.frame_index


def test_streaming_uses_scaled_candidate_budget(tiny_cfg, monkeypatch):
    """The streaming tracker must use the same scaled candidate pool as the
    offline CLI (cfg.candidate_budget), not raw max_measurements — on the FM
    geometry (1024×176) the 99.8th-percentile pool overflows 384 slots."""
    import dataclasses

    import passiveradar_tpu.streaming as streaming_mod

    # choose max_measurements so budget and raw value differ for TINY
    cfg = dataclasses.replace(tiny_cfg, max_measurements=7)
    assert cfg.candidate_budget != cfg.max_measurements

    seen = []
    real_step = streaming_mod.multitarget_step

    def spy(tracks, cf, extent, n_tracks, k_max):
        seen.append(k_max)
        return real_step(tracks, cf, extent, n_tracks, k_max)

    monkeypatch.setattr(streaming_mod, "multitarget_step", spy)
    ref, srv = _make_frames(cfg, 2, (Target(40, 20.0, 0.12),))
    sp = StreamingProcessor(cfg, n_tracks=4)
    sp.push(ref[0], srv[0])
    sp.push(ref[1], srv[1])
    assert seen == [cfg.candidate_budget]


def test_streaming_summary_mode(tiny_cfg):
    """detail="summary" must skip the map/table fetch (caf/cfar/tracks None),
    return the packed track summary matching the full-mode track table, and
    keep the maps fetchable on demand via fetch_maps()."""
    cfg = tiny_cfg
    n_frames = 4
    ref, srv = _make_frames(cfg, n_frames, (Target(40, 20.0, 0.12),))

    full = StreamingProcessor(cfg, n_tracks=4)
    light = StreamingProcessor(cfg, n_tracks=4, detail="summary")
    for f in range(n_frames):
        want = full.push(ref[f], srv[f])
        got = light.push(ref[f], srv[f])
        if want is None:
            assert got is None
            continue
        assert got.caf is None and got.cfar is None and got.tracks is None
        assert got.frame_index == want.frame_index
        np.testing.assert_array_equal(got.summary["status"],
                                      want.tracks["status"])
        np.testing.assert_array_equal(got.summary["lifetime"],
                                      want.tracks["lifetime"])
        np.testing.assert_allclose(got.summary["estimate"],
                                   want.tracks["estimate"], rtol=1e-6)
        np.testing.assert_allclose(got.summary["measurement"],
                                   want.tracks["measurement"], rtol=1e-6)
        caf, cf = light.fetch_maps()
        np.testing.assert_allclose(np.abs(caf), np.abs(want.caf), rtol=1e-5,
                                   atol=1e-6 * np.max(np.abs(want.caf)))
        np.testing.assert_allclose(cf, want.cfar, rtol=1e-5, atol=1e-5)
    # per-push override works both directions
    got = light.flush(detail="full")
    want = full.flush()
    assert got.caf is not None and got.summary is None
    np.testing.assert_array_equal(got.tracks["status"],
                                  want.tracks["status"])


def test_streaming_accepts_device_resident_input(tiny_cfg):
    """push() with jax Arrays must not round-trip through host numpy and
    must produce the same results as the host-array path."""
    import jax.numpy as jnp

    cfg = tiny_cfg
    ref, srv = _make_frames(cfg, 3, (Target(40, 20.0, 0.12),))
    host = StreamingProcessor(cfg, n_tracks=4)
    dev = StreamingProcessor(cfg, n_tracks=4)
    for f in range(3):
        want = host.push(ref[f], srv[f])
        got = dev.push(jnp.asarray(ref[f]), jnp.asarray(srv[f]))
        if want is None:
            assert got is None
            continue
        np.testing.assert_allclose(np.abs(got.caf), np.abs(want.caf),
                                   rtol=1e-5,
                                   atol=1e-6 * np.max(np.abs(want.caf)))


def test_streaming_tracker_locks(tiny_cfg):
    cfg = tiny_cfg
    n_frames = 14
    tgt = Target(40, 20.0, 0.3)
    ref, srv = _make_frames(cfg, n_frames, (tgt,), seed=7)
    sp = StreamingProcessor(cfg, n_tracks=4)
    last = None
    for f in range(n_frames):
        out = sp.push(ref[f], srv[f])
        if out is not None:
            last = out
    last = sp.flush()
    status = last.tracks["status"]
    assert np.any(status > 0), "no track ever initialised in streaming mode"
