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
