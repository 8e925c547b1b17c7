"""Detection & tracking: CFAR, Kalman, measurements, trackers, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from passiveradar_tpu.detect.kalman import (
    adaptive_kalman_update,
    default_kalman_state,
    kalman_extrapolate,
    kalman_update,
)
from passiveradar_tpu.detect.measurements import get_measurements
from passiveradar_tpu.detect.trackers import (
    multitarget_tracker,
    simple_target_tracker,
)
from passiveradar_tpu.ops.cfar import cfar_2d, cfar_kernel
from passiveradar_tpu.viz.persistence import persistence, persistence_stack


# ---------------------------------------------------------------- CFAR

def cfar_oracle(x, fw, gw):
    t = cfar_kernel(fw, gw)
    norm = x / np.mean(np.abs(x))
    return norm / (sps.convolve2d(x, t, mode="same", boundary="wrap") + 1e-10)


@pytest.mark.parametrize("fw,gw", [(18, 4), (9, 3)])
def test_cfar_matches_scipy(rng, fw, gw):
    x = rng.random((64, 40)).astype(np.float32) + 0.1
    got = np.asarray(cfar_2d(x, fw, gw))
    want = cfar_oracle(x.astype(np.float64), fw, gw)
    assert np.max(np.abs(got - want)) < 1e-3 * np.max(np.abs(want))


def test_cfar_batched_equals_per_frame(rng):
    x = rng.random((3, 32, 24)).astype(np.float32) + 0.1
    got = np.asarray(cfar_2d(x, 9, 3))
    for i in range(3):
        single = np.asarray(cfar_2d(x[i], 9, 3))
        assert np.allclose(got[i], single, rtol=1e-5, atol=1e-5)


def test_cfar_threshold_mode(rng):
    x = rng.random((32, 24)).astype(np.float32) + 0.1
    m = np.asarray(cfar_2d(x, 9, 3, thresh=2.0))
    assert m.dtype == bool


def test_cfar_detects_bright_point(rng):
    x = (rng.random((64, 48)) * 0.1 + 1.0).astype(np.float32)
    x[30, 20] = 50.0
    cr = np.asarray(cfar_2d(x, 18, 4))
    assert np.unravel_index(np.argmax(cr), cr.shape) == (30, 20)


# ---------------------------------------------------------------- Kalman

def kalman_oracle(meas, st, r_scale=1.0):
    x, p = st["x"], st["P"]
    f1, f2, q, h, r = st["F1"], st["P"] * 0, st["Q"], st["H"], st["R"]
    f2 = st["F2"]
    x = f1 @ x
    p = f2 @ p @ f2.T + q
    s = h @ p @ h.T + r * r_scale
    k = p @ h.T @ np.linalg.inv(s)
    x = x + k @ (meas - h @ x)
    p = (np.eye(4) - k @ h) @ p
    return h @ x, x, p, s


def _np_state(st):
    return {k: np.asarray(v, np.float64) for k, v in st.items()}


def test_kalman_update_matches_oracle():
    st = default_kalman_state(10.0, -5.0)
    meas = np.array([11.0, -4.0], np.float32)
    est, new = kalman_update(meas, st)
    oest, ox, op, os_ = kalman_oracle(meas.astype(np.float64), _np_state(st))
    assert np.allclose(np.asarray(est), oest, atol=1e-3)
    assert np.allclose(np.asarray(new["x"]), ox, atol=1e-3)
    assert np.allclose(np.asarray(new["P"]), op, atol=1e-3)
    assert np.allclose(np.asarray(new["S"]), os_, atol=1e-3)


def test_adaptive_kalman_update_matches_oracle():
    st = default_kalman_state(10.0, -5.0)
    meas = np.array([12.0, -6.0], np.float32)
    last = np.array([10.0, -5.0], np.float32)
    est, new = adaptive_kalman_update(meas, last, st)
    d = meas - last
    oest, ox, op, os_ = kalman_oracle(meas.astype(np.float64), _np_state(st),
                                      r_scale=float(d[0] ** 2 + d[1] ** 2))
    assert np.allclose(np.asarray(est), oest, atol=1e-3)
    assert np.allclose(np.asarray(new["P"]), op, atol=1e-3)


def test_kalman_extrapolate_advances_state():
    st = default_kalman_state(10.0, -5.0)
    est, new = kalman_extrapolate(st)
    x = np.asarray(st["F1"]) @ np.asarray(st["x"])
    assert np.allclose(np.asarray(est), np.asarray(st["H"]) @ x, atol=1e-5)


# ------------------------------------------------------- measurements

def _frame_with_target(rng, nf, nr, r_km, d_hz, d_ext, r_ext, amp=60.0):
    """Raw pipeline-orientation frame with a synthetic target."""
    x = (rng.random((nf, nr)) * 0.2 + 1.0).astype(np.float32)
    k = int(round((1 - r_km / r_ext) * (nr - 1)))
    j = int(round((d_hz + d_ext) / (2 * d_ext) * (nf - 1)))
    x[nf - 1 - j, k] = amp
    return x


def test_get_measurements_finds_target(rng):
    nf, nr = 64, 40
    d_ext, r_ext = 32.0, 100.0
    x = _frame_with_target(rng, nf, nr, 42.0, 10.0, d_ext, r_ext)
    cand, valid = get_measurements(x, (d_ext, r_ext), k_max=64)
    cand = np.asarray(cand)
    assert bool(np.asarray(valid)[0])
    # strongest candidate is the target, within a bin of truth
    assert abs(cand[0, 0] - 42.0) < r_ext / (nr - 1) + 1e-3
    assert abs(cand[1, 0] - 10.0) < 2 * d_ext / (nf - 1) + 1e-3


def test_get_measurements_zeroes_clutter_regions(rng):
    nf, nr = 64, 40
    x = (rng.random((nf, nr)) * 0.1 + 1.0).astype(np.float32)
    x[nf // 2, :] = 100.0   # zero-Doppler ridge must be suppressed
    x[:, nr - 1] = 100.0    # short-range rows land in the 8-row edge zone
    cand, valid = get_measurements(x, (32.0, 100.0), k_max=32)
    cand, valid = np.asarray(cand), np.asarray(valid)
    assert not np.any(cand[2][valid] >= 99.0)


# ----------------------------------------------------------- trackers

def test_multitarget_tracker_confirms_and_follows(rng):
    nf, nr, n_frames = 64, 40, 30
    d_ext, r_ext = 32.0, 100.0
    frames = np.zeros((n_frames, nf, nr), np.float32)
    truth = []
    for t in range(n_frames):
        r = 60.0 - 0.5 * t
        d = 8.0
        frames[t] = _frame_with_target(rng, nf, nr, r, d, d_ext, r_ext)
        truth.append((r, d))
    hist = multitarget_tracker(frames, (d_ext, r_ext), n_tracks=5, k_max=64,
                               frames_last=False)
    status = np.asarray(hist["status"])          # (F, N)
    est = np.asarray(hist["estimate"])           # (F, N, 2)
    assert np.any(status[-1] == 2), "no confirmed track at the end"
    ti = int(np.argmax(status[-1] == 2))
    r_true, d_true = truth[-1]
    assert abs(est[-1, ti, 0] - r_true) < 8.0
    assert abs(est[-1, ti, 1] - d_true) < 6.0


def test_multitarget_tracker_two_targets(rng):
    nf, nr, n_frames = 64, 40, 25
    d_ext, r_ext = 32.0, 100.0
    frames = np.zeros((n_frames, nf, nr), np.float32)
    for t in range(n_frames):
        f = _frame_with_target(rng, nf, nr, 70.0, 12.0, d_ext, r_ext)
        f2 = _frame_with_target(rng, nf, nr, 30.0, -15.0, d_ext, r_ext)
        frames[t] = np.maximum(f, f2)
    hist = multitarget_tracker(frames, (d_ext, r_ext), n_tracks=6, k_max=64,
                               frames_last=False)
    status = np.asarray(hist["status"])
    est = np.asarray(hist["estimate"])
    confirmed = np.where(status[-1] == 2)[0]
    assert len(confirmed) >= 2
    ranges = sorted(est[-1, confirmed, 0])
    assert any(abs(r - 30.0) < 8 for r in ranges)
    assert any(abs(r - 70.0) < 8 for r in ranges)


def test_multitarget_tracker_accepts_reference_layout(rng):
    nf, nr, n_frames = 64, 40, 6
    frames = rng.random((nf, nr, n_frames)).astype(np.float32)
    hist = multitarget_tracker(frames, (32.0, 100.0), n_tracks=3, k_max=32)
    assert np.asarray(hist["status"]).shape == (n_frames, 3)


def test_ambiguous_orientation_is_an_error(rng):
    """A frame count rivaling the map dimensions must raise, not silently
    guess (a wrong orientation produces garbage tracks)."""
    frames = rng.random((50, 64, 40)).astype(np.float32)
    with pytest.raises(ValueError, match="frames_last"):
        multitarget_tracker(frames, (32.0, 100.0), n_tracks=3, k_max=32)
    # ...and the reference FM geometry itself is ambiguous by this rule
    ref_shape = rng.random((64, 11, 75)).astype(np.float32)
    with pytest.raises(ValueError, match="frames_last"):
        simple_target_tracker(ref_shape, 100.0, 32.0)
    # explicit orientation always works
    hist = multitarget_tracker(frames, (32.0, 100.0), n_tracks=3, k_max=32,
                               frames_last=False)
    assert np.asarray(hist["status"]).shape == (50, 3)


def test_simple_tracker_locks_onto_target(rng):
    nf, nr, n_frames = 64, 48, 30
    d_ext, r_ext = 32.0, 100.0
    frames = np.zeros((n_frames, nf, nr), np.float32)
    for t in range(n_frames):
        frames[t] = _frame_with_target(rng, nf, nr, 50.0, 6.0, d_ext, r_ext,
                                       amp=100.0)
    hist = simple_target_tracker(frames, r_ext, d_ext, frames_last=False)
    lock = np.asarray(hist["lock_mode"])       # (F, 4)
    meas = np.asarray(hist["measurement"])     # (F, 2)
    assert lock[-1, 2] == 1, "tracker failed to reach the locked state"
    assert abs(meas[-1, 0] - 50.0) < 5.0
    assert abs(meas[-1, 1] - 6.0) < 3.0


def _simple_strict_oracle(data, range_extent, doppler_extent):
    """Numpy transcription of the reference simple-tracker frame loop
    (/root/reference/passiveRadar/target_detection.py:539-681), literal
    behaviors included: Python-slice measurement gates (negative starts
    silently yield empty gates) and the hard-coded cols-250:260 zeroing.
    data: (nf_doppler, nr_range, F) stack as the reference loads it."""
    n_frames = data.shape[2]
    st = dict(
        x=np.array([30.0, 2.0, -20.0, -1.0]),
        P=np.diag([5.0, 0.0225, 0.04, 0.1]),
        F1=np.array([[1, 0, -0.003, 0], [0, 0, -0.003, -0.03],
                     [0, 0, 1, 1], [0, 0, 0, 1]], np.float64),
        F2=np.array([[1, 1, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 1], [0, 0, 0, 1]], np.float64),
        Q=np.diag([2.0, 0.02, 0.2, 0.05]),
        H=np.array([[1, 0, 0, 0], [0, 0, 1, 0]], np.float64),
        R=np.diag([5.0, 5.0]),
    )
    lock = np.array([1.0, 0.0, 0.0, 0.0])
    estimate = st["H"] @ st["x"]
    measurement = np.array([35.0, -30.0])
    ly, lx = 50, 50
    t_found = np.array([[0, 1, 0, 0], [0, 0, 1, 0],
                        [0, 0, 1, 0], [0, 0, 1, 0]], np.float64).T
    t_lost = np.array([[1, 0, 0, 0], [1, 0, 0, 0],
                       [0, 0, 0, 1], [1, 0, 0, 0]], np.float64).T
    hist = []
    for i in range(n_frames):
        fr = data[:, :, i].astype(np.float64)
        fr = fr / np.mean(np.abs(fr))
        fr = np.fliplr(fr.T).copy()
        fr[:8, :] = 0.0
        fr[-8:, :] = 0.0
        fr[:, 250:260] = 0.0
        if lock[1] == 1 or lock[3] == 1:
            g = np.zeros_like(fr)
            g[ly - 24:ly + 24, lx - 48:lx + 48] = 1.0
            fr = fr * g
        elif lock[2] == 1:
            g = np.zeros_like(fr)
            g[ly - 16:ly + 16, lx - 32:lx + 32] = 1.0
            fr = fr * g
        iy, ix = np.unravel_index(np.argmax(fr), fr.shape)
        meas = np.array([range_extent * (1.0 - iy / fr.shape[0]),
                         doppler_extent * (2.0 * ix / fr.shape[1] - 1.0)])
        sur = meas - estimate
        found = np.sqrt(sur[0] ** 2 + (0.5 * sur[1]) ** 2) < 12
        lock = (t_found if found else t_lost) @ lock
        d = meas - measurement
        estimate, st["x"], st["P"], _ = kalman_oracle(
            meas, st, r_scale=float(d[0] ** 2 + d[1] ** 2))
        measurement = meas
        ly, lx = int(iy), int(ix)
        hist.append((lock.copy(), measurement.copy(), (ly, lx),
                     estimate.copy()))
    return hist


def test_simple_tracker_strict_matches_reference_oracle(rng):
    """strict=True must be frame-for-frame identical to the reference loop
    on the author's ~300x512 geometry, including the negative-index
    empty-gate quirk (target drifting above row 24 kills the gate entirely)
    and the literal cols-250:260 clutter zeroing (a decoy spike there must
    never be measured)."""
    nf, nr = 512, 300
    # oriented frame is fliplr(data[:,:,i].T): oriented (row r, col c) maps
    # to data[nf-1-c, r]. Phase 1: a stationary target at row 12 — the
    # adaptive-R Kalman estimate converges (d->0 => R->0), the tracker
    # locks, and the FIRST gated frame's Python slice [12-24:12+24] gets a
    # negative start => EMPTY gate (the quirk). Phase 2: stationary at row
    # 60 — lock-on again with valid (non-empty) 24/48 then 16/32 gates.
    # A permanent decoy sits in the zeroed cols-250:260 band.
    rows = [12] * 7 + [60] * 8
    n_frames = len(rows)
    data = (0.2 + rng.random((nf, nr, n_frames)) * 0.5).astype(np.float32)
    for i in range(n_frames):
        data[nf - 1 - 300, rows[i], i] = 50.0
        data[nf - 1 - 255, 100, i] = 100.0      # decoy inside cols 250:260
    got = simple_target_tracker(jnp.asarray(data), 375.0, 256.0 / 1.092,
                                frames_last=True, strict=True)
    want = _simple_strict_oracle(data, 375.0, 256.0 / 1.092)
    lock = np.asarray(got["lock_mode"])
    meas = np.asarray(got["measurement"])
    idx = np.asarray(got["meas_idx"])
    est = np.asarray(got["estimate"])
    for i, (wl, wm, wi, we) in enumerate(want):
        np.testing.assert_array_equal(lock[i], wl, err_msg=f"frame {i}")
        assert tuple(idx[i]) == wi, (i, tuple(idx[i]), wi)
        np.testing.assert_allclose(meas[i], wm, atol=1e-3, err_msg=f"f{i}")
        np.testing.assert_allclose(est[i], we, atol=2e-2, err_msg=f"f{i}")
    # the quirk really fired: some frame measured the all-zero frame origin
    assert any(tuple(idx[i]) == (0, 0) for i in range(n_frames)), \
        "expected the empty-gate quirk to produce an origin measurement"
    # ... and a fully-locked (16/32) non-empty gate was also exercised
    assert any(want[i][0][2] == 1 and tuple(idx[i]) == (60, 300)
               for i in range(n_frames)), "no fully-locked gated frame"
    # the decoy in the zeroed band was never measured
    assert not any(wi == (100, 255) for _, _, wi, _ in want)


# -------------------------------------------------------- persistence

def persistence_oracle(x, k, hold, decay):
    frame = np.zeros((x.shape[0], x.shape[1]))
    n = min(k + 1, hold)
    for i in range(n):
        if k - i >= 0:
            frame = frame + x[:, :, k - i] * decay ** i
    return frame


def test_persistence_matches_oracle(rng):
    x = rng.random((8, 6, 12)).astype(np.float32)
    for k in [0, 3, 11]:
        got = np.asarray(persistence(x, k, hold=5, decay=0.9))
        want = persistence_oracle(x, k, 5, 0.9)
        assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_persistence_stack_matches_single(rng):
    x = rng.random((8, 6, 12)).astype(np.float32)
    stack = np.asarray(persistence_stack(np.moveaxis(x, 2, 0), hold=5, decay=0.9))
    for k in range(12):
        want = persistence_oracle(x, k, 5, 0.9)
        assert np.allclose(stack[k], want, rtol=1e-5, atol=1e-6)


def test_streaming_display_frames_exact(rng):
    """iter_display_frames (bounded-memory renderer path) must reproduce the
    materialised prepare_display_frames exactly at every chunk size,
    including chunks smaller than the persistence hold (warm-up carry)."""
    from passiveradar_tpu.viz.render import (iter_display_frames,
                                             prepare_display_frames)
    x = rng.random((8, 6, 23)).astype(np.float32)
    want = prepare_display_frames(x, hold=5, decay=0.9)
    for chunk in (1, 3, 5, 8, 23, 64):
        got = np.stack(list(iter_display_frames(x, hold=5, decay=0.9,
                                                chunk=chunk)))
        assert got.shape == want.shape
        assert np.allclose(got, want, rtol=1e-5, atol=1e-6), chunk
    # hold=1 (no memory) edge case
    w1 = prepare_display_frames(x, hold=1, decay=0.5)
    g1 = np.stack(list(iter_display_frames(x, hold=1, decay=0.5, chunk=4)))
    assert np.allclose(g1, w1, rtol=1e-5, atol=1e-6)


def test_lazy_cfar_slices_match_full_stack(rng):
    """cli.plot.LazyCFAR chunk slices == CFAR of the whole stack, sliced."""
    from passiveradar_tpu.cli.plot import LazyCFAR, cfar_stack
    x = (rng.random((32, 24, 9)) + 0.1).astype(np.float32)
    full = cfar_stack(x, fw=6, gw=2)
    lazy = LazyCFAR(x, fw=6, gw=2)
    assert lazy.shape == x.shape
    got = np.concatenate([lazy[:, :, s:s + 4] for s in range(0, 9, 4)],
                         axis=2)
    assert np.allclose(got, full, rtol=1e-5, atol=1e-6)


def test_track_coasts_then_dies_when_target_vanishes(rng):
    """Lifecycle: confirm on a persistent target, then coast (extrapolate) and
    kill the track once the measurement history dries up
    (reference update_track kill rules, target_detection.py:434-447)."""
    nf, nr = 64, 40
    d_ext, r_ext = 32.0, 100.0
    frames = []
    for t in range(20):
        frames.append(_frame_with_target(rng, nf, nr, 55.0, 10.0, d_ext, r_ext))
    for t in range(30):  # target gone: pure noise frames
        frames.append((rng.random((nf, nr)) * 0.2 + 1.0).astype(np.float32))
    frames = np.stack(frames)
    hist = multitarget_tracker(frames, (d_ext, r_ext), n_tracks=4, k_max=64,
                               frames_last=False)
    status = np.asarray(hist["status"])
    est = np.asarray(hist["estimate"])
    # confirmed at some point while the target persists...
    assert np.any(status[5:20] == 2)
    # ...and the target's confirmed track is gone at the end: no confirmed
    # track remains near (55 km, 10 Hz). (Noise peaks can still cycle other
    # slots through brief confirmations — the reference's optimistic
    # measurement-history seed makes that possible by design,
    # target_detection.py:388-390.)
    near_target = ((status[-1] == 2)
                   & (np.abs(est[-1, :, 0] - 55.0) < 10)
                   & (np.abs(est[-1, :, 1] - 10.0) < 10))
    assert not np.any(near_target)


def test_simple_tracker_unlocks_on_target_loss(rng):
    nf, nr = 64, 48
    d_ext, r_ext = 32.0, 100.0
    frames = [
        _frame_with_target(rng, nf, nr, 50.0, 6.0, d_ext, r_ext, amp=100.0)
        for _ in range(20)]
    frames += [(rng.random((nf, nr)) * 0.2 + 1.0).astype(np.float32)
               for _ in range(20)]
    hist = simple_target_tracker(np.stack(frames), r_ext, d_ext,
                                 frames_last=False)
    lock = np.asarray(hist["lock_mode"])
    assert lock[19, 2] == 1          # locked while target present
    assert lock[-1, 0] == 1          # back to unlocked after loss
