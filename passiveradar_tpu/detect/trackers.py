"""Kalman target trackers as fixed-shape lax.scan programs.

The reference trackers (target_detection.py:455-526, 626-681) are Python
frame loops over structured numpy records with data-dependent control flow
(variable-length candidate lists, per-status branches, in-place pool
consumption). Here the same association logic is expressed with masks and
argmax/argmin selections over a fixed-size candidate table, so whole tracking
runs compile to a single XLA program (scan over frames, scan over track
slots) and can run on device right after the CFAR stage.

Documented behavioral notes (quirks preserved or deliberately diverged):
  * association gates, priorities and promotion/kill rules match the
    reference, including its quirk that a preliminary track with several
    gated candidates picks the one nearest the *origin* (reference
    target_detection.py:329), and that status rules read the *pre-update*
    measurement history (reference target_detection.py:436-446).
  * the simple tracker's hard-coded "cols 250:260" clutter zeroing (reference
    target_detection.py:673, valid only for the author's 512-bin frames) is
    generalised to ±5 Doppler columns around the centre.
  * the simple tracker's rectangular gates clamp at frame edges instead of
    inheriting Python's negative-index slicing behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from passiveradar_tpu.detect.kalman import (
    adaptive_kalman_update,
    default_kalman_state,
    kalman_extrapolate,
)
from passiveradar_tpu.detect.measurements import get_measurements

N_HISTORY = 20


def _select(pred, a, b):
    """Elementwise pytree select: pred ? a : b (pred is a scalar bool)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _inv2(m):
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    return jnp.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det


# --------------------------------------------------------------------------
# track table
# --------------------------------------------------------------------------

def _seed_history():
    h = np.zeros(N_HISTORY, np.float32)
    h[0] = 1
    h[5:10] = 1  # the reference's optimistic seed (target_detection.py:388-390)
    return jnp.asarray(h)


def make_track(measurement=None):
    """One track record (reference initialize_track, target_detection.py:350-396)."""
    if measurement is None:
        r = jnp.float32(0.0)
        f = jnp.float32(0.0)
        status = jnp.int32(0)
    else:
        r, f = measurement[0], measurement[1]
        status = jnp.int32(1)
    m = jnp.stack([r, f]).astype(jnp.float32)
    return dict(
        status=status,
        lifetime=jnp.int32(1),
        measurement=m,
        estimate=m,
        history=_seed_history(),
        kalman=default_kalman_state(r, f),
    )


def init_tracks(n_tracks: int):
    one = make_track(None)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_tracks,) + a.shape), one)


# --------------------------------------------------------------------------
# association (reference associate_measurements, target_detection.py:231-348)
# --------------------------------------------------------------------------

def _associate(track, cand, avail):
    """Pick a measurement for one track from the shared candidate pool.

    cand: (3, K) strength-sorted [range, doppler, strength]; avail: (K,) bool.
    Returns (measurement(2,), found(bool), new_avail(K,)).
    """
    r, d = cand[0], cand[1]
    status = track["status"]
    lm, le = track["measurement"], track["estimate"]

    gate_prelim = (jnp.abs(r - lm[0]) < 5) & (jnp.abs(d - lm[1]) < 24)
    gate_conf = (jnp.abs(r - le[0]) < 4) & (jnp.abs(d - le[1]) < 20)
    early = jnp.where(status == 0, True,
                      jnp.where(status == 1, gate_prelim, gate_conf))
    pool = early & avail

    # Mahalanobis validation gate for confirmed tracks (zᵀS⁻¹z < 6, centred
    # on the last measurement — reference target_detection.py:284-294)
    sinv = _inv2(track["kalman"]["S"])
    zr, zd = lm[0] - r, lm[1] - d
    m2 = zr * (sinv[0, 0] * zr + sinv[0, 1] * zd) \
        + zd * (sinv[1, 0] * zr + sinv[1, 1] * zd)
    gated = jnp.where(status == 2, pool & (m2 < 6), pool)

    count = jnp.sum(gated)
    found = count > 0

    # strongest = first True in the strength-sorted order
    first_gated = jnp.argmax(gated)
    # preliminary tracks pick the candidate nearest the origin (quirk kept)
    dist = jnp.where(gated, jnp.sqrt(r ** 2 + d ** 2), jnp.inf)
    nearest = jnp.argmin(dist)
    choice = jnp.where(status == 1, nearest, first_gated)
    meas = jnp.stack([r[choice], d[choice]])

    # pool consumption: free tracks with several candidates remove everything
    # within 10 km / 12 Hz of the chosen one; free tracks with exactly one
    # candidate clear the pool (the reference's all-ones earlyGate); tracked
    # states remove their early gate.
    rm_free_multi = (jnp.abs(r - meas[0]) < 10) & (jnp.abs(d - meas[1]) < 12)
    rm_free = jnp.where(count > 1, rm_free_multi, jnp.ones_like(early))
    removal = jnp.where(status == 0, rm_free, early)
    new_avail = jnp.where(found, avail & ~removal, avail)
    return meas, found, new_avail


# --------------------------------------------------------------------------
# per-track update (reference update_track, target_detection.py:398-453)
# --------------------------------------------------------------------------

def _update_track(track, meas, found):
    est_u, kal_u = adaptive_kalman_update(meas, track["measurement"],
                                          track["kalman"])
    est_e, kal_e = kalman_extrapolate(track["kalman"])
    new_est = jnp.where(found, est_u, est_e)
    new_kal = _select(found, kal_u, kal_e)
    new_meas = jnp.where(found, meas, track["measurement"])
    new_hist = jnp.concatenate(
        [jnp.where(found, 1.0, 0.0)[None].astype(jnp.float32),
         track["history"][:-1]])

    # status rules use the pre-update history, as the reference does
    hist, lifetime, status = track["history"], track["lifetime"], track["status"]
    old_enough = lifetime > 4
    s10 = jnp.sum(hist[:10])
    s20 = jnp.sum(hist)
    prelim_next = jnp.where(old_enough & (s10 < 6), 0,
                            jnp.where(old_enough & (s10 > 8), 2, 1))
    conf_next = jnp.where(old_enough & (s20 < 4), 0, 2)
    new_status = jnp.where(status == 1, prelim_next,
                           jnp.where(status == 2, conf_next, status))

    return dict(
        status=new_status.astype(jnp.int32),
        lifetime=lifetime + 1,
        measurement=new_meas,
        estimate=new_est,
        history=new_hist,
        kalman=new_kal,
    )


def _track_transition(track, meas, found):
    """Full per-slot transition: free tracks initialise on a measurement and
    are otherwise untouched; live tracks run the update/extrapolate path."""
    fresh = make_track(meas)
    updated = _update_track(track, meas, found)
    is_free = track["status"] == 0
    free_next = _select(found, fresh, track)
    return _select(is_free, free_next, updated)


# --------------------------------------------------------------------------
# frame loops
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_tracks", "k_max"))
def multitarget_step(tracks, frame, frame_extent, n_tracks: int, k_max: int):
    """One tracker update from one CFAR frame (the streaming-mode entry
    point; the batch tracker scans this over a frame stack)."""
    slot_ids = jnp.arange(n_tracks)
    cand, valid = get_measurements(frame, frame_extent, k_max)
    # processing priority: confirmed → preliminary → free, stable by
    # index within each class (reference target_detection.py:494-521)
    prio = jnp.where(tracks["status"] == 2, 0,
                     jnp.where(tracks["status"] == 1, 1, 2))
    order = jnp.argsort(prio * n_tracks + slot_ids)

    def slot_body(carry, s):
        trks, avail = carry
        i = order[s]
        tr = jax.tree.map(lambda a: a[i], trks)
        meas, found, avail = _associate(tr, cand, avail)
        new_tr = _track_transition(tr, meas, found)
        trks = jax.tree.map(lambda a, v: a.at[i].set(v), trks, new_tr)
        return (trks, avail), None

    (tracks, _), _ = jax.lax.scan(slot_body, (tracks, valid), slot_ids)
    return tracks


@functools.partial(jax.jit, static_argnames=("n_tracks", "k_max"))
def _multitarget_scan(frames, frame_extent, n_tracks: int, k_max: int):
    tracks0 = init_tracks(n_tracks)

    def frame_step(tracks, frame):
        tracks = multitarget_step(tracks, frame, frame_extent, n_tracks,
                                  k_max)
        return tracks, tracks

    _, history = jax.lax.scan(frame_step, tracks0, frames)
    return history


def _orient_stack(data, frames_last):
    """Normalise a frame stack to frames-first.

    frames_last=None guesses ONLY when unambiguous: the candidate frame
    axis (first or last) must be at most half of both map dimensions of its
    interpretation, and only one interpretation may qualify. Anything else
    raises — a silently wrong orientation produces garbage tracks, so an
    ambiguous stack (frame count rivaling a map dimension, e.g. the
    reference FM geometry's (1024, 176, 1200)) requires an explicit
    frames_last from the caller. The CLI surfaces always pass it.
    """
    data = jnp.asarray(data, jnp.float32)
    if data.ndim != 3:
        raise ValueError("expected a 3-D frame stack")
    if frames_last is None:
        last_ok = data.shape[2] * 2 <= min(data.shape[0], data.shape[1])
        first_ok = data.shape[0] * 2 <= min(data.shape[1], data.shape[2])
        if last_ok == first_ok:
            raise ValueError(
                f"cannot infer frame-stack orientation for shape "
                f"{tuple(data.shape)} — the frame count rivals the map "
                "dimensions; pass frames_last explicitly (True for the "
                "reference (doppler, range, frames) file layout)")
        frames_last = last_ok
    if frames_last:
        data = jnp.moveaxis(data, 2, 0)
    return data


def multitarget_tracker(data, frame_extent, n_tracks: int = 10,
                        k_max: int = 384, frames_last: bool | None = None):
    """Track up to ``n_tracks`` targets through a stack of range-Doppler maps.

    data: (num_doppler, num_range, num_frames) — the reference's file layout
    (target_detection.py:455-526, pass frames_last=True) — or
    (num_frames, num_doppler, num_range) (frames_last=False). The default
    guesses from the shapes (see _orient_stack).
    frame_extent: (max_doppler_hz, max_range_km).

    Returns a dict of arrays with leading axes (num_frames, n_tracks):
    status, lifetime, measurement, estimate, history, kalman.*.
    """
    data = _orient_stack(data, frames_last)
    extent = jnp.asarray(frame_extent, jnp.float32)
    return _multitarget_scan(data, extent, int(n_tracks), int(k_max))


# --------------------------------------------------------------------------
# single-target tracker (reference target_detection.py:530-681)
# --------------------------------------------------------------------------

_LOCK_FOUND = np.array([[0, 1, 0, 0], [0, 0, 1, 0],
                        [0, 0, 1, 0], [0, 0, 1, 0]], np.float32).T
_LOCK_LOST = np.array([[1, 0, 0, 0], [1, 0, 0, 0],
                       [0, 0, 0, 1], [1, 0, 0, 0]], np.float32).T


def _simple_kalman_init():
    st = default_kalman_state(30.0, -20.0)
    # the simple tracker's own filter constants (reference
    # target_detection.py:634-641, after Howland et al.)
    st["x"] = jnp.asarray(np.array([30, 2, -20, -1], np.float32))
    st["F1"] = jnp.asarray(np.array(
        [[1, 0, -0.003, 0], [0, 0, -0.003, -0.03],
         [0, 0, 1, 1], [0, 0, 0, 1]], np.float32))
    st["Q"] = jnp.asarray(np.diag([2.0, 0.02, 0.2, 0.05]).astype(np.float32))
    st["R"] = jnp.asarray(np.diag([5.0, 5.0]).astype(np.float32))
    return st


def _py_slice_mask(coords, idx, half, n):
    """Boolean mask of ``coords`` selected by the Python slice
    ``a[idx-half : idx+half]`` on a length-n axis — including the
    negative-start wraparound quirk: for idx < half the start index
    becomes n+idx-half, which usually EXCEEDS the stop and yields an
    empty selection (the reference's literal gate behavior,
    target_detection.py:570-588)."""
    start = jnp.where(idx >= half, idx - half,
                      jnp.maximum(n + idx - half, 0))
    stop = jnp.minimum(idx + half, n)
    return (coords >= start) & (coords < stop)


@functools.partial(jax.jit, static_argnames=("strict",))
def _simple_scan(frames, range_extent, doppler_extent, strict: bool = False):
    nr, nf = frames.shape[1], frames.shape[2]
    rows = jnp.arange(nr)[:, None]
    cols = jnp.arange(nf)[None, :]

    state0 = dict(
        lock_mode=jnp.asarray(np.array([1, 0, 0, 0], np.float32)),
        measurement=jnp.asarray(np.array([35.0, -30.0], np.float32)),
        meas_idx=jnp.asarray(np.array([50, 50], np.int32)),
        estimate=jnp.asarray(np.array([30.0, -20.0], np.float32)),
        kalman=_simple_kalman_init(),
    )

    def step(st, frame):
        ly, lx = st["meas_idx"][0], st["meas_idx"][1]
        lock = st["lock_mode"]
        half_r = jnp.where(lock[2] == 1, 16, 24)
        half_d = jnp.where(lock[2] == 1, 32, 48)
        if strict:
            # literal reference gate: Python-slice semantics incl. the
            # negative-start empty-gate quirk
            gate = (_py_slice_mask(rows, ly, half_r, nr)
                    & _py_slice_mask(cols, lx, half_d, nf))
        else:
            # generalised: centred rectangle clamped at the frame edges
            gate = ((jnp.abs(rows - ly) < half_r)
                    & (jnp.abs(cols - lx) < half_d))
        use_gate = lock[0] != 1
        gated = jnp.where(use_gate & ~gate.reshape(nr, nf), 0.0, frame)

        flat = jnp.argmax(gated)
        iy, ix = flat // nf, flat % nf
        range_meas = range_extent * (1.0 - iy / nr)
        doppler_meas = doppler_extent * (2.0 * ix / nf - 1.0)
        meas = jnp.stack([range_meas, doppler_meas]).astype(jnp.float32)

        surprise = meas - st["estimate"]
        badness = jnp.sqrt(surprise[0] ** 2 + (0.5 * surprise[1]) ** 2)
        found = badness < 12

        t_found = jnp.asarray(_LOCK_FOUND)
        t_lost = jnp.asarray(_LOCK_LOST)
        new_lock = jnp.where(found, t_found @ lock, t_lost @ lock)

        est, kal = adaptive_kalman_update(meas, st["measurement"], st["kalman"])
        new = dict(lock_mode=new_lock, measurement=meas,
                   meas_idx=jnp.stack([iy, ix]).astype(jnp.int32),
                   estimate=est, kalman=kal)
        return new, new

    _, history = jax.lax.scan(step, state0, frames)
    return history


def simple_target_tracker(data, range_extent: float, doppler_extent: float,
                          frames_last: bool | None = None,
                          strict: bool = False):
    """Single-target lock-state tracker (reference target_detection.py:626-681).

    data: (num_doppler, num_range, num_frames) (frames_last=True) or
    frames-first (frames_last=False); default guesses from the shapes.
    Each frame is normalised, reoriented, clutter-zeroed, then the gated
    argmax becomes the measurement for an adaptive Kalman update; a 4-state
    lock-mode one-hot is advanced through the found/lost transition matrices.

    ``strict=True`` replicates the reference's literal per-frame behaviors
    for frame-for-frame output parity (the tracker analog of
    cfg.strict_frame_parity): the hard-coded Doppler cols-250:260 clutter
    zeroing (reference target_detection.py:673 — a no-op when nf <= 250,
    exactly as in numpy) instead of the generalised centre-relative ±5
    zeroing, and Python-slice measurement gates including the
    negative-start empty-gate quirk (target_detection.py:570-588) instead
    of edge-clamped rectangles. Oracle-tested against a numpy
    transcription of the reference loop (tests/test_detect.py).
    """
    data = _orient_stack(data, frames_last)
    f, nf, nr = data.shape

    # per-frame normalise / orient / zero (reference target_detection.py:663-673)
    frames = data / jnp.mean(jnp.abs(data), axis=(1, 2), keepdims=True)
    frames = jnp.flip(jnp.swapaxes(frames, 1, 2), axis=2)   # (F, nr, nf)
    frames = frames.at[:, :8, :].set(0.0)
    frames = frames.at[:, -8:, :].set(0.0)
    if strict:
        frames = frames.at[:, :, 250:260].set(0.0)
    else:
        dc = nf // 2
        frames = frames.at[:, :, dc - 5:dc + 5].set(0.0)

    return _simple_scan(frames, jnp.float32(range_extent),
                        jnp.float32(doppler_extent), strict=strict)
