"""Golden end-to-end parity: full pipeline vs a scipy composition oracle.

The oracle reproduces the reference's processing graph (main.py:30-194) stage
by stage with scipy/numpy — per-chunk deinterleave, block-phase frequency
shift, resample_poly(padtype='line'), sequential multi-Doppler Toeplitz LS
passes, 50% CPI overlap with zero boundaries, windowed fast CAF — so the
jitted TPU pipeline is checked against the reference *math* end to end, not
just per kernel.
"""

import numpy as np
import pytest
from scipy import signal as sps
from scipy.linalg import solve_toeplitz

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.synthetic import Target, synth_capture_arrays
from passiveradar_tpu.pipeline import frame_phases, process_frames

from tests.test_caf import caf_oracle
from tests.test_pipeline import TINY, _make_frames


def _xcorr_ref(s1, s2, nlead, nlag):
    return sps.correlate(s1, np.pad(s2, (nlag, nlead)), mode="valid")


def _ls_toeplitz_oracle(ref, srv, flen, peek=10):
    rs = np.roll(ref, -peek)
    ac = _xcorr_ref(rs, rs, 0, flen + peek - 1)
    cc = _xcorr_ref(srv, rs, 0, flen + peek - 1)
    taps = solve_toeplitz(ac, cc)
    clutter = np.convolve(rs, taps, mode="full")[:len(srv)]
    return srv - clutter


def pipeline_oracle(raw_ref, raw_srv, cfg):
    """Reference-graph composition in float64 numpy/scipy."""
    n_frames = raw_ref.shape[0]
    phases = frame_phases(cfg, list(range(n_frames))).astype(np.float64)

    def preprocess(raw, k):
        iq = (raw[0::2] + 1j * raw[1::2]).astype(np.complex128)
        n = np.arange(iq.shape[0])
        iq = iq * np.exp(1j * (2 * np.pi * cfg.offset_freq * n
                               / cfg.input_sample_rate + phases[k]))
        out = sps.resample_poly(iq, cfg.resamp_up, cfg.resamp_dn,
                                padtype="line")
        return out[:cfg.output_chunk_length]

    refs = [preprocess(raw_ref[k], k) for k in range(n_frames)]
    srvs = [preprocess(raw_srv[k], k) for k in range(n_frames)]

    t = np.arange(cfg.output_chunk_length) / cfg.IF_sample_rate
    cleaned = []
    for k in range(n_frames):
        cur = srvs[k]
        for dop in cfg.clutter_doppler_bins:
            r = refs[k] if dop == 0 else refs[k] * np.exp(1j * 2 * np.pi * dop * t)
            cur = _ls_toeplitz_oracle(r, cur, cfg.num_range_cells)
        cleaned.append(cur)

    h = cfg.window_overlap
    zeros = np.zeros(h, complex)
    window = sps.get_window(tuple(cfg.caf_window), cfg.caf_input_samples)
    maps = []
    for k in range(n_frames):
        lt_r = refs[k - 1][-h:] if k > 0 else zeros
        lt_s = cleaned[k - 1][-h:] if k > 0 else zeros
        rt_r = refs[k + 1][:h] if k < n_frames - 1 else zeros
        rt_s = cleaned[k + 1][:h] if k < n_frames - 1 else zeros
        ref_in = np.concatenate([lt_r, refs[k], rt_r])
        srv_in = np.concatenate([lt_s, cleaned[k], rt_s])
        maps.append(caf_oracle(ref_in.astype(np.complex64),
                               srv_in.astype(np.complex64),
                               cfg.num_range_cells, cfg.num_doppler_cells,
                               window=window))
    return np.stack(maps)


@pytest.mark.slow
def test_pipeline_matches_reference_graph_oracle(rng):
    cfg = derive_config(TINY)
    n_frames = 3
    ref, srv = _make_frames(cfg, n_frames,
                            (Target(40, 20.0, 0.1),), seed=21)
    import jax.numpy as jnp
    got = np.asarray(process_frames(
        jnp.asarray(ref), jnp.asarray(srv),
        jnp.asarray(frame_phases(cfg, list(range(n_frames)))), cfg))
    want = pipeline_oracle(ref.astype(np.float64), srv.astype(np.float64), cfg)

    scale = np.max(np.abs(want))
    err = np.max(np.abs(got - want)) / scale
    # float32 chain vs float64 oracle across 6 stages: demand < -55 dB error
    assert err < 2e-3, err
    # and the target cell must agree exactly per frame
    for k in range(n_frames):
        assert (np.unravel_index(np.argmax(np.abs(got[k])), got[k].shape)
                == np.unravel_index(np.argmax(np.abs(want[k])), want[k].shape))
