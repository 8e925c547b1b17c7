"""BASELINE.json config 1: the minimum end-to-end slice.

"Synthetic 2-channel FM IQ (200 kHz, 1 frame): decimate + NLMS clutter
filter + 256x512 CAF on CPU" — the regression anchor demo composed from
library ops (decimation, NLMS, CAF), distinct from the full LS-filter
pipeline exercised in test_pipeline.py.
"""

import numpy as np

from passiveradar_tpu.config import derive_config
from passiveradar_tpu.io.synthetic import Target, synth_capture_arrays
from passiveradar_tpu.ops.caf import fast_xambg
from passiveradar_tpu.ops.clutter import nlms_filter
from passiveradar_tpu.ops.fir import fir_decimate
from passiveradar_tpu.ops.nlms_pallas import nlms_filter_pallas


def test_config1_decimate_nlms_caf(rng):
    nf, r_bins = 256, 511            # 256 × 512 range-Doppler map
    q = 2                            # decimate 200 kHz-class capture by 2
    n_if = nf * 64                   # 16384 IF samples = 1 frame
    n_raw = n_if * q

    cfg = derive_config(dict(
        input_sample_rate=2 * 200_000, input_center_freq=100_000_000,
        channel_freq=100_000_000, channel_bandwidth=200_000,
        cpi_seconds_nominal=n_if / 200_000.0, max_doppler_nominal=128.0,
        max_range_nominal=400.0, overlap_cpi=True,
    ))

    delay_raw, dop = 40, 25.0
    raw_ref, raw_srv = synth_capture_arrays(
        cfg, 1, targets=(Target(delay_raw, dop, 0.2),), direct_gain=0.8,
        seed=11)
    ref = (raw_ref[0:2 * n_raw:2] + 1j * raw_ref[1:2 * n_raw:2]
           ).astype(np.complex64)
    srv = (raw_srv[0:2 * n_raw:2] + 1j * raw_srv[1:2 * n_raw:2]
           ).astype(np.complex64)

    # channel_freq == center freq → no mixing needed; decimate to IF rate
    ref_if = np.asarray(fir_decimate(ref, q))
    srv_if = np.asarray(fir_decimate(srv, q))
    assert ref_if.shape == (n_if,)

    # NLMS clutter cancellation (scan and Pallas-interpret paths agree)
    flen, mu = 24, 0.1
    clean = np.asarray(nlms_filter(ref_if, srv_if, flen, mu))
    clean_p = np.asarray(nlms_filter_pallas(ref_if, srv_if, flen, mu,
                                            block=512, interpret=True))
    assert np.max(np.abs(clean - clean_p)) < 1e-3 * np.max(np.abs(srv_if))

    caf = np.abs(np.asarray(fast_xambg(ref_if, clean, r_bins, nf,
                                       window=("kaiser", 5.0))))
    assert caf.shape == (nf, r_bins + 1)

    # the echo must dominate the cancelled map at its (delay, doppler) cell
    fs_if = cfg.input_sample_rate / q
    cpi_s = n_if / fs_if
    delay_if = delay_raw / q
    expect_col = r_bins - round(delay_if)
    expect_row = nf // 2 - round(dop * cpi_s)
    # exclude the NLMS convergence transient's zero-Doppler residue
    search = caf.copy()
    search[nf // 2 - 2:nf // 2 + 3, :] = 0
    rr, cc = np.unravel_index(np.argmax(search), search.shape)
    assert abs(rr - expect_row) <= 1
    assert abs(cc - expect_col) <= 1
