"""Config derivation tests.

Expected values are the numbers the reference derivation produces for the
example PRconfig.yaml radio parameters (verified numerically in SURVEY.md §3.1).
"""

import math

from passiveradar_tpu.config import derive_config, nearestpow2, nextpow2

PR_PARAMS = dict(
    input_file="capture.hdf5",
    interleaved_input_channels=False,
    input_ref_path="/data/ref",
    input_srv_path="/data/srv",
    range_doppler_map_ftype="hdf5",
    output_fname="XAMBG_TEST",
    num_frames=1200,
    input_sample_rate=2_400_000,
    input_center_freq=102_000_000,
    channel_freq=101_900_000,
    channel_bandwidth=200_000,
    cpi_seconds_nominal=2.0,
    max_doppler_nominal=256.0,
    max_range_nominal=200.0,
    overlap_cpi=True,
)


def test_pow2_helpers():
    assert nextpow2(400000) == 524288
    assert nextpow2(1) == 1
    assert nextpow2(1025) == 2048
    assert nearestpow2(1000) == 1024
    assert nearestpow2(700) == 512
    assert nearestpow2(1024.2) == 1024


def test_prconfig_derived_geometry():
    c = derive_config(PR_PARAMS)
    assert c.cpi_samples == 524288
    assert c.resamp_up == 13
    assert c.resamp_dn == 119
    assert math.isclose(c.IF_sample_rate, 2_400_000 * 13 / 119)
    assert math.isclose(c.cpi_seconds_actual, 524288 * (119 / 13) / 2_400_000)
    assert math.isclose(c.doppler_cell_width, 1 / c.cpi_seconds_actual)
    assert c.num_range_cells == 175
    assert c.num_doppler_cells == 1024
    assert math.isclose(c.max_doppler_actual, 1024 / (2 * c.cpi_seconds_actual))
    assert c.offset_freq == 100_000
    assert c.input_chunk_length == 4_799_250 - 1 + 1  # even-adjusted floor
    assert c.input_chunk_length % 2 == 0
    assert c.output_chunk_length == 262144
    assert c.window_overlap == 131072
    assert math.isclose(c.frame_interval, c.cpi_seconds_actual / 2)
    assert c.range_doppler_map_fname == "XAMBG_TEST.hdf5"
    assert c.meta_fname == "XAMBG_TEST.npz"


def test_input_chunk_exact_value():
    c = derive_config(PR_PARAMS)
    expected = int(math.floor(524288 * 119 / 13))
    if expected % 2:
        expected -= 1
    assert c.input_chunk_length == expected


def test_non_overlap_branch_works():
    params = dict(PR_PARAMS, overlap_cpi=False)
    c = derive_config(params)
    assert c.output_chunk_length == c.cpi_samples
    assert c.window_overlap == 0
    assert math.isclose(c.frame_interval, c.cpi_seconds_actual)
    assert c.input_chunk_length % 2 == 0


def test_dict_style_access():
    c = derive_config(PR_PARAMS)
    assert c["cpi_samples"] == c.cpi_samples
    assert c.caf_input_samples == c.cpi_samples
