"""DSP kernel library: pure, jit-able JAX functions over fixed-shape arrays."""

from passiveradar_tpu.ops.caf import direct_xambg, fast_xambg
from passiveradar_tpu.ops.cfar import cfar_2d
from passiveradar_tpu.ops.clutter import (
    gal_jpe,
    ls_filter,
    ls_filter_multiple,
    ls_filter_svd,
    ls_filter_toeplitz,
    nlms_filter,
    toeplitz_solve,
)
from passiveradar_tpu.ops.fir import (
    decimate_taps,
    design_lowpass,
    fir_decimate,
    resample_poly,
    upfirdn,
)
from passiveradar_tpu.ops.iir import iir_decimate
from passiveradar_tpu.ops.mixer import block_phase_offsets, frequency_shift
from passiveradar_tpu.ops.nlms_pallas import nlms_filter_pallas
from passiveradar_tpu.ops.util import deinterleave_iq, normalize, shift
from passiveradar_tpu.ops.xcorr import (
    apply_offset,
    channel_preprocessing,
    find_channel_offset,
    offset_compensation,
    xcorr,
)

__all__ = [
    "design_lowpass",
    "upfirdn",
    "resample_poly",
    "fir_decimate",
    "decimate_taps",
    "frequency_shift",
    "block_phase_offsets",
    "deinterleave_iq",
    "normalize",
    "shift",
    "xcorr",
    "find_channel_offset",
    "apply_offset",
    "offset_compensation",
    "channel_preprocessing",
    "fast_xambg",
    "direct_xambg",
    "cfar_2d",
    "ls_filter",
    "ls_filter_svd",
    "ls_filter_toeplitz",
    "ls_filter_multiple",
    "nlms_filter",
    "nlms_filter_pallas",
    "gal_jpe",
    "toeplitz_solve",
]
