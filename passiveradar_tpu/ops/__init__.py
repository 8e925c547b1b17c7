"""DSP kernel library: pure, jit-able JAX functions over fixed-shape arrays."""

from passiveradar_tpu.ops.fir import (
    design_lowpass,
    fir_decimate,
    resample_poly,
    upfirdn,
)
from passiveradar_tpu.ops.mixer import block_phase_offsets, frequency_shift
from passiveradar_tpu.ops.util import deinterleave_iq, normalize
from passiveradar_tpu.ops.xcorr import find_channel_offset, xcorr

__all__ = [
    "design_lowpass",
    "upfirdn",
    "resample_poly",
    "fir_decimate",
    "frequency_shift",
    "block_phase_offsets",
    "deinterleave_iq",
    "normalize",
    "xcorr",
    "find_channel_offset",
]
