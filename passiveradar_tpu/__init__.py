"""passiveradar_tpu — a TPU-native passive bistatic radar processing framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capability set of the
Max-Manning/passiveRadar reference processor: two-channel IQ ingest, channel
alignment, digital down-conversion, polyphase rational resampling, adaptive
clutter cancellation, cross-ambiguity (range-Doppler) processing, CFAR
detection, Kalman target tracking and rendering.

Design stance (see SURVEY.md §7): every DSP stage is a pure, jit-able function
over fixed-shape complex64 arrays; the capture's time axis is cut into
CPI-sized frames which are sharded over a `jax.sharding.Mesh`, with the 50%
CPI overlap realised as a neighbour halo exchange on the frame axis. The hot
kernels (CAF, clutter solve, NLMS) are re-derived for the MXU/VPU rather than
translated from the reference's scipy code paths.
"""

from passiveradar_tpu.config import RadarConfig, load_config, derive_config

__version__ = "0.1.0"

__all__ = [
    "RadarConfig",
    "load_config",
    "derive_config",
]
