"""Target detection and tracking: CFAR maps → measurements → Kalman tracks."""

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

__all__ = [
    "kalman_update",
    "adaptive_kalman_update",
    "kalman_extrapolate",
    "default_kalman_state",
    "get_measurements",
    "multitarget_tracker",
    "simple_target_tracker",
]
