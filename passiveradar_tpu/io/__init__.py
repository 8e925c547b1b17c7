"""Capture ingest, range-Doppler map persistence, synthetic scene generation."""

from passiveradar_tpu.io.hdf5 import CaptureReader
from passiveradar_tpu.io.synthetic import synth_capture_arrays, write_synth_capture
from passiveradar_tpu.io.writers import MapWriter, load_maps, write_metadata

__all__ = [
    "CaptureReader",
    "MapWriter",
    "load_maps",
    "write_metadata",
    "synth_capture_arrays",
    "write_synth_capture",
]
