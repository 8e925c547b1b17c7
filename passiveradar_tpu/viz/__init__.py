"""Visualization: digital-phosphor persistence and frame/video rendering."""

from passiveradar_tpu.viz.persistence import persistence, persistence_stack

__all__ = ["persistence", "persistence_stack"]
