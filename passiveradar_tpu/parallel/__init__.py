"""Device-mesh parallelism: frame sharding and CPI-overlap halo exchange."""

from passiveradar_tpu.parallel.halo import overlap_frames, overlap_frames_shmap
from passiveradar_tpu.parallel.mesh import frame_sharding, make_mesh

__all__ = [
    "make_mesh",
    "frame_sharding",
    "overlap_frames",
    "overlap_frames_shmap",
]
