"""Multi-host (pod-slice) execution scaffolding.

The framework's multi-host model: one Python process per TPU host, all
processes running the same program. The capture's frame axis is sharded
contiguously across *hosts* (each host's CaptureReader serves only its range,
io/hdf5.py:shard) and then across each host's local chips via the global
('frames',) mesh, so the CPI-overlap halo exchange rides ICI between
neighbouring chips and only the one frame-pair per host boundary crosses DCN.

The reference has no distributed runtime at all (its dask.distributed.Client
import is dead code, main.py:7); this module is the from-scratch equivalent
designed for jax.distributed. On a single host everything degrades to the
local mesh path, which is what the tests exercise (the driver separately
dry-runs the multi-chip program on virtual devices — __graft_entry__.py).
"""

from __future__ import annotations

import jax
import jax.experimental.multihost_utils
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.parallel.mesh import frame_sharding, make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialise the multi-process runtime (no-op when single-process).

    On cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_frame_array(local_frames: np.ndarray, mesh) -> jax.Array:
    """Assemble a globally-sharded frame batch from per-host local data.

    local_frames: this host's (F_local, ...) slice, contiguous in the global
    frame order. Uses make_array_from_process_local_data so no cross-host
    traffic happens at construction.
    """
    sharding = frame_sharding(mesh)
    return jax.make_array_from_process_local_data(sharding, local_frames)


def run_capture_multihost(cfg: RadarConfig, capture_path: str,
                          output_path: str | None = None,
                          batch_frames: int | None = None):
    """Process a capture across all hosts/chips of the current runtime.

    Each process reads its own contiguous frame range, the global mesh spans
    every chip in the slice, and only process 0 writes output metadata. Batch
    boundaries fall on host boundaries, so the only approximation is the same
    zero-halo batch edge the single-host path has (one frame of margin is
    recomputed to make interior edges exact).
    """
    from passiveradar_tpu.io.hdf5 import CaptureReader
    from passiveradar_tpu.io.writers import MapWriter, write_metadata
    from passiveradar_tpu.pipeline import run_capture

    mesh = make_mesh()
    reader = CaptureReader(cfg, capture_path)
    if jax.process_count() > 1:
        reader.shard(jax.process_index(), jax.process_count())
        if output_path is None:
            # per-host shard files; concatenate along the frame axis offline
            output_path = (f"{cfg.output_fname}.part{jax.process_index()}"
                           f".{cfg.range_doppler_map_ftype}")
    writer = MapWriter(cfg, min(reader.num_frames, cfg.num_frames),
                       output_path)
    n = run_capture(reader, writer, cfg, batch_frames=batch_frames,
                    sharding=frame_sharding(mesh))
    writer.close()
    # metadata describes the GLOBAL concatenated stack, not this host's
    # shard; the allgather is a collective, so every process participates
    if jax.process_count() > 1:
        counts = jax.experimental.multihost_utils.process_allgather(
            np.asarray([n]))
        global_n = int(np.sum(counts))
    else:
        global_n = n
    if jax.process_index() == 0:
        write_metadata(cfg, global_n)
    reader.close()
    return n
