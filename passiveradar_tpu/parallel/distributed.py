"""Multi-host (pod-slice) execution runtime.

The framework's multi-host model: one Python process per TPU host, all
processes running the same program. The capture's frame axis is sharded
contiguously across *hosts* (each host's CaptureReader serves only its range,
io/hdf5.py:shard) and then across each host's local chips via a per-host
('frames',) mesh.

Frames are data-parallel apart from the 50% CPI overlap halo, and each
host's reader already reads a one-frame margin into the neighbouring host's
range (the halo frame comes off disk, recomputed exactly) — so the hot path
needs NO cross-host communication at all: every host runs an independent
local-mesh XLA program over its own chips at its own pace, halos between
chips ride ICI, and DCN is touched once at the end for the global frame
count (process_allgather). This is deliberately NOT a single global-mesh
program: a global mesh would force every host into lockstep dispatch (equal
batch counts, synchronized collectives) to move halo frames that are
already on every host's local disk.

The reference has no distributed runtime at all (its dask.distributed.Client
import is dead code, main.py:7); this module is the from-scratch equivalent.
Per-host outputs are `<output>.partN.<ftype>` shard files over contiguous
frame ranges; `io.writers.concat_parts` / `cli.concat` reassemble the global
stack, and process 0 writes the global metadata.
"""

from __future__ import annotations

import jax
import jax.experimental.multihost_utils
import numpy as np

from passiveradar_tpu.config import RadarConfig
from passiveradar_tpu.parallel.mesh import frame_sharding, local_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialise the multi-process runtime (no-op when single-process).

    On cloud TPU pods call with no arguments: jax auto-detects the slice
    topology. Elsewhere (e.g. CPU hosts over gloo) pass the coordinator
    address and process layout explicitly.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   cluster_detection_method="deactivate")
    elif coordinator_address is not None and num_processes is None:
        # a coordinator without an explicit process layout cannot be
        # auto-detected — silently running single-process here would
        # quietly process the whole capture on one host (an explicit
        # num_processes=1 layout is a valid single-process run)
        raise ValueError(
            "coordinator_address given without num_processes; pass "
            "--num-processes/--process-id too (or neither, on a cloud "
            "TPU pod where the topology auto-detects)")
    elif num_processes is None:
        try:
            jax.distributed.initialize()
        except ValueError:
            pass  # no cluster environment detected: single-process


def global_frame_array(local_frames: np.ndarray, mesh) -> jax.Array:
    """Assemble a globally-sharded frame batch from per-host local data.

    local_frames: this host's (F_local, ...) slice, contiguous in the global
    frame order. Uses make_array_from_process_local_data so no cross-host
    traffic happens at construction. For callers building their own global
    (cross-host) mesh programs; run_capture_multihost itself uses
    independent local meshes (see module docstring).
    """
    sharding = frame_sharding(mesh)
    return jax.make_array_from_process_local_data(sharding, local_frames)


def part_path(cfg: RadarConfig, process_index: int) -> str:
    """Per-host output shard path (contiguous frame range)."""
    return (f"{cfg.output_fname}.part{process_index}"
            f".{cfg.range_doppler_map_ftype}")


def run_capture_multihost(cfg: RadarConfig, capture_path: str | None = None,
                          output_path: str | None = None,
                          batch_frames: int | None = None,
                          progress: bool = True):
    """Process a capture across all hosts/chips of the current runtime.

    Each process reads its own contiguous frame range (with one-frame disk
    margins at interior shard edges, so host-boundary halos are exact) and
    runs the pipeline over its own local-chip mesh. Per-host outputs land in
    part files; process 0 writes metadata describing the global stack.
    Returns (local_frames_done, global_frames_done).
    """
    from passiveradar_tpu.io.hdf5 import CaptureReader
    from passiveradar_tpu.io.writers import MapWriter, write_metadata
    from passiveradar_tpu.pipeline import run_capture

    mesh = local_mesh()
    reader = CaptureReader(cfg, capture_path)
    if jax.process_count() > 1:
        # shard AFTER applying cfg.num_frames: the global cap must bound the
        # whole capture, not each host's range. If the capture holds data
        # beyond the cap, the last shard keeps it as a real halo margin
        # (exactly what the single-host run does when total < num_frames).
        capped = min(reader.num_frames, cfg.num_frames)
        extra_after = reader.num_frames > capped
        reader.num_frames = capped
        reader.shard(jax.process_index(), jax.process_count())
        if extra_after and jax.process_index() == jax.process_count() - 1:
            reader.frame_margin_after = True
        if output_path is None:
            output_path = part_path(cfg, jax.process_index())
    writer = MapWriter(cfg, min(reader.num_frames, cfg.num_frames),
                       output_path)
    n = run_capture(reader, writer, cfg, batch_frames=batch_frames,
                    sharding=frame_sharding(mesh), progress=progress)
    writer.close()
    # metadata describes the GLOBAL concatenated stack, not this host's
    # shard; the allgather is a collective, so every process participates
    # (and doubles as the end-of-run barrier)
    if jax.process_count() > 1:
        counts = jax.experimental.multihost_utils.process_allgather(
            np.asarray([n]))
        global_n = int(np.sum(counts))
    else:
        global_n = n
    if jax.process_index() == 0:
        write_metadata(cfg, global_n)
    reader.close()
    return n, global_n
