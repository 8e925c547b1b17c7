"""CPI-overlap halo exchange along the sharded frame axis.

The reference builds 50%-overlapped CPIs with dask's
``da.overlap.overlap(depth=cpi_samples//4, boundary=0)`` (main.py:178-181):
every time-chunk is extended with ``depth`` samples from each neighbour, zero
at the capture edges. On a TPU mesh the frame axis is sharded, so the same
operation is a neighbour exchange:

* ``overlap_frames`` — written against the *global* array with jnp.roll; under
  jit with a sharded frame axis XLA lowers the roll to collective-permutes
  over ICI. This is the idiomatic pjit formulation.
* ``overlap_frames_shmap`` — explicit shard_map + lax.ppermute formulation for
  when manual control of the collective schedule is wanted; bit-identical
  output (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def overlap_frames(x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """(F, C) → (F, C + 2*depth): frame f gets the tail of f-1 and the head
    of f+1; zero boundary at the capture edges (dask ``boundary=0``)."""
    f = x.shape[0]
    left = jnp.roll(x, 1, axis=0)[:, -depth:]
    right = jnp.roll(x, -1, axis=0)[:, :depth]
    idx = jnp.arange(f)
    left = jnp.where((idx == 0)[:, None], 0, left)
    right = jnp.where((idx == f - 1)[:, None], 0, right)
    return jnp.concatenate([left, x, right], axis=1)


def local_overlap(xl: jnp.ndarray, depth: int, n: int,
                  axis_name: str = "frames") -> jnp.ndarray:
    """Per-shard body of the halo exchange — call inside a shard_map region.

    xl: this device's (f_local, C) block of the frame axis (sharded over
    ``axis_name`` with ``n`` devices). Edge chunks are exchanged with
    lax.ppermute ring neighbours; interior halos come from the local shard;
    zero boundary at the capture edges (dask ``boundary=0``).
    """
    me_fwd = [(i, (i + 1) % n) for i in range(n)]
    me_bwd = [(i, (i - 1) % n) for i in range(n)]
    # tail of my last frame → right neighbour; head of my first → left
    tail = xl[-1:, -depth:]
    head = xl[:1, :depth]
    from_left = jax.lax.ppermute(tail, axis_name, me_fwd)
    from_right = jax.lax.ppermute(head, axis_name, me_bwd)
    idx = jax.lax.axis_index(axis_name)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)

    left = jnp.concatenate([from_left, xl[:-1, -depth:]], axis=0)
    right = jnp.concatenate([xl[1:, :depth], from_right], axis=0)
    return jnp.concatenate([left, xl, right], axis=1)


def overlap_frames_shmap(x: jnp.ndarray, depth: int, mesh: Mesh,
                         axis_name: str = "frames") -> jnp.ndarray:
    """Explicit-collective version of overlap_frames for a sharded frame axis.

    Requires the leading axis to be evenly sharded over ``axis_name``.
    Bit-identical to overlap_frames (tested).
    """
    n = mesh.shape[axis_name]
    return jax.shard_map(
        lambda xl: local_overlap(xl, depth, n, axis_name),
        mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name))(x)
