"""Trace-time sharding hints for Pallas kernel dispatch.

A ``pallas_call`` inside a GSPMD-jitted computation is an opaque custom
call: the partitioner cannot split it along a *spatially* sharded axis
(the kernels' gather/band index math assumes the full H/W extent per
block, and the correlation/warp windows would need halo exchanges GSPMD
cannot infer), and even replication is unreliable for side-effecting
lowerings.  The TPU-native composition for the *data* axis is
``jax.shard_map``: each device runs the kernel on its local batch shard —
the canonical distributed-Pallas pattern (pallas_guide.md, ring
collectives section).

``parallel.mesh.make_mesh`` registers the active mesh here; the op
dispatchers in ops/correlation.py and ops/resample2d.py then ask
``kernel_wrapper`` for the right composition at trace time:

- no active mesh (single-device jit, the bench path) -> identity,
- data-sharded mesh -> ``shard_map`` over the ``data`` axis,
- spatially-sharded mesh (or a batch the data axis does not divide) ->
  ``None``: dispatch falls back to the pure-XLA formulations, whose GSPMD
  partitioning (automatic conv/gather halos) the 8-device dryrun exercises
  (__graft_entry__.dryrun_multichip).

tests/test_pallas_sharding.py pins all three behaviors.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

_ACTIVE_MESH = None
_SPATIAL_SHARDED = False

DATA_AXIS = "data"


def set_active_mesh(mesh, spatial_sharded: bool) -> None:
    """Called by parallel.mesh.make_mesh; ``mesh=None`` clears."""
    global _ACTIVE_MESH, _SPATIAL_SHARDED
    _ACTIVE_MESH = mesh
    _SPATIAL_SHARDED = bool(spatial_sharded)


def set_spatial_sharding(active: bool) -> None:
    global _SPATIAL_SHARDED
    _SPATIAL_SHARDED = bool(active)


def spatial_sharding_active() -> bool:
    return _SPATIAL_SHARDED


def kernel_wrapper(batch_size: int) -> Optional[Callable]:
    """Composition to apply to a batch-leading Pallas callable under the
    active mesh: identity, a data-axis shard_map, or None (= use the XLA
    fallback).  All of the callable's array args and results must have the
    batch as their leading dim."""
    if _SPATIAL_SHARDED:
        return None
    mesh = _ACTIVE_MESH
    if mesh is None:
        return lambda f: f
    data = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)
    if data <= 1:
        return lambda f: f
    if batch_size % data:
        return None  # ragged per-device batch: XLA fallback

    def wrap(f):
        spec = jax.sharding.PartitionSpec(DATA_AXIS)
        return jax.shard_map(f, mesh=mesh, in_specs=spec, out_specs=spec,
                             check_vma=False)

    return wrap
