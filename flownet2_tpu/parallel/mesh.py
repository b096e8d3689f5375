"""Device-mesh construction and sharding policy.

The reference's only parallelism is single-process DataParallel
(/root/reference/main.py:189,200: batch scatter/gather over local GPUs).
The TPU-native design replaces it with a 2-D ``jax.sharding.Mesh``:

- ``data``    — batch axis (the DP replacement).  Gradients are combined by
  XLA-inserted all-reduces over ICI when params are replicated and the
  batch is sharded; nothing hand-written.
- ``spatial`` — image-height axis (the sequence-parallel analog for flow
  nets, SURVEY.md §2.3/§5): convolutions over an H-sharded tensor get
  their halo exchanges inserted by GSPMD automatically; the warp and
  correlation kernels carry explicit shard_map halo compositions
  (ops/resample2d_spatial.py, ops/correlation_spatial.py) so the Pallas
  paths stay live under H-sharding.

Multi-host: ``jax.distributed.initialize`` (call ``init_distributed``)
then the same mesh spans all hosts, with the loader feeding per-host
shards (data.loader.DataLoader process_count/process_index).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import ShardingPair

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up.  Explicit args win; otherwise auto-configures
    from the standard JAX env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU pod's metadata) via
    ``jax.distributed.initialize()``.  No-op (returns False) when neither
    is present — single-host runs need no service."""
    import os

    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # env-driven (JAX's auto-detect only covers managed clusters —
        # SLURM/GKE — so read the standard variables explicitly)
        missing = [v for v in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but distributed bring-up "
                f"also needs {' and '.join(missing)} — set all three "
                "(coordinator address, total process count, this process's "
                "0-based id) or none")
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return True
    return False


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              spatial: int = 1) -> Mesh:
    """(n/spatial, spatial) mesh over ``devices`` with (data, spatial) axes.

    Registers the mesh as the ACTIVE mesh with the ops-layer sharding
    hints: Pallas kernels inside steps traced under a data-sharded mesh
    run through a data-axis ``shard_map`` (the canonical distributed-Pallas
    composition), while a non-trivial spatial axis routes them to their
    XLA fallbacks (GSPMD halo-partitions those; it cannot partition an
    opaque custom call along H).  ops/sharding_hints.py; pinned by
    tests/test_pallas_sharding.py.

    The registration is process-global and resolved at TRACE time: jitted
    callables traced under one active mesh keep its kernel composition —
    after activating a different mesh, re-trace (new ``jax.jit``) any step
    that should follow it, or use ``scoped_mesh`` to restore the previous
    registration automatically.
    """
    from ..ops.sharding_hints import set_active_mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % spatial:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    mesh = Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
    set_active_mesh(mesh, spatial > 1)
    return mesh


@contextlib.contextmanager
def scoped_mesh(devices: Optional[Sequence[jax.Device]] = None,
                spatial: int = 1):
    """``make_mesh`` with scoped hint registration: restores the previously
    active mesh (or none) on exit, so sweeps over mesh sizes (e.g.
    bench.py's scaling table) don't leave a stale registration behind."""
    from ..ops import sharding_hints

    prev = (sharding_hints._ACTIVE_MESH, sharding_hints._SPATIAL_SHARDED)
    try:
        yield make_mesh(devices, spatial)
    finally:
        sharding_hints.set_active_mesh(*prev)


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """All shardings a train/eval step needs."""
    mesh: Mesh

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def batch_images(self) -> NamedSharding:
        # (B, 2, H, W, 3): batch over data, H over spatial
        return NamedSharding(self.mesh, P(DATA_AXIS, None, SPATIAL_AXIS, None, None))

    @property
    def batch_flow(self) -> NamedSharding:
        # (B, H, W, 2)
        return NamedSharding(self.mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))

    @property
    def batch(self) -> ShardingPair:
        return ShardingPair(self.batch_images, self.batch_flow)

    def local_batch_size(self, global_batch: int) -> int:
        return global_batch // jax.process_count()
