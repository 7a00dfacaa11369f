"""Device-mesh helpers for the batch and giant-pair engines.

The reference is single-process, single-GPU, device 0 hard-coded
(ref: src/benchmark.cpp:179); all multi-chip capability here is new,
TPU-first design (SURVEY.md §2.9): a 1-D ``jax.sharding.Mesh`` whose axis
shards either the batch of pairs ("pairs", data parallel) or the column
bands of one giant pair ("sp", sequence parallel with ICI halo exchange).
Multi-host initialization goes through ``jax.distributed``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "pairs",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest.

    ``axis_name`` defaults to the mesh's own first axis so meshes created
    with any axis name (e.g. "sp") shard correctly.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (one JAX process per host on a pod slice).

    Thin wrapper over ``jax.distributed.initialize`` so the CLI can expose
    it behind flags; no-ops when JAX is already initialized or when running
    single-process (the common case in tests).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # Already initialized (or single-process auto mode) — fine.
        pass
