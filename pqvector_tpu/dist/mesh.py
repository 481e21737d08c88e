"""Device mesh utilities for multi-chip (ICI) execution.

The reference's only parallelism is scoped OS threads within one process
(/root/reference/src/ivf/index.rs:267-320); SURVEY.md §2 maps that to an
explicit data-parallel mesh over ICI, with a reserved (unused-for-parity)
DCN axis so the comms layer stays mesh-axis-generic.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CLUSTER_AXIS = "cluster"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(data: int, cluster: int) -> Mesh:
    """2-D ``(data, cluster)`` mesh for probe fan-out (SURVEY §2: optional
    ``cluster`` axis): clusters are partitioned across the cluster axis and
    each cluster group's rows are sharded across the data axis."""
    devices = jax.devices()
    need = data * cluster
    if need > len(devices):
        raise ValueError(
            f"Requested {data}x{cluster} mesh but only {len(devices)} devices"
        )
    return Mesh(
        np.array(devices[:need]).reshape(data, cluster),
        (DATA_AXIS, CLUSTER_AXIS),
    )


def shard_rows(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Place an array row-sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    """Place an array fully replicated."""
    return jax.device_put(x, NamedSharding(mesh, P()))
