"""Multi-host (pod / cluster) execution.

TPU-native replacement for the reference's remote/cluster MapReduce backend
(SURVEY.md §2 [C-MED existence]): where GParML dispatched worker jobs over a
shared filesystem, a multi-host JAX program runs the SAME shard_map code path
over a global mesh — ICI within a slice, DCN across hosts. The only
additions are process-group initialization and per-host data ingestion
(never gathering the dataset to one host).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from gparml_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the JAX process group. On Cloud TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_host_local(
    mesh: Mesh, array: np.ndarray, axis: str = DATA_AXIS
):
    """Build a globally-sharded jax.Array from this host's local slice of the
    data (each host loads only its own partitions — the reference's
    per-partition file loading, without ever gathering to one machine).

    ``array`` is THIS host's (N_local, ...) block; hosts are assumed ordered
    by process index along the data axis. N_local must equal N_global /
    num_processes and be divisible by local device count.
    """
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    return jax.make_array_from_process_local_data(sharding, array)


def is_coordinator() -> bool:
    return jax.process_index() == 0
