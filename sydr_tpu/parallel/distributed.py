"""Multi-host execution helpers.

The reference's parallel runtime is single-host ``multiprocessing`` with
POSIX shared memory; it has no network backend at all (SURVEY §2.5). Here
multi-host scaling is native JAX: ``jax.distributed`` initialisation, a
global (hosts x local-devices) mesh, and per-host sample feeding with
``jax.make_array_from_process_local_data`` — collectives then ride ICI
inside a slice and DCN across hosts, inserted by XLA from the shardings.

Typical 2-host channel-scaling session::

    import sydr_tpu.parallel.distributed as dist

    dist.initialize()                        # reads env / coordinator flags
    mesh = dist.global_mesh(("ch",))         # all devices on one axis
    # shard channel state across every chip of every host:
    run = sydr_tpu.parallel.mesh.make_sharded_run_block(cfg, mesh)
    window = dist.replicate_from_host(mesh, window_np)

(This module is exercised in CI on a virtual single-process mesh; real
multi-host runs only need the coordinator address environment.)
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise multi-host JAX (no-op when single-process).

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
    or cluster auto-detection.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names=("ch",), shape=None) -> Mesh:
    """Mesh over every device of every process."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names=axis_names)


def replicate_from_host(mesh: Mesh, array: np.ndarray):
    """Replicate host data onto every device of a (possibly multi-host) mesh.

    Each process contributes its local copy; the data must be identical on
    all hosts (e.g. the per-block IQ window when every host reads the full
    stream).
    """
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, array)


def shard_from_hosts(mesh: Mesh, axis: str, local_array: np.ndarray):
    """Build a global array sharded along ``axis`` from per-host shards.

    For channel-axis scaling across hosts: each host supplies the state rows
    of the channels it owns; for time-axis scaling each host supplies its
    sub-window of samples (e.g. from a local RF front-end).
    """
    spec = [None] * local_array.ndim
    spec[0] = axis
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, local_array)
