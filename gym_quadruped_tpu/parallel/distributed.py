"""Multi-host runtime: jax.distributed bring-up + cross-process mesh/data helpers.

SURVEY.md §2 (parallelism item 4): the NCCL/MPI-equivalent runtime is
`jax.distributed.initialize` + XLA collectives over ICI (intra-slice) and DCN
(cross-host). This module is the entry point the reference never needed (it is
single-process, quadruped_env.py is one MjData): call `initialize()` once per
process on a pod, then `global_mesh()` returns the (dcn, ici) mesh spanning every
host, and `host_local_batch()` assembles a globally-sharded jax.Array from each
host's local env shard — after which the exact same `vmap(env.step)` program from
parallel.mesh runs SPMD across the pod with zero code changes.

Single-process (CI, one chip, virtual CPU mesh) all helpers degrade to no-ops,
so the same script runs everywhere:

    from gym_quadruped_tpu.parallel import distributed as dist
    dist.initialize()                      # no-op off-pod
    mesh = dist.global_mesh()              # (hosts, local_chips)
    keys = dist.host_local_batch(mesh, per_host_keys)   # global array
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the cross-host runtime (idempotent).

    On TPU pods with standard launchers (GKE, xmanager, ray) all arguments are
    auto-detected by JAX from the environment; on manual launches pass them or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID. A plain
    single-process run (no coordinator configured) is a no-op.
    """
    global _INITIALIZED
    # do NOT probe jax.process_count() here: it initializes the XLA backend,
    # after which jax.distributed.initialize refuses to run (found by the
    # two-process evidence run, scripts/run_two_process.py)
    if _INITIALIZED or jax.distributed.is_initialized():
        _INITIALIZED = True
        return
    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    env_np = os.environ.get('JAX_NUM_PROCESSES')
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get('JAX_PROCESS_ID')
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def global_mesh(axis_names=('dcn', 'ici'),
                max_devices: int | None = None) -> Mesh:
    """(hosts × per-host chips) mesh over ALL devices in the job. The dcn axis
    indexes processes (collectives over it ride the data-center network), the
    ici axis the chips within a host/slice. `max_devices` caps the total device
    count (driver dry-runs validate an n-device mesh on a larger host)."""
    n_proc = max(jax.process_count(), 1)
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    per_host = len(devices) // n_proc
    # order devices so each mesh row is one process's local devices
    rows = []
    for p in range(n_proc):
        rows.append(sorted((d for d in devices if d.process_index == p),
                           key=lambda d: d.id)[:per_host])
    return Mesh(np.asarray(rows), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading env-batch axis sharded over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names))


def host_local_batch(mesh: Mesh, local_tree):
    """Assemble a globally-sharded batch from each process's local shard.

    `local_tree` holds this host's slice of the batch (leading axis =
    B_global / process_count). Returns a pytree of global jax.Arrays laid out
    with batch_sharding(mesh). Single-process: equivalent to device_put."""
    sharding = batch_sharding(mesh)
    n_proc = max(jax.process_count(), 1)

    def make(x):
        x = np.asarray(x)
        if n_proc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(make, local_tree)


def all_hosts_sum(x):
    """Scalar reduction across the whole job (metrics aggregation); identity on
    a single process."""
    if max(jax.process_count(), 1) == 1:
        return float(np.asarray(x))
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray(x, np.float64))
    return float(np.sum(vals))
