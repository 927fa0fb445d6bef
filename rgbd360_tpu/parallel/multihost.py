"""Multi-host (pod-slice / multi-process) runtime glue.

The reference is a single shared-memory process (SURVEY.md section 2.5);
scaling past one host is new design.  This module carries the process-level
plumbing that `parallel/sharded.py`'s mesh programs need to run across
hosts, per the SURVEY section 5.8 plan:

  * `initialize()` — `jax.distributed.initialize` wrapper: env-driven, safe
    to call unconditionally (no-op when single-process or already up).
  * `global_mesh(axis)` — 1D mesh over every device in the job (all hosts).
    The sharded stages in `parallel/sharded.py` take any such mesh; on a
    pod slice the psum/all_gather/psum_scatter collectives ride ICI.
  * `hosts_mesh()` — 2D `(host, device)` mesh for stages that want to keep
    a reduction hierarchy (reduce within a host first, then across DCN).
  * `host_local_to_global` / `global_to_host_local` — boundary converters
    for feeding per-host shards (e.g. each host decoding its slice of a
    capture directory) into a globally-sharded array program.
  * `all_hosts_agree` — cheap cross-host consistency check for control
    decisions (keyframe insertion, loop-closure acceptance) that must not
    diverge between hosts.

Single-host behavior is identical to `parallel.sharded.make_mesh` — every
function degrades to the local-device case, which is how the test suite and
the driver's `dryrun_multichip` exercise it.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Bring up the cross-host runtime if this looks like a multi-process
    job; returns True when distributed mode is active.

    Resolution order: explicit args, then the standard env variables
    (`JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`),
    then TPU-pod auto-detection (argless `jax.distributed.initialize`
    discovers the slice topology on Cloud TPU).  Calling this in a
    single-process run is a no-op.
    """
    # NOTE: do NOT probe jax.process_count() here — it initializes the local
    # backend, after which jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU-pod / cluster auto-detection: argless initialize discovers the
        # slice topology (Cloud TPU metadata, SLURM, k8s).  Outside any
        # cluster it raises — single-process mode.  Probing
        # jax.process_count() here instead would initialize the local
        # backend and permanently break a later bring-up.
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized by the launcher
        pass
    return jax.process_count() > 1


def global_mesh(axis: str = "kf") -> Mesh:
    """1D mesh over every device in the job (all hosts' chips)."""
    return Mesh(np.array(jax.devices()), (axis,))


def hosts_mesh(host_axis: str = "host", device_axis: str = "device") -> Mesh:
    """2D `(host, device)` mesh: rows are processes, columns their local
    chips.  Use for hierarchical reductions (psum over `device` rides ICI
    within a host before the cross-host hop)."""
    devs = jax.devices()
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.empty((n_proc, per), dtype=object)
    for d in devs:
        grid[d.process_index, _local_slot(d, devs, per)] = d
    return Mesh(grid, (host_axis, device_axis))


def _local_slot(d, devs, per) -> int:
    same = [x for x in devs if x.process_index == d.process_index]
    return same.index(d)


def host_local_to_global(mesh: Mesh, pspec: P, local_arrays):
    """Assemble per-host shards into one global array (each host passes the
    piece it produced — e.g. the frames it decoded)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        out = jax.device_put(local_arrays, NamedSharding(mesh, pspec))
        return out
    return multihost_utils.host_local_array_to_global_array(
        local_arrays, mesh, pspec
    )


def global_to_host_local(mesh: Mesh, pspec: P, global_array):
    """Inverse of `host_local_to_global`: give each host its addressable
    piece as a host-local array."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return jax.device_get(global_array)
    return multihost_utils.global_array_to_host_local_array(
        global_array, mesh, pspec
    )


def all_hosts_agree(value) -> bool:
    """True iff every process computed the same scalar `value` (control
    decisions like keyframe insertion must not diverge across hosts; the
    reference's analogue was a mutex-guarded shared map — SURVEY 5.2)."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    arr = np.asarray([np.float64(value)])
    gathered = multihost_utils.process_allgather(arr)
    return bool(np.all(gathered == gathered[0]))
