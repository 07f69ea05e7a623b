"""Multi-host initialization helpers.

The reference is single-process/single-GPU (SURVEY.md §2.7); this
framework scales across hosts with JAX's built-in runtime: call
``init_distributed()`` once per process before building meshes, then the
same mesh code runs over ICI within a slice and DCN across hosts.
Typical deployment: timepoints data-parallel across hosts ('dp'),
volumes sharded across each host's chips ('sp')."""

from __future__ import annotations

import os


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process (nothing configured)."""
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False  # single-process run
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None or "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(process_id or os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def shard_timepoints(timepoints, process_id=None, num_processes=None):
    """Static round-robin split of a timepoint list across processes —
    the multi-host data parallelism for the batch driver (each host runs
    its own spim_fusion_batch over its share; outputs land in the shared
    output tree keyed by timepoint index, so no coordination is needed)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [t for i, t in enumerate(timepoints) if i % n == pid]
