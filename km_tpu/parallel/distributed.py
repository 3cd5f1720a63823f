"""Multi-host bring-up: jax.distributed initialization and mesh
construction over a full pod slice.

The reference composes work with Unix pipes and shell loops over
samples (reference: example/run_leucegene.sh:29-35); there is no
distributed runtime to mirror. Here a cohort run spans hosts: each host
calls :func:`initialize` once at startup, then builds a global mesh with
:func:`global_mesh`. Read chunks are fed per-host (each host only
touches its local FASTQ shards); the count-table shard axis spans all
devices of the slice so the table can exceed one host's HBM.
"""

from __future__ import annotations

import logging as log
import os

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    On TPU pods all arguments are discovered from the environment; they
    can be forced for other topologies. Safe to call when single-host
    (no coordinator configured): it becomes a no-op.
    """
    explicit = (coordinator_address is not None or num_processes is not None
                or "JAX_COORDINATOR_ADDRESS" in os.environ
                or "COORDINATOR_ADDRESS" in os.environ)
    if jax.distributed.is_initialized():
        log.info("jax.distributed already initialized; skipping")
        return
    if not explicit:
        workers = [h for h in
                   os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
                   if h.strip()]
        if len(workers) <= 1:  # zero or one worker: nothing to do
            log.info("single-host environment: skipping "
                     "jax.distributed.initialize")
            return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        if explicit:
            raise
        # the only implicit-path failure is calling after a backend is
        # already live (initialize must precede any JAX call); a no-op
        # keeps library callers safe there, like the reference's
        # libraries tolerate being driven from any shell context
        log.info("late call (backend already live): skipping "
                 "jax.distributed.initialize")
        return
    log.info("jax.distributed initialized: process %d of %d",
             jax.process_index(), jax.process_count())


def global_mesh(shard_axis: str = "shard", reads_axis: str | None = None,
                reads: int = 1) -> Mesh:
    """A mesh over every device of the slice (all hosts).

    With ``reads_axis`` set, returns a 2-D (reads, shard) mesh — reads
    data-parallel over ``reads`` groups, the table sharded across the
    rest — matching km_tpu.parallel.pipeline_step's axes. Device order
    follows jax.devices(), so the shard axis stays contiguous within a
    host (table exchange prefers ICI over DCN).
    """
    devices = np.array(jax.devices())
    if reads_axis is None:
        return Mesh(devices, (shard_axis,))
    assert devices.size % reads == 0, (
        f"{devices.size} devices do not split into {reads} read groups")
    return Mesh(devices.reshape(reads, devices.size // reads),
                (reads_axis, shard_axis))


def local_read_shards(paths: list[str]) -> list[str]:
    """Partition input read files across hosts: host i takes files
    i, i+P, i+2P, ... — the multi-host analog of the reference's
    per-sample shell fan-out."""
    p = jax.process_index()
    n = jax.process_count()
    return list(paths)[p::n]
