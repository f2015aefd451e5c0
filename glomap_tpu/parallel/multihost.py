"""Multi-host distribution plumbing (jax.distributed).

The reference has no multi-node layer at all (SURVEY.md §2.3); this is
the TPU-native replacement: one JAX process per host joins a coordination
service, the global device mesh spans every chip in the pod slice, and
the partition-aware solvers (parallel/partitioned_ba) run unchanged —
shard_map + psum ride ICI within a slice and DCN across slices, with XLA
choosing the collective implementation.

Host-side data flow: every process ingests the same scene (or its own DB
shard) and materializes only its mesh-local partitions via
jax.make_array_from_callback, so no host ever holds all device shards.

Validated by tests/test_multihost.py: two CPU processes x 4 virtual
devices form one 8-device mesh and reproduce the single-process solve.
"""

from __future__ import annotations

import os
import logging

import numpy as np
import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or bootstrap) the jax.distributed coordination service.

    Arguments default to the GLOMAP_COORDINATOR / GLOMAP_NUM_PROCESSES /
    GLOMAP_PROCESS_ID environment variables; on TPU pods with the
    standard launcher all three may be None (jax auto-detects).
    """
    coordinator_address = coordinator_address or \
        os.environ.get("GLOMAP_COORDINATOR")
    if num_processes is None and "GLOMAP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GLOMAP_NUM_PROCESSES"])
    if process_id is None and "GLOMAP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GLOMAP_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def global_mesh(axis: str = "part"):
    """1-D mesh over every device of every process."""
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0


def put_global(arr: np.ndarray, mesh, spec):
    """Materialize a host array as a (possibly multi-process) global
    jax.Array: each process uploads only its addressable shards."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.ascontiguousarray(arr[idx]))


def fetch_global(x) -> np.ndarray:
    """Bring a global (possibly cross-process sharded) array to every
    host as numpy."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
