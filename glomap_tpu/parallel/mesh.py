"""Device mesh + observation sharding helpers.

The distributed design (SURVEY.md §2.3): the big axes of global SfM are
observations (tracks x views) and view-graph edges. Both enter every
solver exclusively through gather -> elementwise -> segment_sum chains,
so sharding the OBSERVATION axis across devices and keeping the (much
smaller) frame/camera/point parameter blocks replicated lets XLA's SPMD
partitioner turn each segment-sum into a local partial + one AllReduce
(psum) over ICI — the Schur-reduced camera system assembly of
BASELINE.json. No NCCL/MPI translation: just jax.sharding annotations.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_to_multiple(arrays: dict, n: int, pad_value=0):
    """Pad leading axis of every array to a multiple of n. Entries named
    in WEIGHT_KEYS get zero padding so padded rows are no-ops."""
    out = {}
    total = None
    for k, a in arrays.items():
        if total is None:
            total = a.shape[0]
        pad = (-total) % n
        if pad == 0:
            out[k] = a
        else:
            pad_width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            out[k] = np.pad(np.asarray(a), pad_width, constant_values=0)
    return out


def shard_obs(mesh: Mesh, arr, axis: str | None = None):
    """Place an observation-axis array with a sharded leading dim
    (multi-process safe: each host uploads only its shards). The shard
    axis defaults to the mesh's own first axis name."""
    from glomap_tpu.parallel.multihost import put_global
    return put_global(np.asarray(arr), mesh, P(axis or mesh.axis_names[0]))


def replicate(mesh: Mesh, arr):
    from glomap_tpu.parallel.multihost import put_global
    return put_global(np.asarray(arr), mesh, P())
