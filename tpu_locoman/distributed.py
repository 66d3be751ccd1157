"""Multi-host distributed setup.

The reference has no distributed backend (SURVEY.md §2.3); this module is
the rebuild's DCN/ICI layer: jax.distributed initialization for multi-host
pods and (hosts x chips) mesh construction, with the scenario batch sharded
over both axes.  Within a host the shards ride ICI; across hosts DCN — each
MPC instance stays chip-local either way, so the only cross-device traffic
is result aggregation.

Usage on a pod slice (one process per host):

    from tpu_locoman.distributed import initialize, host_chip_mesh
    initialize(coordinator_address=..., num_processes=..., process_id=...)
    mesh = host_chip_mesh()
    # shard scenario batches with parallel.shard_batch(tree, mesh,
    #   axes=("host", "chip"))
"""

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap (no-op in single-process environments)."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_chip_mesh(axis_names=("host", "chip")):
    """2-D (hosts x chips-per-host) mesh over all devices.

    On a single host this degenerates to (1, n_devices); scenario batches
    sharded over both axes split across chips only.
    """
    devices = jax.devices()
    n_proc = jax.process_count()
    per_host = len(devices) // n_proc
    dev_array = np.asarray(devices).reshape(n_proc, per_host)
    return Mesh(dev_array, axis_names)


def local_batch_slice(global_batch):
    """The scenario indices this process owns under host-axis sharding."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = global_batch // n_proc
    return slice(pid * per, (pid + 1) * per)
