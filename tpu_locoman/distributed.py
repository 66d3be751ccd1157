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

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap (no-op in single-process environments)."""
    if num_processes is None or num_processes <= 1:
        return False
    if (
        coordinator_address
        and coordinator_address.split(":")[0] in ("localhost", "127.0.0.1")
        and "GLOO_SOCKET_IFNAME" not in os.environ
    ):
        # Multi-process-on-one-machine (tests/demos): XLA's CPU collectives
        # (Gloo) pick a default NIC whose address peers cannot reach in
        # sandboxed environments — pin them to loopback, matching the
        # localhost coordinator.
        os.environ["GLOO_SOCKET_IFNAME"] = "lo"
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


def warmup_collectives(mesh=None):
    """Establish the cross-process collective transport while processes are
    still in lockstep; returns the device count (sanity: one all-reduce).

    The first collective of a program triggers the transport rendezvous
    (Gloo on CPU), which carries a ~30 s key-exchange deadline. If
    processes reach their first REAL collective far apart — e.g. one hits
    the compilation cache while another recompiles for minutes — the early
    process times out (`GetKeyValue() timed out`, measured in this sandbox
    with the MPC demo program). One trivial all-reduce right after
    initialize(), when every process sits at the same line, creates the
    communicator clique up front; later collectives over the same devices
    reuse it regardless of compile skew."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = host_chip_mesh()
    n = mesh.devices.size
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(mesh.axis_names)),
        np.ones(len(jax.local_devices()), np.float32),
        (n,),
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(x)
    np.testing.assert_allclose(float(total), n)
    return n


def local_batch_slice(global_batch):
    """The scenario indices this process owns under host-axis sharding."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = global_batch // n_proc
    return slice(pid * per, (pid + 1) * per)
