"""Scenario batching and multi-chip sharding.

The reference is single-process/single-robot (SURVEY.md §2.3); this module
is the rebuild's parallelism layer: thousands of MPC instances
(robots x gaits x target perturbations) batched per chip with vmap and
sharded over a device mesh with jax.sharding — XLA inserts the collectives.
Per-solve data never crosses chips (each MPC instance is chip-local); only
benchmark/stat reductions do.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("dp",), shape=None):
    """Build a device mesh. Default: 1-D data-parallel over all devices."""
    devices = jax.devices() if devices is None else devices
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    assert shape is not None, "provide shape for multi-axis meshes"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, axes=("dp",)):
    """NamedSharding that splits the leading (scenario) axis."""
    return NamedSharding(mesh, P(axes))


def shard_batch(tree, mesh, axes=("dp",)):
    """Shard the leading (scenario) axis of every leaf over the mesh."""
    sh = batch_sharding(mesh, axes)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def batched_step(mpc, donate=True, per_scenario_time=False):
    """Jitted, vmapped MPC tick: (carries, t, targets) -> (carries, stats).

    Shard the carry/target batch with shard_batch() first; XLA keeps every
    scenario chip-local (no per-solve communication, SURVEY.md §2.3).

    per_scenario_time=True gives each scenario its own clock (t is a
    (batch,) array) so a single batch sweeps gait phases — the
    "robots x gaits x target-perturbations" axis of BASELINE.json config #5.
    """
    def one(carry, t, base_vel_des):
        return mpc.step(carry, t, base_vel_des)

    t_axis = 0 if per_scenario_time else None
    vstep = jax.vmap(one, in_axes=(0, t_axis, 0))
    return jax.jit(vstep, donate_argnums=(0,) if donate else ())


def batched_init(mpc, batch):
    """Replicate the initial carry across a scenario batch."""
    carry = mpc.init_carry()
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), carry
    )


def batched_run(mpc, n_loops, base_vel_des_batch, mesh=None, axes=("dp",)):
    """Run a batch of full MPC rollouts, optionally sharded over a mesh."""
    base_vel_des_batch = jnp.asarray(base_vel_des_batch, dtype=jnp.float32)

    def one(base_vel_des):
        return mpc.run(n_loops, base_vel_des)

    fn = jax.vmap(one)
    if mesh is not None:
        base_vel_des_batch = jax.device_put(
            base_vel_des_batch, batch_sharding(mesh, axes)
        )
    return jax.jit(fn)(base_vel_des_batch)
