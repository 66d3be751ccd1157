"""Batched/sharded scenario tests: mesh sharding, per-scenario gait phases,
payload variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import Go2, B2, MPC, SQPConfig, ADMMConfig
from tpu_locoman.parallel import (
    make_mesh, shard_batch, batched_step, batched_init,
)

CONFIG = SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10))


def test_sharded_batch_runs_on_mesh():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3, config=CONFIG)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = 16
    carries = shard_batch(batched_init(mpc, batch), mesh)
    targets = shard_batch(
        jnp.tile(jnp.array([0.1, 0, 0, 0, 0, 0]), (batch, 1)), mesh
    )
    step = batched_step(mpc, donate=False)
    new_carries, stats = step(carries, jnp.float32(0.0), targets)
    assert np.asarray(stats["max_violation"]).shape == (batch,)
    assert np.all(np.isfinite(np.asarray(new_carries.x_init)))


def test_per_scenario_gait_phase_sweep():
    """Each scenario at a different gait phase -> different schedules and
    different solutions (the gait-sweep axis of BASELINE config #5)."""
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3, config=CONFIG)
    batch = 4
    carries = batched_init(mpc, batch)
    targets = jnp.tile(jnp.array([0.1, 0, 0, 0, 0, 0]), (batch, 1))
    ts = jnp.array([0.0, 0.07, 0.13, 0.31], dtype=jnp.float32)
    step = batched_step(mpc, donate=False, per_scenario_time=True)
    new_carries, _ = step(carries, ts, targets)
    x = np.asarray(new_carries.x_init)
    assert np.all(np.isfinite(x))
    # different phases produce different states
    assert not np.allclose(x[0], x[3], atol=1e-5)


def test_b2_payload_variants():
    """B2 with front/rear payload frames adds the external-force variable
    (reference utils/robot.py:70-76)."""
    for payload in ["front", "rear"]:
        robot = B2(payload=payload)
        robot.set_gait_sequence("trot", 0.5)
        assert robot.nf == 15
        assert robot.ext_force_frame == f"payload_joint_{payload}"
        mpc = MPC(robot, dynamics="whole_body_rnea", nodes=3, config=CONFIG)
        assert mpc.trans.has_ext and not mpc.trans.has_arm
        carry, stats = jax.jit(
            lambda mpc=mpc: mpc.step(
                mpc.init_carry(), jnp.float32(0.0),
                jnp.array([0.1, 0, 0, 0, 0, 0]),
            )
        )()
        assert np.isfinite(float(stats["max_violation"]))


def test_rnea_no_acc_variant():
    """include_acc=False: accelerations by finite difference
    (ocp_whole_body_rnea.py get_a else-branch)."""
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=3, config=CONFIG,
              include_acc=False)
    assert mpc.form.na_opt == 0
    carry, stats = jax.jit(
        lambda: mpc.step(mpc.init_carry(), jnp.float32(0.0),
                         jnp.array([0.1, 0, 0, 0, 0, 0]))
    )()
    assert np.isfinite(float(stats["max_violation"]))


def test_mixed_gait_batch_via_stage_params():
    """Different gait schedules per scenario through the stage_params
    override (full robots x gaits sweep support)."""
    from tpu_locoman.gait import GaitSequence

    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3, config=CONFIG)

    trot_sp = mpc.make_stage_params(jnp.float32(0.0))
    walk = GaitSequence("walk", 0.6)
    c, s = walk.get_gait_schedule(jnp.float32(0.0), mpc.dts)
    walk_sp = trot_sp._replace(contact=c.T, swing=s.T)
    sps = jax.tree.map(lambda a, b: jnp.stack([a, b]), trot_sp, walk_sp)

    carries = __import__("tpu_locoman.parallel", fromlist=["batched_init"]).batched_init(mpc, 2)
    step = jax.jit(jax.vmap(
        lambda carry, sp: mpc.step(
            carry, jnp.float32(0.0), jnp.array([0.1, 0, 0, 0, 0, 0]),
            stage_params=sp),
        in_axes=(0, 0),
    ))
    new_carries, stats = step(carries, sps)
    x = np.asarray(new_carries.x_init)
    assert np.all(np.isfinite(x))
    assert not np.allclose(x[0], x[1], atol=1e-6)  # different gaits differ


def test_host_chip_mesh_2d_sharding():
    """2-D (host x chip) mesh: batch sharded over both axes still runs
    (virtualized: 1 process x 8 devices -> reshape to (2, 4) manually)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3, config=CONFIG)
    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("host", "chip"))
    batch = 8
    sh = NamedSharding(mesh, P(("host", "chip")))
    carries = jax.tree.map(
        lambda x: jax.device_put(x, sh),
        __import__("tpu_locoman.parallel", fromlist=["batched_init"]).batched_init(mpc, batch),
    )
    targets = jax.device_put(
        jnp.tile(jnp.array([0.1, 0, 0, 0, 0, 0]), (batch, 1)), sh
    )
    from tpu_locoman.parallel import batched_step
    step = batched_step(mpc, donate=False)
    new_carries, stats = step(carries, jnp.float32(0.0), targets)
    assert np.all(np.isfinite(np.asarray(new_carries.x_init)))
