"""Smoke-test the full MPC pipeline for every dynamics formulation.

Small horizons / few iterations: these verify that each formulation's
transcription + solver + retraction runs and stays finite, mirroring the
reference's ability to switch dynamics via make_ocp (ocp_factory.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import Go2, B2G, MPC, SQPConfig, ADMMConfig

CONFIG = SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=15))


@pytest.mark.parametrize("dynamics", [
    "centroidal_vel",
    "centroidal_acc",
    "whole_body_acc",
    "whole_body_rnea",
    "whole_body_aba",
])
def test_go2_mpc_smoke(dynamics):
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics=dynamics, nodes=3, config=CONFIG)
    run = jax.jit(lambda: mpc.run(3, jnp.array([0.1, 0, 0, 0, 0, 0])))
    carry, outs = run()
    x = np.asarray(outs["x"])
    assert np.all(np.isfinite(x))
    assert np.all(np.isfinite(np.asarray(outs["max_violation"])))
    # retraction works for every formulation
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    for k in ["q", "v", "a", "forces", "tau"]:
        assert np.all(np.isfinite(np.asarray(sol[k]))), k
    assert sol["q"].shape == (3, mpc.form.nq)


def test_b2g_arm_ext_force_smoke():
    """B2G with arm: ext-force + arm-velocity constraint paths."""
    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=3, config=CONFIG)
    assert mpc.trans.has_ext and mpc.trans.has_arm
    run = jax.jit(lambda: mpc.run(
        2, jnp.array([0.1, 0, 0, 0, 0, 0]),
        ext_force_des=jnp.array([0.0, 0, -20.0]),
        arm_vel_des=jnp.zeros(3),
    ))
    carry, outs = run()
    assert np.all(np.isfinite(np.asarray(outs["x"])))


def test_include_base_false_paths():
    """The base-eliminated variants exercise base_vel/base_acc dynamics
    inside the transcription (ocp_args include_base=False branch)."""
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    for dynamics in ["centroidal_vel", "centroidal_acc", "whole_body_acc"]:
        mpc = MPC(robot, dynamics=dynamics, nodes=3, config=CONFIG,
                  include_base=False)
        carry, stats = jax.jit(
            lambda mpc=mpc: mpc.step(
                mpc.init_carry(), jnp.float32(0.0),
                jnp.array([0.1, 0, 0, 0, 0, 0]),
            )
        )()
        assert np.isfinite(float(stats["max_violation"]))
