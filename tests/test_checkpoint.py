"""Checkpoint/resume: a restored carry must continue bit-identically."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig
from tpu_locoman.checkpoint import save_carry, load_carry


def test_save_load_resume(tmp_path):
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3,
              config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10)))
    step = jax.jit(lambda c, t: mpc.step(c, t, jnp.array([0.1, 0, 0, 0, 0, 0])))
    carry = mpc.init_carry()
    for k in range(3):
        carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
    assert int(stats["status"]) in (0, 1)

    path = str(tmp_path / "carry.npz")
    save_carry(path, carry)
    restored = load_carry(path)

    c1, s1 = step(carry, jnp.float32(0.03))
    c2, s2 = step(restored, jnp.float32(0.03))
    np.testing.assert_array_equal(np.asarray(c1.x_init), np.asarray(c2.x_init))
    np.testing.assert_array_equal(
        np.asarray(c1.solver_state.Z), np.asarray(c2.solver_state.Z)
    )
