"""AOT export/deserialize round trip (codegen-path analog)."""

import numpy as np
import jax.numpy as jnp

from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig
from tpu_locoman.aot import export_mpc_step, export_retract, load_artifact


def test_export_roundtrip_step():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(
        robot,
        dynamics="centroidal_acc",
        nodes=3,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=5)),
    )
    data = export_mpc_step(mpc)
    assert len(data) > 1000
    fn = load_artifact(data)
    carry = mpc.init_carry()
    out_carry, viol = fn(
        carry,
        jnp.float32(0.0),
        jnp.zeros(6, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
    )
    assert np.isfinite(float(viol))
    # matches the in-process step
    ref_carry, stats = mpc.step(carry, jnp.float32(0.0), jnp.zeros(6))
    # compiled-separately paths may reorder float ops
    np.testing.assert_allclose(
        np.asarray(out_carry.x_init), np.asarray(ref_carry.x_init),
        rtol=1e-2, atol=1e-3,
    )


def test_export_retract():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(
        robot,
        dynamics="centroidal_acc",
        nodes=3,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=5)),
    )
    data = export_retract(mpc, num_steps=2)
    fn = load_artifact(data)
    Z = jnp.zeros((mpc.nodes + 1, mpc.trans.s), dtype=jnp.float32)
    x0 = jnp.asarray(mpc.form.x_nom(), dtype=jnp.float32)
    q, v, a, forces, tau = fn(Z, x0)
    assert q.shape == (2, mpc.form.nq)
    assert tau.shape == (2, mpc.form.nj)
    np.testing.assert_allclose(np.asarray(q[0]), np.asarray(x0[: mpc.form.nq]),
                               atol=1e-5)
