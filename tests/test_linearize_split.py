"""Split linearization (analytic affine rows + jacrev nonlinear rows) must
match the full-jacfwd reference path exactly (both differentiate the same
stage residual; the reference one-shots jacobian(g, x), ocp.py:283)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig


def _mpc(dynamics):
    if dynamics in ("whole_body_rnea", "whole_body_aba"):
        robot = B2G()
    elif dynamics == "whole_body_acc":
        robot = B2(payload="front")
    else:
        robot = Go2()
    robot.set_gait_sequence("trot", 0.8)
    return MPC(robot, dynamics=dynamics, nodes=5)


@pytest.mark.parametrize(
    "dynamics",
    [
        "centroidal_vel",
        "centroidal_acc",
        "whole_body_acc",
        "whole_body_rnea",
        "whole_body_aba",
    ],
)
def test_split_matches_full(dynamics):
    mpc = _mpc(dynamics)
    trans = mpc.trans
    assert trans.split_ok, f"{dynamics} default config should support split"

    carry = mpc.init_carry()
    shared = mpc.make_shared(
        carry.x_init, jnp.array([0.2, 0.0, 0, 0, 0, 0]),
        tau_prev=carry.tau_prev,
    )
    sp = mpc.make_stage_params(jnp.float32(0.13))  # mixed contact/swing
    rng = np.random.default_rng(3)
    Z = mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
    Z = Z + jnp.asarray(
        rng.normal(size=Z.shape) * 0.02, dtype=jnp.float32
    )

    g_s, G_s, B_s, C_s = jax.jit(trans.linearize)(Z, sp, shared)

    trans.split_ok = False
    g_f, G_f, B_f, C_f = jax.jit(trans.linearize)(Z, sp, shared)
    trans.split_ok = True

    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_f), atol=1e-6)
    for name, a, b in [("G", G_s, G_f), ("B", B_s, B_f), ("C", C_s, C_f)]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg=f"{dynamics} {name} mismatch",
        )


def test_fallback_configs_use_full_path():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=4, include_base=False)
    assert not mpc.trans.split_ok
    # and the full path still linearizes
    carry = mpc.init_carry()
    shared = mpc.make_shared(carry.x_init, jnp.zeros(6),
                             tau_prev=carry.tau_prev)
    sp = mpc.make_stage_params(jnp.float32(0.0))
    g, G, B, C = mpc.trans.linearize(carry.solver_state.Z, sp, shared)
    assert np.all(np.isfinite(np.asarray(G)))
