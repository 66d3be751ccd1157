"""Euler-ZYX composite base (use_quaternion=False) parity tests
(reference utils/robot.py:13-18)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import rbda, lie
from tpu_locoman.robots import Go2
from tpu_locoman import MPC, SQPConfig, ADMMConfig


@pytest.fixture(scope="module")
def robots():
    return Go2(use_quaternion=True), Go2(use_quaternion=False)


@pytest.fixture(scope="module")
def sample(robots):
    _, re = robots
    rng = np.random.default_rng(11)
    me = re.model
    q_e = np.asarray(re.q0).copy()
    q_e[:3] += rng.normal(size=3) * 0.1
    q_e[3:6] = rng.normal(size=3) * 0.3  # euler angles (|pitch| < pi/2)
    q_e[6:] += rng.normal(size=me.nj) * 0.2
    v_e = rng.normal(size=me.nv) * 0.4
    a_e = rng.normal(size=me.nv) * 0.4
    return (jnp.asarray(q_e, jnp.float32), jnp.asarray(v_e, jnp.float32),
            jnp.asarray(a_e, jnp.float32))


def _to_ff(robots, q_e, v_e, a_e):
    """Equivalent free-flyer configuration and (local-twist) velocities."""
    rq, re = robots
    me = re.model
    R = lie.euler_zyx_to_matrix(q_e[3:6])
    quat = lie.so3_exp_quat(lie.so3_log_matrix(R))
    q_ff = jnp.concatenate([q_e[:3], quat, q_e[6:]])
    v_loc = rbda._base_vloc(me, q_e, v_e)
    a_loc = rbda._base_aloc(me, q_e, v_e, a_e)
    v_ff = jnp.concatenate([v_loc, v_e[6:]])
    a_ff = jnp.concatenate([a_loc, a_e[6:]])
    return q_ff, v_ff, a_ff


def test_dims(robots):
    rq, re = robots
    assert re.nq == rq.nq - 1  # 6 base coords instead of 7
    assert re.nv == rq.nv
    assert re.model.base_type == "euler_zyx"


def test_fk_matches_freeflyer(robots, sample):
    rq, re = robots
    q_e, v_e, a_e = sample
    q_ff, _, _ = _to_ff(robots, q_e, v_e, a_e)
    p_e = rbda.frame_position(re.model, "FR_foot", q_e)
    p_f = rbda.frame_position(rq.model, "FR_foot", q_ff)
    np.testing.assert_allclose(np.asarray(p_e), np.asarray(p_f), atol=1e-5)


def test_rnea_matches_freeflyer_through_chart(robots, sample):
    rq, re = robots
    q_e, v_e, a_e = sample
    q_ff, v_ff, a_ff = _to_ff(robots, q_e, v_e, a_e)
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    rng = np.random.default_rng(2)
    forces = jnp.asarray(rng.normal(size=12) * 20, jnp.float32)
    tau_e = rbda.rnea(re.model, q_e, v_e, a_e, feet, forces)
    tau_f = rbda.rnea(rq.model, q_ff, v_ff, a_ff, feet, forces)
    J = rbda._base_jac(re.model, q_e)
    tau_f_chart = jnp.concatenate([J.T @ tau_f[:6], tau_f[6:]])
    scale = float(jnp.max(jnp.abs(tau_f_chart))) + 1.0
    np.testing.assert_allclose(
        np.asarray(tau_e), np.asarray(tau_f_chart), atol=2e-3 * scale
    )


def test_eom_vs_rnea_euler(robots, sample):
    """The reference debug identity holds in the euler chart."""
    _, re = robots
    model = re.model
    q, v, a = sample
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    rng = np.random.default_rng(3)
    forces = jnp.asarray(rng.normal(size=12) * 20, jnp.float32)
    M = rbda.crba(model, q)
    nle = rbda.nonlinear_effects(model, q, v)
    tau_ext = jnp.zeros(model.nv)
    for idx, f in enumerate(feet):
        Jf = rbda.frame_jacobian_lwa(model, f, q)
        tau_ext = tau_ext + Jf[:3].T @ forces[3 * idx: 3 * idx + 3]
    tau_eom = M @ a + nle - tau_ext
    tau_rnea = rbda.rnea(model, q, v, a, feet, forces)
    scale = float(jnp.max(jnp.abs(tau_eom))) + 1.0
    np.testing.assert_allclose(
        np.asarray(tau_eom), np.asarray(tau_rnea), atol=3e-3 * scale
    )


def test_aba_inverse_euler(robots, sample):
    _, re = robots
    q, v, a = sample
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    forces = jnp.zeros(12)
    tau = rbda.rnea(re.model, q, v, a, feet, forces)
    a_rt = rbda.aba(re.model, q, v, tau, feet, forces)
    np.testing.assert_allclose(np.asarray(a_rt), np.asarray(a),
                               rtol=5e-3, atol=5e-3)


def test_mpc_smoke_euler_base():
    robot = Go2(use_quaternion=False)
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(robot, dynamics="centroidal_acc", nodes=3,
              config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10)))
    carry, stats = jax.jit(
        lambda: mpc.step(mpc.init_carry(), jnp.float32(0.0),
                         jnp.array([0.1, 0, 0, 0, 0, 0]))
    )()
    assert np.isfinite(float(stats["max_violation"]))
    assert np.all(np.isfinite(np.asarray(carry.x_init)))
