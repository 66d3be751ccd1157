"""Cross-formulation consistency tests.

Strategy: build a physically consistent (q, v, a, forces, tau) tuple via the
rigid-body kernels, then check that each formulation's dynamics residual
vanishes on decision variables encoding that tuple.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_locoman import rbda
from tpu_locoman.robots import Go2, B2G
from tpu_locoman.dynamics import make_formulation
from tpu_locoman.dynamics.formulations import StageParams


def consistent_sample(robot, seed=0):
    rng = np.random.default_rng(seed)
    model = robot.model
    q = np.asarray(robot.q0, dtype=np.float64).copy()
    q[7:] += rng.normal(size=model.nj) * 0.1
    v = rng.normal(size=model.nv) * 0.3
    tau_j = rng.normal(size=model.nj) * 5.0
    feet = list(robot.foot_frames)
    ee = feet + ([robot.ext_force_frame] if robot.ext_force_frame else [])
    forces = np.zeros(3 * len(ee))
    forces[2::3] = rbda.GRAVITY * model.total_mass / 4.0
    if robot.ext_force_frame:
        forces[-3:] = 0.0
    q = jnp.asarray(q, dtype=jnp.float32)
    v = jnp.asarray(v, dtype=jnp.float32)
    tau = jnp.concatenate([jnp.zeros(6), jnp.asarray(tau_j, dtype=jnp.float32)])
    forces = jnp.asarray(forces, dtype=jnp.float32)
    a = rbda.aba(model, q, v, tau, ee, forces)
    return q, v, a, forces, tau[6:]


def sp_for(form, dt=0.02):
    return StageParams(
        dt=jnp.float32(dt),
        contact=jnp.ones(4),
        swing=jnp.zeros(4),
        state_mask=jnp.float32(1.0),
        tau_mask=jnp.float32(1.0),
        node0_mask=jnp.float32(1.0),
    )


@pytest.fixture(scope="module")
def b2g():
    r = B2G()
    r.set_gait_sequence("trot", 0.8)
    return r


@pytest.fixture(scope="module")
def go2():
    r = Go2()
    r.set_gait_sequence("trot", 0.5)
    return r


def _dyn_scale(form):
    return rbda.GRAVITY * form.mass


def test_whole_body_rnea_residual_vanishes(b2g):
    form = make_formulation("whole_body_rnea", b2g)
    q, v, a, forces, tau_j = consistent_sample(b2g)
    x_init = jnp.concatenate([q, v])
    dt = 0.02
    dx = jnp.zeros(form.ndx)
    # dx_next consistent with Euler propagation
    dx_next = jnp.concatenate([v * dt, a * dt])
    u = jnp.concatenate([a, forces, tau_j])
    r = form.dyn_residual(x_init, dx, u, dx_next, sp_for(form, dt))
    nv = form.nv
    scale = _dyn_scale(form)
    # q rows, v rows exact; rnea base rows ~0 (a from ABA); tau rows ~0
    np.testing.assert_allclose(r[: 2 * nv], 0.0, atol=1e-4)
    np.testing.assert_allclose(r[2 * nv: 2 * nv + 6], 0.0, atol=2e-3 * scale)
    np.testing.assert_allclose(r[2 * nv + 6:], 0.0, atol=2e-3 * scale)


def test_whole_body_aba_residual_vanishes(b2g):
    form = make_formulation("whole_body_aba", b2g)
    q, v, a, forces, tau_j = consistent_sample(b2g)
    x_init = jnp.concatenate([q, v])
    dt = 0.02
    dx = jnp.zeros(form.ndx)
    dx_next = jnp.concatenate([v * dt, a * dt])
    u = jnp.concatenate([tau_j, forces])
    r = form.dyn_residual(x_init, dx, u, dx_next, sp_for(form, dt))
    np.testing.assert_allclose(r[: form.nv], 0.0, atol=1e-4)
    # v rows: a from ABA inside matches constructed a
    np.testing.assert_allclose(r[form.nv:], 0.0, atol=5e-3)


def test_whole_body_acc_gaps_vanish(b2g):
    form = make_formulation("whole_body_acc", b2g, include_base=True)
    q, v, a, forces, _ = consistent_sample(b2g)
    x_init = jnp.concatenate([q, v])
    dt = 0.02
    dx = jnp.zeros(form.ndx)
    dx_next = jnp.concatenate([v * dt, a * dt])
    u = jnp.concatenate([a, forces])
    r = form.dyn_residual(x_init, dx, u, dx_next, sp_for(form, dt))
    scale = _dyn_scale(form)
    np.testing.assert_allclose(r[: 2 * form.nv], 0.0, atol=1e-4)
    np.testing.assert_allclose(r[2 * form.nv:], 0.0, atol=2e-3 * scale)


def test_centroidal_acc_gaps_vanish(go2):
    """Centroidal gaps A a + Adot v - dh = 0 holds for any EOM-consistent
    motion (Newton-Euler is the base-row projection of the EOM)."""
    form = make_formulation("centroidal_acc", go2, include_base=True)
    q, v, a, forces, _ = consistent_sample(go2)
    x_init = jnp.concatenate([q, v])
    dt = 0.02
    dx = jnp.zeros(form.ndx)
    dx_next = jnp.concatenate([v * dt, a * dt])
    u = jnp.concatenate([a, forces])
    r = form.dyn_residual(x_init, dx, u, dx_next, sp_for(form, dt))
    scale = _dyn_scale(form)
    np.testing.assert_allclose(r[: 2 * form.nv], 0.0, atol=1e-4)
    np.testing.assert_allclose(r[2 * form.nv:], 0.0, atol=5e-3 * scale)


def test_centroidal_vel_gaps_and_base_vel(go2):
    form = make_formulation("centroidal_vel", go2, include_base=True)
    q, v, a, forces, _ = consistent_sample(go2)
    model = go2.model
    A = rbda.ccrba(model, q)
    h = (A @ v) / form.mass  # reference scales h by mass
    x_init = jnp.concatenate([h, q])
    dx = jnp.zeros(form.ndx)
    # gaps rows: A v - h*m == 0 by construction
    u = jnp.concatenate([v, forces])
    hdot = form.com_dynamics(q, forces) / form.mass
    dt = 0.02
    dx_next = jnp.concatenate([hdot * dt, v * dt])
    r = form.dyn_residual(x_init, dx, u, dx_next, sp_for(form, dt))
    scale = _dyn_scale(form)
    np.testing.assert_allclose(r, 0.0, atol=5e-3 * scale)

    # include_base=False path: base_vel_dynamics recovers v_base from (h, v_j)
    form2 = make_formulation("centroidal_vel", go2, include_base=False)
    v_b = form2.base_vel_dynamics(h, q, v[6:])
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v[:6]), atol=2e-3)


def test_base_acc_dynamics_consistency(b2g):
    """All three base_acc_dynamics variants must reproduce the ABA base
    acceleration from EOM-consistent joint accelerations."""
    q, v, a, forces, _ = consistent_sample(b2g)
    for name in ["centroidal_acc", "whole_body_acc"]:
        form = make_formulation(name, b2g, include_base=False)
        a_b = form.base_acc_dynamics(q, v, a[6:], forces)
        np.testing.assert_allclose(
            np.asarray(a_b), np.asarray(a[:6]), rtol=5e-2, atol=5e-2
        )


def test_dims_and_weights_all_formulations(b2g, go2):
    for robot in [go2, b2g]:
        for name in ["centroidal_vel", "centroidal_acc", "whole_body_acc",
                     "whole_body_rnea", "whole_body_aba"]:
            form = make_formulation(name, robot)
            Q, R = form.default_weights()
            assert Q.shape == (form.ndx,)
            assert R.shape == (form.nu,)
            x = jnp.asarray(form.x_nom(), dtype=jnp.float32)
            dx = jnp.zeros(form.ndx)
            x2 = form.integrate(x, dx)
            np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
            d = form.difference(x, x2)
            np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_analytic_C_block_matches_autodiff(b2g, go2):
    """The constant dx_next pattern must equal the autodiff C block."""
    import jax
    from tpu_locoman.ocp import Transcription
    from tpu_locoman.mpc import MPC
    from tpu_locoman.solver import SQPConfig, ADMMConfig

    for robot, name in [(go2, "centroidal_vel"), (go2, "centroidal_acc"),
                        (b2g, "whole_body_rnea"), (go2, "whole_body_aba")]:
        mpc = MPC(robot, dynamics=name, nodes=3,
                  config=SQPConfig(admm=ADMMConfig(iters=2)))
        trans = mpc.trans
        carry = mpc.init_carry()
        shared = mpc.make_shared(carry.x_init, jnp.zeros(6),
                                 tau_prev=carry.tau_prev)
        sp = mpc.make_stage_params(jnp.float32(0.05))
        rng = np.random.default_rng(3)
        Z = jnp.asarray(rng.normal(size=(4, trans.s)) * 0.01,
                        dtype=jnp.float32)
        _, _, _, C = trans.linearize(Z, sp, shared)

        # autodiff ground truth
        def one(dx, u_, dxn, spn):
            fn = lambda c: trans.stage_residual(dx, u_, c, spn, shared)
            return jax.jacfwd(fn)(dxn)

        C_ad = jax.vmap(one)(Z[:-1, :trans.ndx], Z[:-1, trans.ndx:],
                             Z[1:, :trans.ndx], sp)
        # linearize returns only the dense rows (box rows are selectors)
        np.testing.assert_allclose(
            np.asarray(C), np.asarray(C_ad)[:, : trans.m_dense],
            atol=1e-5, err_msg=name,
        )
        # and the dropped box rows never touch dx_next
        np.testing.assert_allclose(
            np.asarray(C_ad)[:, trans.m_dense:], 0.0, atol=1e-6,
            err_msg=name,
        )
