"""End-to-end MPC behavior tests (small horizon for CPU speed).

These promote the reference's embedded verification mechanisms (SURVEY.md §4)
to automated checks: physics consistency of the retracted solution
(EOM-vs-RNEA, run_mpc.py:186-241), velocity tracking, and schedule-consistent
contact forces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig, rbda


@pytest.fixture(scope="module")
def mpc_rollout():
    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(
        robot,
        dynamics="centroidal_acc",
        nodes=6,
        config=SQPConfig(sqp_iters=2, admm=ADMMConfig(iters=120)),
    )
    run = jax.jit(lambda: mpc.run(30, jnp.array([0.2, 0, 0, 0, 0, 0])))
    carry, outs = run()
    return mpc, carry, outs


def test_rollout_stays_upright_and_tracks(mpc_rollout):
    mpc, carry, outs = mpc_rollout
    x = np.asarray(outs["x"])
    nq = mpc.form.nq
    # height stays near nominal 0.35
    assert np.all(np.abs(x[:, 2] - 0.35) < 0.05)
    # roll/pitch/yaw bounded
    assert np.all(np.abs(x[:, 3:6]) < 0.2)
    # forward progress roughly at the commanded 0.2 m/s after warmup
    vx = (x[-1, 0] - x[9, 0]) / (20 * mpc.dt_min)
    assert 0.05 < vx < 0.4
    # velocities finite and bounded
    assert np.all(np.abs(x[:, nq:]) < 50.0)


def test_violations_bounded_and_recover(mpc_rollout):
    _, _, outs = mpc_rollout
    v = np.asarray(outs["max_violation"])
    assert np.all(np.isfinite(v))
    # after warmup, typical violations are small
    assert np.median(v[5:]) < 1.0


def test_retract_physics_consistency(mpc_rollout):
    """EOM vs RNEA on the retracted plan (the reference debug identity)."""
    mpc, carry, _ = mpc_rollout
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    model = mpc.form.model
    feet = mpc.form.foot_frames
    for i in [0, 2]:
        q, v, a = sol["q"][i], sol["v"][i], sol["a"][i]
        forces = sol["forces"][i]
        tau_rnea = rbda.rnea(model, q, v, a, feet, forces)
        tau_j = sol["tau"][i]
        scale = float(jnp.max(jnp.abs(tau_rnea))) + 10.0
        np.testing.assert_allclose(
            np.asarray(tau_rnea[6:]), np.asarray(tau_j), atol=1e-3 * scale
        )


def test_swing_feet_zero_force(mpc_rollout):
    """Forces on swing feet must be ~0 per the schedule (ocp.py:135)."""
    mpc, carry, _ = mpc_rollout
    t_final = jnp.float32(30 * mpc.dt_min)
    sp = mpc.make_stage_params(t_final)
    Z = carry.solver_state.Z
    ndx, f_idx = mpc.form.ndx, mpc.form.f_idx
    contact = np.asarray(sp.contact)  # (nodes, 4)
    for i in range(mpc.nodes):
        forces = np.asarray(Z[i, ndx + f_idx: ndx + f_idx + 12])
        for leg in range(4):
            if contact[i, leg] == 0:
                assert np.abs(forces[3 * leg: 3 * leg + 3]).max() < 2.0


def test_batched_rollout_matches_single(mpc_rollout):
    """vmap batching must not change per-scenario results."""
    from tpu_locoman.parallel import batched_init, batched_step

    mpc, _, outs = mpc_rollout
    carries = batched_init(mpc, 3)
    targets = jnp.tile(jnp.array([0.2, 0, 0, 0, 0, 0]), (3, 1))
    step = batched_step(mpc, donate=False)
    carries, stats = step(carries, jnp.float32(0.0), targets)
    x = np.asarray(carries.x_init)
    # identical scenarios stay identical
    np.testing.assert_allclose(x[0], x[1], atol=1e-6)
    np.testing.assert_allclose(x[0], x[2], atol=1e-6)
    # and match the single-scenario first tick (vmap reassociates float
    # ops, so this is approximate)
    np.testing.assert_allclose(
        x[0], np.asarray(outs["x"])[0], rtol=2e-3, atol=1e-3
    )


def test_walk_gait_rollout():
    """Walk gait (3 contacts, quarter-phase swing) end to end."""
    robot = Go2()
    robot.set_gait_sequence("walk", 0.8)
    mpc = MPC(
        robot,
        dynamics="centroidal_acc",
        nodes=6,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=20)),
    )
    assert mpc.n_contacts == 3
    run = jax.jit(lambda: mpc.run(20, jnp.array([0.1, 0, 0, 0, 0, 0])))
    carry, outs = run()
    x = np.asarray(outs["x"])
    assert np.all(np.isfinite(x))
    assert np.all(np.abs(x[:, 2] - 0.35) < 0.06)  # height held
    assert np.all(np.abs(x[:, 3:6]) < 0.25)  # orientation bounded


def test_warm_shift_rollout():
    """warm_shift=True (time-consistent warm-start shift, mpc._shift_Z):
    the rollout must stay upright and its violations must not degrade vs
    the unshifted warm start (it HALVES transition spikes on the hot
    config, tools/flip_mode_probe.py — here we assert non-degradation on
    a cheap config)."""
    stats = {}
    for shift in (False, True):
        robot = Go2()
        robot.set_gait_sequence("trot", 0.5)
        mpc = MPC(
            robot,
            dynamics="whole_body_rnea",
            nodes=6,
            warm_shift=shift,
            config=SQPConfig(sqp_iters=1, n_trials=4, corrector_iters=5,
                             admm=ADMMConfig(iters=10)),
        )
        carry, outs = jax.jit(
            lambda m=mpc: m.run(25, jnp.array([0.2, 0, 0, 0, 0, 0])))()
        x = np.asarray(outs["x"])
        assert np.all(np.abs(x[:, 2] - 0.35) < 0.06)
        stats[shift] = np.asarray(outs["max_violation"])
    assert np.isfinite(stats[True]).all()
    # shift must not make the rollout meaningfully worse
    assert stats[True].mean() <= 1.25 * stats[False].mean() + 1e-3
    assert stats[True].max() <= 1.25 * stats[False].max() + 1e-3
