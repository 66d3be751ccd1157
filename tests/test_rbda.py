"""Identity-based verification of the rigid-body kernels.

The reference has no test suite; its de-facto integration test is the
EOM-vs-RNEA consistency check (run_mpc.py:186-241). We promote that identity
(and several more) to automated tests:
  - M(q) a + nle(q,v) - J_c^T f == rnea(q, v, a, f_ext)
  - rnea/aba inverse pair
  - M columns from rnea unit accelerations
  - CoM velocity from the centroidal map: (A v)[:3] = m * d(com)/dt
  - dh = A a + Adot v  (dccrba consistency)
  - frame velocity == d/dt frame position
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_locoman import rbda, lie
from tpu_locoman.robots import Go2, B2G


@pytest.fixture(scope="module", params=["go2", "b2g"])
def setup(request):
    if request.param == "go2":
        robot = Go2()
    else:
        robot = B2G()
    rng = np.random.default_rng(42)
    model = robot.model
    q = np.array(robot.q0, dtype=np.float64)
    q[:3] += rng.normal(size=3) * 0.1
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] += rng.normal(size=model.nj) * 0.2
    v = rng.normal(size=model.nv) * 0.5
    a = rng.normal(size=model.nv) * 0.5
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    forces = rng.normal(size=3 * len(feet)) * 20.0
    return robot, model, jnp.asarray(q, dtype=jnp.float32), jnp.asarray(
        v, dtype=jnp.float32
    ), jnp.asarray(a, dtype=jnp.float32), feet, jnp.asarray(
        forces, dtype=jnp.float32
    )


def test_eom_vs_rnea(setup):
    """The reference's own debug identity (run_mpc.py:211-231)."""
    _, model, q, v, a, feet, forces = setup
    M = rbda.crba(model, q)
    nle = rbda.nonlinear_effects(model, q, v)
    tau_ext = jnp.zeros(model.nv)
    for idx, fname in enumerate(feet):
        J = rbda.frame_jacobian_lwa(model, fname, q)
        tau_ext = tau_ext + J[:3].T @ forces[3 * idx: 3 * idx + 3]
    tau_eom = M @ a + nle - tau_ext
    tau_rnea = rbda.rnea(model, q, v, a, feet, forces)
    scale = float(jnp.max(jnp.abs(tau_eom))) + 1.0
    np.testing.assert_allclose(tau_eom, tau_rnea, atol=2e-3 * scale)


def test_rnea_aba_inverse(setup):
    _, model, q, v, a, feet, forces = setup
    tau = rbda.rnea(model, q, v, a, feet, forces)
    a_rt = rbda.aba(model, q, v, tau, feet, forces)
    np.testing.assert_allclose(a_rt, a, rtol=2e-3, atol=2e-3)


def test_crba_columns_from_rnea(setup):
    _, model, q, v, a, feet, forces = setup
    M = rbda.crba(model, q)
    zero = jnp.zeros(model.nv)
    tau0 = rbda.rnea(model, q, zero, zero)
    for j in [0, 3, 5, 7, model.nv - 1]:
        ej = zero.at[j].set(1.0)
        col = rbda.rnea(model, q, zero, ej) - tau0
        scale = float(jnp.max(jnp.abs(M))) * 1e-5 + 1e-3
        np.testing.assert_allclose(M[:, j], col, atol=scale)


def test_mass_matrix_spd(setup):
    _, model, q, *_ = setup
    M = np.asarray(rbda.crba(model, q), dtype=np.float64)
    np.testing.assert_allclose(M, M.T, atol=1e-3)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0


def test_com_velocity_from_centroidal_map(setup):
    _, model, q, v, *_ = setup
    A = rbda.ccrba(model, q)
    h = A @ v
    # d(com)/dt along v (manifold jvp)
    _, dcom = jax.jvp(
        lambda dq: rbda.center_of_mass(model, lie.integrate_q(q, dq)),
        (jnp.zeros(model.nv),),
        (v,),
    )
    np.testing.assert_allclose(h[:3], model.total_mass * dcom, rtol=1e-3, atol=5e-3)


def test_dccrba_consistency(setup):
    """dh/dt == A a + Adot v with the momentum rate from rnea:
    for a free-floating system under gravity and forces, instead verify
    Adot = d/dt A directly against finite differences."""
    _, model, q, v, *_ = setup
    Adot = rbda.dccrba(model, q, v)
    eps = 1e-3
    q_plus = lie.integrate_q(q, eps * v)
    q_minus = lie.integrate_q(q, -eps * v)
    Adot_fd = (rbda.ccrba(model, q_plus) - rbda.ccrba(model, q_minus)) / (2 * eps)
    scale = float(jnp.max(jnp.abs(Adot_fd))) + 1.0
    np.testing.assert_allclose(Adot, Adot_fd, atol=2e-2 * scale)


def test_newton_euler_momentum_rate(setup):
    """Centroidal dynamics: d/dt(A v) = sum_i (r_i - com) x f_i + total
    gravity+contact force, when a satisfies the unconstrained EOM with the
    same external forces."""
    _, model, q, v, _, feet, forces = setup
    tau = jnp.zeros(model.nv)  # free-floating, no actuation at all? base only
    # choose a consistent with EOM: a = aba(q, v, tau_j arbitrary, forces)
    tau = tau.at[6:].set(0.0)
    a = rbda.aba(model, q, v, tau, feet, forces)
    A = rbda.ccrba(model, q)
    Adot = rbda.dccrba(model, q, v)
    dh = A @ a + Adot @ v

    com = rbda.center_of_mass(model, q)
    f_tot = jnp.array([0.0, 0.0, -rbda.GRAVITY * model.total_mass])
    l_tot = jnp.zeros(3)
    for idx, fname in enumerate(feet):
        f_i = forces[3 * idx: 3 * idx + 3]
        p_i = rbda.frame_position(model, fname, q)
        f_tot = f_tot + f_i
        l_tot = l_tot + jnp.cross(p_i - com, f_i)
    # joint torques internal: don't change total momentum
    scale = float(jnp.max(jnp.abs(f_tot))) + 10.0
    np.testing.assert_allclose(dh[:3], f_tot, atol=5e-3 * scale)
    np.testing.assert_allclose(dh[3:], l_tot, atol=5e-3 * scale)


def test_frame_velocity_vs_position_derivative(setup):
    _, model, q, v, *_ = setup
    for fname in ["FR_foot", "RL_foot"]:
        vel = rbda.frame_velocity_lwa(model, fname, q, v)
        _, dpos = jax.jvp(
            lambda dq: rbda.frame_position(model, fname, lie.integrate_q(q, dq)),
            (jnp.zeros(model.nv),),
            (v,),
        )
        np.testing.assert_allclose(vel[:3], dpos, rtol=1e-3, atol=1e-3)


def test_frame_jacobian_matches_velocity(setup):
    _, model, q, v, *_ = setup
    J = rbda.frame_jacobian_lwa(model, "FL_foot", q)
    vel = rbda.frame_velocity_lwa(model, "FL_foot", q, v)
    np.testing.assert_allclose(J @ v, vel, rtol=1e-4, atol=1e-4)


def test_static_standing_forces(setup):
    """Standing at q0 with zero velocity: rnea with gravity-compensating
    vertical foot forces should give near-zero base torque residual."""
    robot, model, *_ = setup
    q = jnp.asarray(robot.q0, dtype=jnp.float32)
    zero = jnp.zeros(model.nv)
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    fz = rbda.GRAVITY * model.total_mass / 4.0
    forces = jnp.tile(jnp.array([0.0, 0.0, fz]), 4)
    tau = rbda.rnea(model, q, zero, zero, feet, forces)
    # base linear force residual ~ 0 (vertical balance); x/y moments small
    assert abs(float(tau[2])) < 1e-2 * fz


def test_rnea_analytic_derivatives_match_ad():
    """rbda.rnea_derivatives (analytic, world-frame masked einsums) must
    equal pure-AD tangent-space Jacobians of rnea — including external
    frame forces and the free-flyer base block."""
    from tpu_locoman import B2G

    robot = B2G()
    robot.set_gait_sequence("trot", 0.5)
    model = robot.model
    rng = np.random.default_rng(3)
    nq, nv = model.nq, model.nv
    q = np.zeros(nq, np.float32)
    q[:3] = rng.normal(size=3) * 0.3
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.normal(size=nq - 7) * 0.5
    v = jnp.asarray(rng.normal(size=nv).astype(np.float32))
    a = jnp.asarray(rng.normal(size=nv).astype(np.float32))
    frames = tuple(robot.foot_frames) + (robot.ext_force_frame,)
    fw = jnp.asarray((rng.normal(size=3 * len(frames)) * 50).astype(np.float32))
    q = jnp.asarray(q)

    Jq_ad = jax.jacfwd(
        lambda t: rbda.rnea(
            model, rbda.model_integrate(model, q, t), v, a, frames, fw
        )
    )(jnp.zeros(nv))
    Jv_ad = jax.jacfwd(lambda x: rbda.rnea(model, q, x, a, frames, fw))(v)
    Ja_ad = jax.jacfwd(lambda x: rbda.rnea(model, q, v, x, frames, fw))(a)
    Jf_ad = jax.jacfwd(lambda x: rbda.rnea(model, q, v, a, frames, x))(fw)

    Jq, Jv, Ja, Jf = rbda.rnea_derivatives(model, q, v, a, frames, fw)
    for lbl, A, B in [("dq", Jq_ad, Jq), ("dv", Jv_ad, Jv),
                      ("da", Ja_ad, Ja), ("df", Jf_ad, Jf)]:
        scale = max(1.0, float(jnp.abs(A).max()))
        np.testing.assert_allclose(
            np.asarray(B), np.asarray(A), atol=3e-6 * scale, err_msg=lbl
        )


def test_rnea_ad_custom_jvp_matches_ad_through_decode():
    """The rnea_ad custom JVP must reproduce plain-AD Jacobians through the
    formulation's decode (integrate chart composition), in BOTH forward
    (jacfwd) and reverse (jacrev — the split-linearize path) modes."""
    from tpu_locoman import B2G
    from tpu_locoman.dynamics.formulations import make_formulation

    robot = B2G()
    robot.set_gait_sequence("trot", 0.5)
    form = make_formulation("whole_body_rnea", robot)
    model = form.model
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(
        np.concatenate([np.asarray(robot.q0), np.zeros(model.nv)]).astype(
            np.float32
        )
    )
    dx = jnp.asarray(rng.normal(size=2 * model.nv).astype(np.float32) * 0.1)
    u = jnp.asarray(rng.normal(size=form.nu).astype(np.float32))

    def tau_custom(dx_, u_):
        d = form.decode(x0, dx_, u_)
        return rbda.rnea_ad(model, d["q"], d["v"], d["a"],
                            tuple(form.ee_frames), d["forces"])

    def tau_plain(dx_, u_):
        d = form.decode(x0, dx_, u_)
        return rbda.rnea(model, d["q"], d["v"], d["a"],
                         form.ee_frames, d["forces"])

    for jac in (jax.jacfwd, jax.jacrev):
        Jc = jac(tau_custom, argnums=(0, 1))(dx, u)
        Jp = jac(tau_plain, argnums=(0, 1))(dx, u)
        for a_, b_ in zip(Jc, Jp):
            scale = max(1.0, float(jnp.abs(b_).max()))
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), atol=3e-6 * scale
            )


def test_rnea_derivatives_flat_lane_major_matches_per_instance():
    """The lane-major flat batch implementation (_rnea_derivatives_flat)
    and its nested custom_vmap delivery (_rnea_derivs_cv) must match the
    per-instance analytic pass on independently sampled instances, under
    both a single vmap (the node axis) and nested vmap (scenarios x
    nodes) — the production linearize composition."""
    from tpu_locoman import B2G

    robot = B2G()
    model = robot.model
    ee = tuple(robot.FOOT_FRAMES) + (
        (robot.ext_force_frame,) if robot.ext_force_frame else ())
    rng = np.random.default_rng(11)
    B = 4
    qs = []
    for _ in range(B):
        q = np.array(robot.q0, dtype=np.float32).copy()
        q[:3] += rng.standard_normal(3).astype(np.float32) * 0.1
        quat = rng.standard_normal(4).astype(np.float32)
        q[3:7] = quat / np.linalg.norm(quat)
        q[7:] += rng.standard_normal(model.nq - 7).astype(np.float32) * 0.3
        qs.append(q)
    qs = jnp.asarray(np.stack(qs))
    vs = jnp.asarray(rng.standard_normal((B, model.nv)).astype(np.float32))
    aas = jnp.asarray(rng.standard_normal((B, model.nv)).astype(np.float32))
    fs = jnp.asarray(
        rng.standard_normal((B, 3 * len(ee))).astype(np.float32))

    ref = [rbda.rnea_derivatives(model, qs[i], vs[i], aas[i], ee, fs[i])
           for i in range(B)]
    cv = rbda._rnea_derivs_cv(model, ee, True)

    out1 = jax.vmap(cv)(qs, vs, aas, fs)
    out2 = jax.vmap(jax.vmap(cv))(
        qs.reshape(2, 2, -1), vs.reshape(2, 2, -1),
        aas.reshape(2, 2, -1), fs.reshape(2, 2, -1))
    for k in range(4):
        r = np.stack([np.asarray(x[k]) for x in ref])
        tol = 2e-4 * (np.abs(r).max() + 1)
        np.testing.assert_allclose(np.asarray(out1[k]), r, atol=tol)
        np.testing.assert_allclose(
            np.asarray(out2[k]).reshape(r.shape), r, atol=tol)
