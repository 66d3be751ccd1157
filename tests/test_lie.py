"""Property tests for the Lie-group layer (quaternion / SE(3) manifold ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_locoman import lie

jax.config.update("jax_enable_x64", False)


def random_quat(rng):
    q = rng.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q))


def random_qff(rng):
    return jnp.concatenate([jnp.asarray(rng.normal(size=3)), random_quat(rng)])


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_matrix_product(rng):
    q1, q2 = random_quat(rng), random_quat(rng)
    R = lie.quat_to_matrix(lie.quat_mul(q1, q2))
    R12 = lie.quat_to_matrix(q1) @ lie.quat_to_matrix(q2)
    np.testing.assert_allclose(R, R12, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-9, 1e-4, 0.1, 1.0, 3.0]:
        w = jnp.asarray(rng.normal(size=3))
        w = w / np.linalg.norm(w) * scale  # keep |w| < pi (principal log)
        q = lie.so3_exp_quat(w)
        np.testing.assert_allclose(lie.quat_log(q), w, atol=2e-5)
        R = lie.so3_exp_matrix(w)
        np.testing.assert_allclose(lie.quat_to_matrix(q), R, atol=1e-6)
        np.testing.assert_allclose(lie.so3_log_matrix(R), w, atol=2e-4)


def test_se3_exp_log_roundtrip(rng):
    for scale in [1e-9, 1e-3, 0.5, 2.0]:
        u = jnp.asarray(rng.normal(size=6)) * scale
        p, q = lie.se3_exp(u)
        np.testing.assert_allclose(lie.se3_log(p, q), u, atol=3e-5)


def test_freeflyer_integrate_difference_inverse(rng):
    q0 = random_qff(rng)
    u = jnp.asarray(rng.normal(size=6)) * 0.5
    q1 = lie.freeflyer_integrate(q0, u)
    np.testing.assert_allclose(lie.freeflyer_difference(q0, q1), u, atol=3e-5)
    # difference then integrate
    q2 = random_qff(rng)
    d = lie.freeflyer_difference(q0, q2)
    q2_rt = lie.freeflyer_integrate(q0, d)
    # quaternion sign may flip; compare rotations and positions
    np.testing.assert_allclose(q2_rt[:3], q2[:3], atol=1e-5)
    np.testing.assert_allclose(
        lie.quat_to_matrix(q2_rt[3:]), lie.quat_to_matrix(q2[3:]), atol=1e-5
    )


def test_integrate_zero_is_identity(rng):
    q = jnp.concatenate([random_qff(rng), jnp.asarray(rng.normal(size=12))])
    qn = lie.integrate_q(q, jnp.zeros(18))
    np.testing.assert_allclose(qn, q, atol=1e-6)


def test_difference_q_roundtrip(rng):
    nj = 12
    q0 = jnp.concatenate([random_qff(rng), jnp.asarray(rng.normal(size=nj))])
    dq = jnp.asarray(rng.normal(size=6 + nj)) * 0.3
    q1 = lie.integrate_q(q0, dq)
    np.testing.assert_allclose(lie.difference_q(q0, q1), dq, atol=3e-5)


def test_gradients_finite_at_identity():
    """jacfwd/jacrev through integrate must be finite at dq=0 (hard part #1,
    SURVEY.md §7)."""
    q = jnp.concatenate([jnp.zeros(3), lie.quat_identity(), jnp.zeros(12)])
    J = jax.jacfwd(lambda dq: lie.integrate_q(q, dq))(jnp.zeros(18))
    assert np.all(np.isfinite(J))
    Jr = jax.jacrev(lambda dq: lie.integrate_q(q, dq))(jnp.zeros(18))
    assert np.all(np.isfinite(Jr))
    # d(integrate)/d(dq) at 0: position rows vs lin tangent = R(q) = I here
    np.testing.assert_allclose(J[:3, :3], np.eye(3), atol=1e-6)
    J2 = jax.jacfwd(lambda d: lie.difference_q(q, lie.integrate_q(q, d)))(
        jnp.zeros(18)
    )
    np.testing.assert_allclose(J2, np.eye(18), atol=1e-5)


def test_freeflyer_integrate_pure_rotation_moves_in_body_frame(rng):
    # 90 deg yaw, then move +x in body frame => world +y
    yaw = lie.so3_exp_quat(jnp.array([0.0, 0.0, jnp.pi / 2]))
    q = jnp.concatenate([jnp.zeros(3), yaw])
    q1 = lie.freeflyer_integrate(q, jnp.array([1.0, 0, 0, 0, 0, 0]))
    np.testing.assert_allclose(q1[:3], jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_se3_log_near_identity_f32_safe():
    """Regression: a tiny (but nonzero) rotation — theta ~ 1e-4, well below
    the f32 accuracy range of the exact (1-cos t)/t^2 expression — used to
    produce -inf/NaN in se3_log's linear part (cos t rounds to 1.0 in f32,
    so the V^{-1} coefficient divided by zero). Hit in practice by the MPC
    at tick 2 of the accurate-mode config, where the projected iterate
    leaves the base orientation ~1e-4 away from the tracking target."""
    q0 = jnp.concatenate([
        jnp.array([7.2e-05, 6.5e-05, 0.55]),
        lie.quat_normalize(jnp.array([4.7e-06, -7.1e-05, 3.4e-05, 1.0])),
    ])
    q1 = jnp.concatenate([jnp.array([0.0, 0.0, 0.55]), lie.quat_identity()])
    d = lie.freeflyer_difference(q0, q1)
    assert np.all(np.isfinite(np.asarray(d))), d
    # round trip to ~f32 accuracy
    q1_rt = lie.freeflyer_integrate(q0, d)
    np.testing.assert_allclose(q1_rt, q1, atol=1e-6)
    # and the whole small-rotation sweep stays finite + consistent
    for theta in [0.0, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 0.2]:
        dq = jnp.asarray(
            np.array([0.1, -0.2, 0.3, theta, theta / 2, -theta]) if theta
            else np.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0]),
            dtype=jnp.float32,
        )
        qa = jnp.concatenate([jnp.zeros(3), lie.quat_identity()])
        qb = lie.freeflyer_integrate(qa, dq)
        d2 = lie.freeflyer_difference(qa, qb)
        assert np.all(np.isfinite(np.asarray(d2)))
        np.testing.assert_allclose(d2, dq, atol=5e-6)
