"""Cross-validation: the world-frame masked-einsum kernels (alternates)
must match the default recursion kernels exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_locoman import rbda
from tpu_locoman.robots import Go2, B2G


@pytest.fixture(scope="module", params=["go2", "b2g"])
def sample(request):
    robot = Go2() if request.param == "go2" else B2G()
    rng = np.random.default_rng(7)
    model = robot.model
    q = np.asarray(robot.q0, dtype=np.float64).copy()
    q[:3] += rng.normal(size=3) * 0.2
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] += rng.normal(size=model.nj) * 0.3
    v = rng.normal(size=model.nv)
    a = rng.normal(size=model.nv)
    feet = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]
    forces = rng.normal(size=12) * 30.0
    return (model, jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(a, jnp.float32), feet,
            jnp.asarray(forces, jnp.float32))


def test_rnea_matches_recursion(sample):
    model, q, v, a, feet, forces = sample
    t_new = rbda.rnea_wf(model, q, v, a, feet, forces)
    t_rec = rbda.rnea(model, q, v, a, feet, forces)
    scale = float(jnp.max(jnp.abs(t_rec))) + 1.0
    np.testing.assert_allclose(t_new, t_rec, atol=5e-4 * scale)


def test_rnea_no_forces_matches(sample):
    model, q, v, a, *_ = sample
    t_new = rbda.rnea_wf(model, q, v, a)
    t_rec = rbda.rnea(model, q, v, a)
    scale = float(jnp.max(jnp.abs(t_rec))) + 1.0
    np.testing.assert_allclose(t_new, t_rec, atol=5e-4 * scale)


def test_crba_matches_recursion(sample):
    model, q, *_ = sample
    M_new = rbda.crba_wf(model, q)
    M_rec = rbda.crba(model, q)
    scale = float(jnp.max(jnp.abs(M_rec)))
    np.testing.assert_allclose(M_new, M_rec, atol=5e-4 * scale)


def test_ccrba_matches_recursion(sample):
    model, q, *_ = sample
    A_new = rbda.ccrba_wf(model, q)
    A_rec = rbda.ccrba(model, q)
    scale = float(jnp.max(jnp.abs(A_rec)))
    np.testing.assert_allclose(A_new, A_rec, atol=5e-4 * scale)
