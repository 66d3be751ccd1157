"""The Pallas VMEM RNEA-derivative kernel vs the per-instance analytic pass
(interpret mode off-TPU), including the padding path (B not a multiple of
the 128-lane tile) and the no-external-forces variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman import B2G, Go2
from tpu_locoman import rbda
from tpu_locoman.pallas_rbda import rnea_derivatives_pallas


def _samples(robot, B, seed=0):
    m = robot.model
    rng = np.random.default_rng(seed)
    qs = []
    for _ in range(B):
        q = np.array(robot.q0, dtype=np.float32).copy()
        q[:3] += rng.standard_normal(3).astype(np.float32) * 0.1
        quat = rng.standard_normal(4).astype(np.float32)
        q[3:7] = quat / np.linalg.norm(quat)
        q[7:] += rng.standard_normal(m.nq - 7).astype(np.float32) * 0.3
        qs.append(q)
    return (
        jnp.asarray(np.stack(qs)),
        jnp.asarray(rng.standard_normal((B, m.nv)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((B, m.nv)).astype(np.float32)),
        rng,
    )


@pytest.mark.parametrize("robot_cls", [B2G, Go2])
def test_pallas_rnea_derivatives_matches_reference(robot_cls):
    robot = robot_cls()
    m = robot.model
    ee = tuple(robot.FOOT_FRAMES) + (
        (robot.ext_force_frame,) if robot.ext_force_frame else ())
    B = 5  # exercises the pad-to-128 path
    qs, vs, aas, rng = _samples(robot, B)
    fs = jnp.asarray(
        rng.standard_normal((B, 3 * len(ee))).astype(np.float32))

    ref = [rbda.rnea_derivatives(m, qs[i], vs[i], aas[i], ee, fs[i])
           for i in range(B)]
    out = rnea_derivatives_pallas(m, qs, vs, aas, ee, fs, interpret=True)
    for k, name in enumerate(["dq", "dv", "da", "df"]):
        r = np.stack([np.asarray(x[k]) for x in ref])
        np.testing.assert_allclose(
            np.asarray(out[k]), r, atol=2e-4 * (np.abs(r).max() + 1),
            err_msg=name)


def test_pallas_rnea_derivatives_no_forces():
    robot = B2G()
    m = robot.model
    B = 3
    qs, vs, aas, _ = _samples(robot, B, seed=3)
    ref = [rbda.rnea_derivatives(m, qs[i], vs[i], aas[i]) for i in range(B)]
    out = rnea_derivatives_pallas(m, qs, vs, aas, interpret=True)
    assert len(out) == 3
    for k, name in enumerate(["dq", "dv", "da"]):
        r = np.stack([np.asarray(x[k]) for x in ref])
        np.testing.assert_allclose(
            np.asarray(out[k]), r, atol=2e-4 * (np.abs(r).max() + 1),
            err_msg=name)


def test_pallas_kernel_exports_for_tpu():
    """Cross-platform jax.export runs the Mosaic lowering pipeline — this
    catches TPU kernel-construction errors without hardware (round-3
    workflow, CLAUDE.md)."""
    from jax import export as jexp

    robot = Go2()
    m = robot.model
    ee = tuple(robot.FOOT_FRAMES)
    B = 8
    q = jnp.tile(jnp.asarray(np.asarray(robot.q0, np.float32))[None],
                 (B, 1))
    v = jnp.zeros((B, m.nv))
    a = jnp.zeros((B, m.nv))
    f = jnp.zeros((B, 3 * len(ee)))

    fn = lambda q, v, a, f: rnea_derivatives_pallas(
        m, q, v, a, ee, f, interpret=False)
    exported = jexp.export(jax.jit(fn), platforms=["tpu"])(q, v, a, f)
    assert len(exported.serialize()) > 0
