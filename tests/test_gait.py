"""Gait schedule parity with the reference's numpy loop semantics
(gait_sequence.py:26-77) and swing-spline properties."""

import numpy as np
import jax.numpy as jnp

from tpu_locoman.gait import GaitSequence, get_spline_vel_z, get_bezier_vel_z
from tpu_locoman.mpc import geometric_dts


def reference_schedule(gait_type, gait_period, t_current, dts, nodes):
    """Line-for-line reimplementation of the reference loop for testing."""
    if gait_type == "trot":
        swing_period = 0.5 * gait_period
    elif gait_type == "walk":
        swing_period = 0.25 * gait_period
    else:
        swing_period = gait_period
    contact = np.ones((4, nodes))
    swing = np.zeros((4, nodes))
    t = t_current
    for i in range(nodes):
        if i > 0:
            t += dts[i - 1]
        gait_phase = t % gait_period / gait_period
        swing_phase = t % swing_period / swing_period
        if gait_type == "trot":
            if gait_phase < 0.5:
                contact[0, i] = contact[3, i] = 0
                swing[0, i] = swing[3, i] = swing_phase
            else:
                contact[1, i] = contact[2, i] = 0
                swing[1, i] = swing[2, i] = swing_phase
        elif gait_type == "walk":
            if gait_phase < 0.25:
                contact[1, i] = 0
                swing[1, i] = swing_phase
            elif gait_phase < 0.5:
                contact[2, i] = 0
                swing[2, i] = swing_phase
            elif gait_phase < 0.75:
                contact[0, i] = 0
                swing[0, i] = swing_phase
            else:
                contact[3, i] = 0
                swing[3, i] = swing_phase
    return contact, swing


def test_trot_walk_schedule_parity():
    nodes = 14
    dts = np.asarray(geometric_dts(0.01, 0.08, nodes))
    for gait_type, period in [("trot", 0.8), ("trot", 0.5), ("walk", 0.8)]:
        gs = GaitSequence(gait_type, period)
        for t0 in [0.0, 0.13, 0.39, 0.77, 1.9]:
            c, s = gs.get_gait_schedule(jnp.float32(t0), jnp.asarray(dts))
            c_ref, s_ref = reference_schedule(gait_type, period, t0, dts, nodes)
            np.testing.assert_array_equal(np.asarray(c), c_ref)
            np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-5)


def test_stand_schedule():
    gs = GaitSequence("stand", 0.5)
    c, s = gs.get_gait_schedule(jnp.float32(0.2), jnp.full(5, 0.02))
    assert np.all(np.asarray(c) == 1)
    assert np.all(np.asarray(s) == 0)


def test_spline_vel_z_boundary_conditions():
    """get_spline_vel_z hits v_liftoff at phase 0, ~0 net displacement, and
    v_touchdown at phase 1 (gait_sequence.py:96-107)."""
    sp, h, vl, vt = 0.4, 0.07, 0.1, -0.2
    v0 = float(get_spline_vel_z(jnp.float32(0.0), sp, h, vl, vt))
    v1 = float(get_spline_vel_z(jnp.float32(1.0 - 1e-6), sp, h, vl, vt))
    np.testing.assert_allclose(v0, vl, atol=1e-4)
    np.testing.assert_allclose(v1, vt, atol=1e-3)
    # integral of velocity over the swing ~ 0 (up h_max and back down)
    phases = np.linspace(0, 1, 2001)
    v = np.asarray(get_spline_vel_z(jnp.asarray(phases, dtype=jnp.float32), sp, h, vl, vt))
    disp = np.trapezoid(v, phases * sp)
    np.testing.assert_allclose(disp, 0.0, atol=2e-3)
    # peak height reached at mid-swing ~ h_max
    half = phases <= 0.5
    up = np.trapezoid(v[half], phases[half] * sp)
    np.testing.assert_allclose(up, h, atol=2e-3)


def test_bezier_vel_z_symmetry():
    sp = 0.4
    v = float(get_bezier_vel_z(jnp.float32(0.25), sp, h_max=0.1))
    v2 = float(get_bezier_vel_z(jnp.float32(0.75), sp, h_max=0.1))
    np.testing.assert_allclose(v, -v2, atol=1e-6)
    assert v > 0
