"""Gait sequencing and swing-foot velocity profiles.

TPU-native counterpart of /root/reference/utils/gait_sequence.py. The
schedule generator is vectorized, jittable jnp (masks instead of branches)
so batched MPC scenarios can compute their schedules on-device; the swing
velocity splines replace ca.if_else with jnp.where.
"""

import jax.numpy as jnp

FEET = ("FR_foot", "FL_foot", "RR_foot", "RL_foot")  # gait_sequence.py:7


class GaitSequence:
    """Phase-based contact scheduling (gait_sequence.py:5-77)."""

    def __init__(self, gait_type="trot", gait_period=0.5):
        self.feet = FEET
        self.gait_type = gait_type
        self.gait_period = gait_period

        if gait_type == "trot":
            self.n_contacts = 2
            self.swing_period = 0.5 * gait_period
        elif gait_type == "walk":
            self.n_contacts = 3
            self.swing_period = 0.25 * gait_period
        elif gait_type == "stand":
            self.n_contacts = 4
            self.swing_period = gait_period  # zero would be degenerate
        else:
            raise ValueError(f"Gait: {gait_type} not supported")

    def get_gait_schedule(self, t_current, dts, nodes=None):
        """Contact (0/1) and swing-phase ([0,1]) schedules, both (4, nodes).

        t_current may be traced; dts is the (nodes,) array of step sizes
        (node i sits at t_current + sum(dts[:i]), gait_sequence.py:33-37).
        """
        dts = jnp.asarray(dts)
        t = t_current + jnp.concatenate([jnp.zeros(1), jnp.cumsum(dts[:-1])])
        gait_phase = jnp.mod(t, self.gait_period) / self.gait_period
        swing_phase = jnp.mod(t, self.swing_period) / self.swing_period

        n = t.shape[0]
        if self.gait_type == "trot":
            first_half = gait_phase < 0.5  # FR, RL swing (indices 0, 3)
            swing = jnp.stack([first_half, ~first_half, ~first_half, first_half])
        elif self.gait_type == "walk":
            q1 = gait_phase < 0.25
            q2 = (gait_phase >= 0.25) & (gait_phase < 0.5)
            q3 = (gait_phase >= 0.5) & (gait_phase < 0.75)
            q4 = gait_phase >= 0.75
            # quarter order: FL, RR, FR, RL (gait_sequence.py:60-75)
            swing = jnp.stack([q3, q1, q2, q4])
        else:  # stand
            swing = jnp.zeros((4, n), dtype=bool)

        contact_schedule = jnp.where(swing, 0.0, 1.0)
        swing_schedule = jnp.where(swing, swing_phase[None, :], 0.0)
        return contact_schedule, swing_schedule


# ---------------------------------------------------------------------------
# Swing trajectory helpers (gait_sequence.py:80-133).
# ---------------------------------------------------------------------------

def cubic_bezier_derivative(p0, p1, phase):
    return 6.0 * phase * (1.0 - phase) * (p1 - p0)


def get_bezier_vel_z(swing_phase, swing_period, h_max=0.1):
    """crl-loco style Bezier vertical swing velocity (gait_sequence.py:83-91)."""
    vel_z = jnp.where(
        swing_phase < 0.5,
        cubic_bezier_derivative(0.0, h_max, 2.0 * swing_phase),
        cubic_bezier_derivative(h_max, 0.0, 2.0 * swing_phase - 1.0),
    ) * 2.0 / swing_period
    return vel_z


class CubicSpline:
    """OCS2-style cubic spline (gait_sequence.py:110-133); coefficients may
    be traced (swing_period / h_max are runtime parameters)."""

    def __init__(self, t0, t1, pos0, vel0, pos1, vel1):
        self.t0 = t0
        self.t1 = t1
        self.dt = t1 - t0
        dpos = pos1 - pos0
        dvel = vel1 - vel0
        self.c0 = pos0
        self.c1 = vel0 * self.dt
        self.c2 = -(3.0 * vel0 + dvel) * self.dt + 3.0 * dpos
        self.c3 = (2.0 * vel0 + dvel) * self.dt - 2.0 * dpos

    def position(self, t):
        tn = (t - self.t0) / self.dt
        return self.c3 * tn**3 + self.c2 * tn**2 + self.c1 * tn + self.c0

    def velocity(self, t):
        tn = (t - self.t0) / self.dt
        return (3.0 * self.c3 * tn**2 + 2.0 * self.c2 * tn + self.c1) / self.dt


def get_spline_vel_z(swing_phase, swing_period, h_max=0.1, v_liftoff=0.1,
                     v_touchdown=-0.2):
    """Two C1 cubic splines 0 -> h_max -> 0 with liftoff/touchdown velocity
    BCs (gait_sequence.py:96-107)."""
    mid_time = swing_period / 2.0
    spline1 = CubicSpline(0.0, mid_time, 0.0, v_liftoff, h_max, 0.0)
    spline2 = CubicSpline(mid_time, swing_period, h_max, 0.0, 0.0, v_touchdown)
    t = swing_phase * swing_period
    return jnp.where(
        swing_phase < 0.5, spline1.velocity(t), spline2.velocity(t)
    )
