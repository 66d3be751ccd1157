"""Lie-group operations for the floating-base configuration manifold.

TPU-native replacement for the Pinocchio Lie-group kernels the reference drives
through CasADi (``cpin.integrate`` / ``cpin.difference``, see
/root/reference/dynamics/dynamics.py and dynamics_*.py ``state_integrate`` /
``state_difference``).  Conventions match Pinocchio exactly:

- quaternions are stored ``(x, y, z, w)``;
- the free-flyer configuration is ``[p (3), quat (4)]`` with the tangent
  ``[v_lin (3), omega (3)]`` expressed in the LOCAL (body) frame;
- ``integrate(q, u) = q * exp6(u)`` uses the *coupled* SE(3) exponential
  (SpecialEuclidean(3) group operation), not R^3 x SO(3);
- ``difference(q0, q1) = log6(q0^{-1} * q1)``.

Everything is pure jnp, shape-static, differentiable (jacfwd/jacrev safe at
the identity via Taylor-series branches), and vmap-friendly.
"""

import jax.numpy as jnp

# Small-angle branch threshold on theta^2. Must be LARGE in f32: the exact
# expressions cancel catastrophically near zero — (1 - cos t)/t^2 computes
# as exactly 0 for t^2 < ~1e-7 (cos t rounds to 1.0), which turned
# se3_log's V^{-1} coefficient into -inf/NaN on near-identity transforms.
# At t^2 = 1e-2 the 2-term Taylor branches are accurate to ~3e-7 relative
# (better than the exact branch's ~1e-5 cancellation error there), so the
# crossover sits where BOTH are good.
_EPS = 1e-2


# ---------------------------------------------------------------------------
# Quaternion helpers (x, y, z, w) — Pinocchio storage order.
# ---------------------------------------------------------------------------

def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0])


def quat_mul(q1, q2):
    """Hamilton product q1 * q2, both (x, y, z, w)."""
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def quat_conj(q):
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def quat_normalize(q):
    return q / jnp.linalg.norm(q)


def quat_to_matrix(q):
    """Rotation matrix R such that world_v = R @ body_v."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ])


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (equivalent to R(q) @ v)."""
    return quat_to_matrix(q) @ v


# ---------------------------------------------------------------------------
# Small-angle-safe trigonometric coefficient helpers.
#
# Each returns the exact expression away from theta=0 and a Taylor expansion
# near it; the `where`-both-branches trick keeps jacfwd/jacrev NaN-free.
# ---------------------------------------------------------------------------

def _safe(theta2, exact_fn, taylor):
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    return jnp.where(small, taylor, exact_fn(theta2_safe))


def _sinc(theta2):
    """sin(t)/t with t = sqrt(theta2)."""
    return _safe(
        theta2,
        lambda t2: jnp.sin(jnp.sqrt(t2)) / jnp.sqrt(t2),
        1.0 - theta2 / 6.0,
    )


def _cosc(theta2):
    """(1 - cos(t)) / t^2."""
    return _safe(
        theta2,
        lambda t2: (1.0 - jnp.cos(jnp.sqrt(t2))) / t2,
        0.5 - theta2 / 24.0,
    )


def _sincc(theta2):
    """(t - sin(t)) / t^3."""
    return _safe(
        theta2,
        lambda t2: (jnp.sqrt(t2) - jnp.sin(jnp.sqrt(t2))) / (t2 * jnp.sqrt(t2)),
        1.0 / 6.0 - theta2 / 120.0,
    )


def skew(v):
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


# ---------------------------------------------------------------------------
# SO(3) exp / log.
# ---------------------------------------------------------------------------

def so3_exp_quat(omega):
    """Exponential map to a quaternion (x, y, z, w)."""
    theta2 = jnp.dot(omega, omega)
    half_sinc = _safe(
        theta2,
        lambda t2: jnp.sin(0.5 * jnp.sqrt(t2)) / jnp.sqrt(t2),
        0.5 - theta2 / 48.0,
    )
    w = _safe(
        theta2,
        lambda t2: jnp.cos(0.5 * jnp.sqrt(t2)),
        1.0 - theta2 / 8.0,
    )
    return jnp.concatenate([half_sinc * omega, jnp.array([w])])


def so3_exp_matrix(omega):
    """Rodrigues formula: R = I + sinc*w^ + cosc*w^^2."""
    theta2 = jnp.dot(omega, omega)
    W = skew(omega)
    return jnp.eye(3) + _sinc(theta2) * W + _cosc(theta2) * (W @ W)


def quat_log(q):
    """Log map of a unit quaternion to a rotation vector (Pinocchio log3)."""
    xyz = q[:3]
    w = q[3]
    # Force the shortest path (w >= 0).
    sign = jnp.where(w < 0.0, -1.0, 1.0)
    xyz = xyz * sign
    w = w * sign
    s2 = jnp.dot(xyz, xyz)  # sin(t/2)^2
    s = jnp.sqrt(jnp.maximum(s2, 1e-30))
    half_theta = jnp.arctan2(s, w)
    small = s2 < _EPS
    # theta / sin(theta/2); near 0: 2/(1 - t^2/24) ~ 2 + s2*...
    scale = jnp.where(small, 2.0 + s2 / 3.0, 2.0 * half_theta / jnp.where(small, 1.0, s))
    return scale * xyz


def so3_log_matrix(R):
    """Rotation-vector log of a rotation matrix."""
    trace = R[0, 0] + R[1, 1] + R[2, 2]
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    theta2 = theta * theta
    # w = 2 sin(theta) * axis; result = theta * axis = w * theta/(2 sin theta)
    factor = _safe(
        theta2,
        lambda t2: jnp.sqrt(t2) / (2.0 * jnp.sin(jnp.sqrt(t2))),
        0.5 + theta2 / 12.0,
    )
    return factor * w


# ---------------------------------------------------------------------------
# SE(3) exp / log (Pinocchio exp6 / log6, motion vectors ordered [lin, ang]).
# ---------------------------------------------------------------------------

def se3_exp(u):
    """exp6 of a motion vector u = [v (3), omega (3)] -> (p, quat)."""
    v, omega = u[:3], u[3:]
    theta2 = jnp.dot(omega, omega)
    W = skew(omega)
    V = jnp.eye(3) + _cosc(theta2) * W + _sincc(theta2) * (W @ W)
    p = V @ v
    quat = so3_exp_quat(omega)
    return p, quat


def se3_log(p, quat):
    """log6 of an SE(3) element -> motion vector [v, omega]."""
    omega = quat_log(quat)
    theta2 = jnp.dot(omega, omega)
    W = skew(omega)
    # V^{-1} = I - 0.5 W + coeff * W^2,  coeff = (1/t^2)(1 - sinc(t)/(2 cosc(t)))
    coeff = _safe(
        theta2,
        lambda t2: (1.0 / t2) * (1.0 - _sinc(t2) / (2.0 * _cosc(t2))),
        1.0 / 12.0 + theta2 / 720.0,
    )
    Vinv = jnp.eye(3) - 0.5 * W + coeff * (W @ W)
    v = Vinv @ p
    return jnp.concatenate([v, omega])


# ---------------------------------------------------------------------------
# Free-flyer (SpecialEuclidean(3)) integrate / difference.
# ---------------------------------------------------------------------------

def freeflyer_integrate(q_ff, u):
    """q_ff (+) u with q_ff = [p, quat] and u the LOCAL twist [v, omega].

    Matches pin.JointModelFreeFlyer integrate: M_next = M * exp6(u).
    """
    p, quat = q_ff[:3], q_ff[3:7]
    dp, dquat = se3_exp(u)
    p_next = p + quat_rotate(quat, dp)
    quat_next = quat_normalize(quat_mul(quat, dquat))
    return jnp.concatenate([p_next, quat_next])


def freeflyer_difference(q0, q1):
    """log6(M0^{-1} * M1) — LOCAL twist taking q0 to q1."""
    p0, quat0 = q0[:3], q0[3:7]
    p1, quat1 = q1[:3], q1[3:7]
    dq = quat_mul(quat_conj(quat0), quat1)
    dp = quat_rotate(quat_conj(quat0), p1 - p0)
    return se3_log(dp, dq)


# ---------------------------------------------------------------------------
# Whole-configuration integrate / difference (free-flyer + revolute joints).
#
# Mirrors the contract of the reference state_integrate / state_difference
# (e.g. /root/reference/dynamics/dynamics_centroidal_acc.py:12-41).
# ---------------------------------------------------------------------------

def integrate_q(q, dq):
    """q in R^{7+nj}, dq in R^{6+nj} -> q_next in R^{7+nj}."""
    ff = freeflyer_integrate(q[:7], dq[:6])
    return jnp.concatenate([ff, q[7:] + dq[6:]])


def difference_q(q0, q1):
    """Tangent dq with integrate_q(q0, dq) == q1."""
    ff = freeflyer_difference(q0[:7], q1[:7])
    return jnp.concatenate([ff, q1[7:] - q0[7:]])


# ---------------------------------------------------------------------------
# Euler-ZYX base parametrization (the reference's use_quaternion=False
# composite joint: Translation + SphericalZYX, utils/robot.py:15-18).
# Pinocchio treats both sub-joints as vector spaces: q = [p (world), rz ry rx]
# and integrate/difference are plain addition.
# ---------------------------------------------------------------------------

def euler_zyx_to_matrix(e):
    """R = Rz(e0) @ Ry(e1) @ Rx(e2)."""
    cz, sz = jnp.cos(e[0]), jnp.sin(e[0])
    cy, sy = jnp.cos(e[1]), jnp.sin(e[1])
    cx, sx = jnp.cos(e[2]), jnp.sin(e[2])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    return Rz @ Ry @ Rx


def matrix_to_euler_zyx(R):
    """Inverse of euler_zyx_to_matrix (gimbal-safe for |pitch| < pi/2)."""
    ry = jnp.arcsin(-jnp.clip(R[2, 0], -1.0, 1.0))
    rz = jnp.arctan2(R[1, 0], R[0, 0])
    rx = jnp.arctan2(R[2, 1], R[2, 2])
    return jnp.stack([rz, ry, rx])


def quat_to_euler_zyx(q):
    return matrix_to_euler_zyx(quat_to_matrix(q))


def integrate_q_euler(q, dq):
    """Vector-space base: plain addition on [p, euler, joints]."""
    return q + dq


def difference_q_euler(q0, q1):
    return q1 - q0
