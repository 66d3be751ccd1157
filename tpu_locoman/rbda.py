"""Rigid-body dynamics algorithms in pure JAX.

TPU-native replacement for the Pinocchio C++ kernels the reference drives
symbolically through CasADi (see /root/reference/dynamics/*.py): forward
kinematics, frame placements/velocities/Jacobians, CRBA, RNEA with external
frame forces, ABA, nonLinearEffects, centerOfMass, the centroidal momentum
matrix (ccrba) and its time derivative (dccrba).

Design notes (TPU-first):
- the kinematic topology is static per robot (13-19 movable joints), so all
  recursions unroll at trace time into straight-line jnp code; model arrays
  are host numpy and become XLA constants;
- everything is written for a single (q, v, ...) sample and batched with
  vmap, which turns the small 3x3/6x6 algebra into large batched GEMMs;
- spatial (motion/force) vectors are ordered [linear, angular] and expressed
  in the LOCAL joint frame, matching Pinocchio conventions, so the
  reference's formulas port one-to-one;
- derivatives come from jax autodiff (jacfwd/jvp), replacing CasADi AD.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import lie
from .lie import skew, integrate_q

GRAVITY = 9.81


# ---------------------------------------------------------------------------
# Spatial algebra helpers. A transform T = (R, p) places frame B in frame A
# (world_x = R @ local_x + p). Motion m = [v, w]; force f = [f, tau].
# ---------------------------------------------------------------------------

def motion_act(R, p, m):
    """Express local motion m (in B) in frame A, T_AB = (R, p)."""
    w = R @ m[3:]
    v = R @ m[:3] + jnp.cross(p, w)
    return jnp.concatenate([v, w])


def motion_act_inv(R, p, m):
    """Express motion m (in A) in frame B."""
    w = R.T @ m[3:]
    v = R.T @ (m[:3] - jnp.cross(p, m[3:]))
    return jnp.concatenate([v, w])


def force_act(R, p, f):
    """Express local force f (at B origin, B coords) in frame A."""
    fl = R @ f[:3]
    tau = R @ f[3:] + jnp.cross(p, fl)
    return jnp.concatenate([fl, tau])


def force_act_inv(R, p, f):
    fl = R.T @ (f[:3])
    tau = R.T @ (f[3:] - jnp.cross(p, f[:3]))
    return jnp.concatenate([fl, tau])


def motion_cross(m1, m2):
    """Spatial cross product m1 x m2 for motion vectors."""
    v1, w1 = m1[:3], m1[3:]
    v2, w2 = m2[:3], m2[3:]
    return jnp.concatenate([
        jnp.cross(w1, v2) + jnp.cross(v1, w2),
        jnp.cross(w1, w2),
    ])


def motion_cross_star(m, f):
    """Dual cross product m x* f for force vectors."""
    v, w = m[:3], m[3:]
    fl, tau = f[:3], f[3:]
    return jnp.concatenate([
        jnp.cross(w, fl),
        jnp.cross(w, tau) + jnp.cross(v, fl),
    ])


def inertia_apply(m, c, Ic, mot):
    """h = I * motion for spatial inertia (mass m, com c, Ic about com)."""
    v, w = mot[:3], mot[3:]
    cw = jnp.cross(c, w)
    h_lin = m * v - m * cw  # m*(v + w x c)
    h_ang = Ic @ w - m * jnp.cross(c, cw) + m * jnp.cross(c, v)
    return jnp.concatenate([h_lin, h_ang])


def inertia_matrix(m, c, Ic):
    """Dense 6x6 spatial inertia in [lin, ang] ordering."""
    C = skew(jnp.asarray(c))
    top = jnp.concatenate([m * jnp.eye(3), -m * C], axis=1)
    bot = jnp.concatenate([m * C, jnp.asarray(Ic) - m * (C @ C)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def motion_transform_matrix(R, p):
    """6x6 X with m_A = X @ m_B for T_AB = (R, p)."""
    P = skew(p)
    Z = jnp.zeros((3, 3))
    top = jnp.concatenate([R, P @ R], axis=1)
    bot = jnp.concatenate([Z, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def force_transform_matrix(R, p):
    """6x6 X* with f_A = X* @ f_B."""
    P = skew(p)
    Z = jnp.zeros((3, 3))
    top = jnp.concatenate([R, Z], axis=1)
    bot = jnp.concatenate([P @ R, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_rotation(axis, angle):
    """Rodrigues rotation about a (constant numpy) unit axis."""
    K = jnp.asarray(skew(np.asarray(axis)))
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


# ---------------------------------------------------------------------------
# Floating-base parametrization dispatch (reference utils/robot.py:13-18).
#
# "freeflyer": q_base = [p, quat], v_base = LOCAL spatial twist (Pinocchio
# JointModelFreeFlyer).  "euler_zyx": q_base = [p_world, rz ry rx], v_base =
# [pdot_world, euler rates] with vector-space integrate (the composite
# Translation + SphericalZYX joint).  The recursions always work with the
# physical LOCAL twist; chart-dependent quantities (base rows/columns of
# tau, M, A) are mapped through J = d(v_local)/d(v_chart).
# ---------------------------------------------------------------------------

def _base_R(model, q):
    from .lie import quat_to_matrix, euler_zyx_to_matrix

    if model.base_type == "euler_zyx":
        return euler_zyx_to_matrix(q[3:6])
    return quat_to_matrix(q[3:7])


def _base_vloc(model, q, v):
    """LOCAL spatial twist of the base from chart velocities."""
    if model.base_type != "euler_zyx":
        return v[:6]
    from .lie import euler_zyx_to_matrix

    e, edot = q[3:6], v[3:6]
    R, Rdot = jax.jvp(euler_zyx_to_matrix, (e,), (edot,))
    W = R.T @ Rdot  # skew(omega_local)
    w_loc = jnp.stack([W[2, 1], W[0, 2], W[1, 0]])
    v_loc = R.T @ v[:3]
    return jnp.concatenate([v_loc, w_loc])


def _base_aloc(model, q, v, a):
    """Apparent derivative of the base LOCAL twist (chart accelerations)."""
    if model.base_type != "euler_zyx":
        return a[:6]
    qb, vb = q[:6], v[:6]

    def f(qb_, vb_):
        qq = jnp.concatenate([qb_, q[6:]])
        vv = jnp.concatenate([vb_, v[6:]])
        return _base_vloc(model, qq, vv)

    # vector-space chart: qdot_base = v_base
    _, aloc = jax.jvp(f, (qb, vb), (vb, a[:6]))
    return aloc


def _base_jac(model, q):
    """J (6x6): chart base velocity -> LOCAL spatial twist (identity for
    the free-flyer)."""
    if model.base_type != "euler_zyx":
        return jnp.eye(6)
    return jax.jacfwd(
        lambda vb: _base_vloc(model, q, jnp.concatenate([vb, jnp.zeros(model.nj)]))
    )(jnp.zeros(6))


def _chart_T(model, q):
    """Block-diag(J, I_nj) mapping chart velocities to (local-twist, qdot)."""
    if model.base_type != "euler_zyx":
        return None
    J = _base_jac(model, q)
    T = jnp.eye(model.nv)
    return T.at[:6, :6].set(J)


def model_integrate(model, q, dq):
    """Configuration integrate in the model's base chart (cpin.integrate)."""
    from .lie import integrate_q, integrate_q_euler

    if model.base_type == "euler_zyx":
        return integrate_q_euler(q, dq)
    return integrate_q(q, dq)


def model_difference(model, q0, q1):
    from .lie import difference_q, difference_q_euler

    if model.base_type == "euler_zyx":
        return difference_q_euler(q0, q1)
    return difference_q(q0, q1)


# ---------------------------------------------------------------------------
# Forward kinematics.
# ---------------------------------------------------------------------------

def fk(model, q):
    """World placements of every movable joint frame.

    Returns (R_w, p_w): lists of (3,3) / (3,) per joint. Mirrors
    pin.forwardKinematics + updateFramePlacements (used throughout
    /root/reference/dynamics/dynamics.py).
    """
    R_w = [_base_R(model, q)]
    p_w = [q[:3]]
    bq = model.base_nq
    for i in range(1, model.n_links):
        lam = model.parent[i]
        Rj = _joint_rotation(model.axis[i], q[bq + i - 1])
        R_li = jnp.asarray(model.R_tree[i]) @ Rj
        p_li = jnp.asarray(model.p_tree[i])
        R_w.append(R_w[lam] @ R_li)
        p_w.append(R_w[lam] @ p_li + p_w[lam])
    return R_w, p_w


def fk_vel(model, q, v):
    """FK plus per-joint LOCAL spatial velocities.

    v layout: [v_base_local (6), qdot_joints], Pinocchio free-flyer
    convention.
    """
    R_w, p_w = fk(model, q)
    v_loc = [_base_vloc(model, q, v)]
    bq = model.base_nq
    for i in range(1, model.n_links):
        lam = model.parent[i]
        Rj = _joint_rotation(model.axis[i], q[bq + i - 1])
        R_li = jnp.asarray(model.R_tree[i]) @ Rj
        p_li = jnp.asarray(model.p_tree[i])
        vi = motion_act_inv(R_li, p_li, v_loc[lam])
        S_w = jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        vJ = jnp.concatenate([jnp.zeros(3), S_w * v[6 + i - 1]])
        v_loc.append(vi + vJ)
    return R_w, p_w, v_loc


def frame_placement(model, frame_name, R_w, p_w):
    fr = model.frames[frame_name]
    R = R_w[fr.parent_joint] @ jnp.asarray(fr.R)
    p = R_w[fr.parent_joint] @ jnp.asarray(fr.p) + p_w[fr.parent_joint]
    return R, p


def frame_position(model, frame_name, q):
    """World position of a frame (pin frame translation; reference
    Dynamics.get_frame_position, dynamics.py:67-75)."""
    R_w, p_w = fk(model, q)
    _, p = frame_placement(model, frame_name, R_w, p_w)
    return p


def frame_velocity_lwa_from(model, frame_name, R_w, p_w, v_loc):
    """LOCAL_WORLD_ALIGNED frame velocity from precomputed kinematics
    (R_w, p_w, v_loc from fk_vel) — lets one node's constraint stack share
    a single chain pass."""
    fr = model.frames[frame_name]
    v_f = motion_act_inv(jnp.asarray(fr.R), jnp.asarray(fr.p), v_loc[fr.parent_joint])
    R_wf = R_w[fr.parent_joint] @ jnp.asarray(fr.R)
    return jnp.concatenate([R_wf @ v_f[:3], R_wf @ v_f[3:]])


def frame_velocity_lwa(model, frame_name, q, v):
    """Frame spatial velocity in LOCAL_WORLD_ALIGNED coordinates.

    Mirrors pin.getFrameVelocity(..., LOCAL_WORLD_ALIGNED) used by
    Dynamics.get_frame_velocity (reference dynamics.py:77-118).
    """
    R_w, p_w, v_loc = fk_vel(model, q, v)
    return frame_velocity_lwa_from(model, frame_name, R_w, p_w, v_loc)


def frame_velocity_from(model, frame_name, R_w, p_w, v_loc,
                        relative_to_base=False, base_frame="base_link"):
    """Reference-parity frame velocity (dynamics.py:77-118) from
    precomputed kinematics.

    relative_to_base subtracts the base velocity (with the angular-velocity
    lever correction), rotates x/y components into the base frame, and keeps
    z components global.
    """
    vel = frame_velocity_lwa_from(model, frame_name, R_w, p_w, v_loc)
    if not relative_to_base:
        return vel
    base_vel = frame_velocity_lwa_from(model, base_frame, R_w, p_w, v_loc)
    _, p_f = frame_placement(model, frame_name, R_w, p_w)
    R_b, p_b = frame_placement(model, base_frame, R_w, p_w)
    rel_pos = p_f - p_b
    correction = jnp.cross(base_vel[3:], rel_pos)
    rel_lin = vel[:3] - base_vel[:3] - correction
    rel_ang = vel[3:] - base_vel[3:]
    rel_lin_b = R_b.T @ rel_lin
    rel_ang_b = R_b.T @ rel_ang
    return jnp.concatenate([
        rel_lin_b[:2], vel[2:3], rel_ang_b[:2], vel[5:6]
    ])


def frame_velocity(model, frame_name, q, v, relative_to_base=False,
                   base_frame="base_link"):
    """Reference-parity frame velocity (dynamics.py:77-118)."""
    R_w, p_w, v_loc = fk_vel(model, q, v)
    return frame_velocity_from(
        model, frame_name, R_w, p_w, v_loc, relative_to_base, base_frame
    )


def frame_jacobian_lwa(model, frame_name, q):
    """LOCAL_WORLD_ALIGNED frame Jacobian J(q) with v_frame = J @ v.

    Mirrors pin.computeFrameJacobian(..., LOCAL_WORLD_ALIGNED) (reference
    dynamics_whole_body_acc.py:60). Exploits linearity of frame velocity in
    v via one jacfwd.
    """
    return jax.jacfwd(lambda v: frame_velocity_lwa(model, frame_name, q, v))(
        jnp.zeros(model.nv)
    )


# ---------------------------------------------------------------------------
# World-frame masked-sum machinery (the TPU-native reformulation).
#
# All per-link spatial quantities are expressed at the WORLD ORIGIN in world
# axes. With a constant ancestry mask anc (n_links, nv) — anc[i, j] = 1 iff
# dof j moves link i — the usual tree recursions become dense masked
# einsums over links, fully parallel and with tiny trace graphs:
#
#   v_i = sum_j anc[i,j] s_j qdot_j         (s_j = world motion axis of dof j)
#   a_i = sum_j anc[i,j] (s_j qddot_j + (v_(j) x s_j) qdot_j)
#   tau_j = sum_i anc[i,j] s_j . f_i        (f_i = world spatial body force)
#   M = sum_i J_i^T I_i^w J_i,  J_i = anc_i * S_w
#
# Only forward kinematics stays a (19-step, 3x3) chain walk.
# ---------------------------------------------------------------------------

def _ancestry_mask(model):
    """Constant (n_links, nv) 0/1 mask: dof j moves link i."""
    cached = getattr(model, "_anc_mask", None)
    if cached is not None:
        return cached
    n = model.n_links
    anc = np.zeros((n, model.nv), dtype=np.float32)
    anc[:, :6] = 1.0  # free-flyer moves everything
    for i in range(1, n):
        j = i
        while j != 0:
            anc[i, 6 + j - 1] = 1.0
            j = model.parent[j]
    object.__setattr__(model, "_anc_mask", anc)
    return anc


def _world_motion_axes(model, R_w, p_w):
    """S_w (nv, 6): world-origin spatial axis of every dof.

    Base dofs: columns of the motion transform of the base placement
    (base twist is body-local, Pinocchio convention). Revolute dof j:
    omega = R_j axis, v_origin = p_j x omega.
    """
    Xb = motion_transform_matrix(R_w[0], p_w[0])  # (6, 6)
    rows = [Xb.T[k] for k in range(6)]  # column k as a row vector
    for i in range(1, model.n_links):
        w = R_w[i] @ jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        rows.append(jnp.concatenate([jnp.cross(p_w[i], w), w]))
    return jnp.stack(rows)  # (nv, 6)


def _world_inertias(model, R_w, p_w):
    """Stacked world-origin 6x6 spatial inertias per link."""
    Is = []
    for i in range(model.n_links):
        I_loc = inertia_matrix(model.mass[i], model.com[i], model.inertia[i])
        XF = force_transform_matrix(R_w[i], p_w[i])
        XM_inv = motion_transform_matrix(R_w[i].T, -R_w[i].T @ p_w[i])
        Is.append(XF @ I_loc @ XM_inv)
    return jnp.stack(Is)  # (n, 6, 6)


def _link_of_dof(model):
    """Constant (nv,) link index carrying each dof (base dofs -> link 0)."""
    cached = getattr(model, "_dof_link", None)
    if cached is not None:
        return cached
    out = np.array([0] * 6 + list(range(1, model.n_links)), dtype=np.int32)
    object.__setattr__(model, "_dof_link", out)
    return out


def _world_kinematics(model, q, v):
    """Shared world-frame data: R_w, p_w, S_w, link velocities, bias terms."""
    R_w, p_w = fk(model, q)
    anc = jnp.asarray(_ancestry_mask(model))
    Sw = _world_motion_axes(model, R_w, p_w)  # (nv, 6)
    sv = Sw * v[:, None]  # per-dof twist contribution
    V = anc @ sv  # (n, 6) world link velocities
    # velocity of the link carrying each dof
    dof_link = _link_of_dof(model)
    Vdof = V[dof_link]  # (nv, 6)
    sdot = jax.vmap(motion_cross)(Vdof, Sw)  # (nv, 6) = v_(j) x s_j
    return R_w, p_w, anc, Sw, sv, V, sdot


# ---------------------------------------------------------------------------
# External frame forces: world linear force -> local spatial force at the
# parent joint, following the reference's "OCS2 implementation"
# (dynamics.py:48-60).
# ---------------------------------------------------------------------------

def external_joint_forces(model, ee_frames, forces_world, R_w):
    """Map per-frame world 3-forces to per-joint local spatial forces.

    forces_world: (3 * len(ee_frames),) stacked. Returns dict
    joint_idx -> 6-vector (accumulated).
    """
    f_ext = {}
    for idx, fname in enumerate(ee_frames):
        fr = model.frames[fname]
        jid = fr.parent_joint
        f_world = forces_world[3 * idx: 3 * idx + 3]
        f_lin = R_w[jid].T @ f_world
        f_ang = jnp.cross(jnp.asarray(fr.p), f_lin)
        f = jnp.concatenate([f_lin, f_ang])
        f_ext[jid] = f_ext.get(jid, jnp.zeros(6)) + f
    return f_ext


# ---------------------------------------------------------------------------
# RNEA — inverse dynamics with external forces.
# ---------------------------------------------------------------------------

def rnea_wf(model, q, v, a, ee_frames=(), forces_world=None):
    """Whole-body torques tau(q, v, a, f_ext) = [tau_base (6), tau_joints].

    Free-flyer base only. World-frame masked-sum formulation (parallel over links): the classic
    two-pass recursion is replaced by dense einsums against the constant
    ancestry mask — see the module-level machinery above.
    """
    R_w, p_w, anc, Sw, sv, V, sdot = _world_kinematics(model, q, v)
    I_w = _world_inertias(model, R_w, p_w)

    # Link accelerations (plus the uniform fictitious gravity accel).
    sa = Sw * a[:, None] + sdot * v[:, None]
    A_links = anc @ sa + jnp.concatenate(
        [jnp.array([0.0, 0.0, GRAVITY]), jnp.zeros(3)]
    )

    # Body forces at the world origin: f_i = I a + v x* (I v) - f_ext.
    Iv = jnp.einsum("nij,nj->ni", I_w, V)
    f = jnp.einsum("nij,nj->ni", I_w, A_links) + jax.vmap(motion_cross_star)(
        V, Iv
    )
    if forces_world is not None:
        for idx, fname in enumerate(ee_frames):
            fr = model.frames[fname]
            jid = fr.parent_joint
            fw = forces_world[3 * idx: 3 * idx + 3]
            p_f = R_w[jid] @ jnp.asarray(fr.p) + p_w[jid]
            f = f.at[jid].add(
                -jnp.concatenate([fw, jnp.cross(p_f, fw)])
            )

    # tau_j = s_j . (sum of subtree body forces).
    Fsum = anc.T @ f  # (nv, 6)
    return jnp.sum(Sw * Fsum, axis=1)


def rnea(model, q, v, a, ee_frames=(), forces_world=None):
    """Whole-body torques tau(q, v, a, f_ext) = [tau_base (6), tau_joints].

    Mirrors cpin.rnea as driven by Dynamics.rnea_dynamics (reference
    dynamics.py:33-65): forces are world-frame linear forces applied at the
    given frames.  Classic local-frame two-pass recursion: under jacfwd on
    TPU the unrolled small-op chains fuse into VPU pipelines and outperform
    the masked-einsum variant (rnea_wf) by ~2x."""
    n = model.n_links
    bq = model.base_nq

    # Forward pass.
    R_w = [_base_R(model, q)]
    v_loc = [_base_vloc(model, q, v)]
    a_grav = jnp.concatenate([R_w[0].T @ jnp.array([0.0, 0.0, GRAVITY]), jnp.zeros(3)])
    a_loc = [a_grav + _base_aloc(model, q, v, a)]
    X = [None]  # (R_li, p_li) per joint
    for i in range(1, n):
        lam = model.parent[i]
        Rj = _joint_rotation(model.axis[i], q[bq + i - 1])
        R_li = jnp.asarray(model.R_tree[i]) @ Rj
        p_li = jnp.asarray(model.p_tree[i])
        X.append((R_li, p_li))
        R_w.append(R_w[lam] @ R_li)
        S = jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        vJ = jnp.concatenate([jnp.zeros(3), S * v[6 + i - 1]])
        vi = motion_act_inv(R_li, p_li, v_loc[lam]) + vJ
        ai = (
            motion_act_inv(R_li, p_li, a_loc[lam])
            + jnp.concatenate([jnp.zeros(3), S * a[6 + i - 1]])
            + motion_cross(vi, vJ)
        )
        v_loc.append(vi)
        a_loc.append(ai)

    f_ext = (
        external_joint_forces(model, ee_frames, forces_world, R_w)
        if forces_world is not None
        else {}
    )

    # Body forces.
    f = []
    for i in range(n):
        m, c, Ic = model.mass[i], model.com[i], model.inertia[i]
        fi = inertia_apply(m, jnp.asarray(c), jnp.asarray(Ic), a_loc[i]) + (
            motion_cross_star(v_loc[i], inertia_apply(m, jnp.asarray(c), jnp.asarray(Ic), v_loc[i]))
        )
        if i in f_ext:
            fi = fi - f_ext[i]
        f.append(fi)

    # Backward pass.
    tau_j = [None] * n
    for i in range(n - 1, 0, -1):
        S = jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        tau_j[i] = jnp.dot(S, f[i][3:])
        lam = model.parent[i]
        R_li, p_li = X[i]
        f[lam] = f[lam] + force_act(R_li, p_li, f[i])

    tau_base = f[0]
    if model.base_type == "euler_zyx":
        tau_base = _base_jac(model, q).T @ tau_base
    return jnp.concatenate([tau_base] + [tau_j[i][None] for i in range(1, n)])


def nonlinear_effects(model, q, v):
    """Coriolis + gravity torques (pin.nonLinearEffects, reference
    dynamics_whole_body_acc.py:56)."""
    return rnea(model, q, v, jnp.zeros(model.nv))


# ---------------------------------------------------------------------------
# Analytic RNEA derivatives (the Pinocchio computeRNEADerivatives analog;
# the reference gets these implicitly through CasADi AD over Pinocchio).
#
# World-frame derivation: perturbing dof j by a LOCAL tangent delta applies
# the rigid world twist s_j*delta to every link in subtree(j), so every
# subtree quantity conjugates: d(s_m) = s_j x s_m whenever the link CARRYING
# dof m lies in subtree(j) — one mask DM[m, j] = anc[link(m), j] covers base
# and joint dofs with no special cases (a revolute axis is invariant under
# its own rotation, and s_j x s_j = 0 makes the diagonal vanish for free).
# Everything else follows by the product rule on the rnea_wf formulas.
#
# Why this exists: AD (one vjp pullback per RNEA row) re-sweeps the reverse
# chain ~nv times per node; this computes ALL of dtau/d(q,v,a,f) in a dozen
# ancestry-masked einsums (~10x one RNEA evaluation).
# ---------------------------------------------------------------------------


def _mcross_b(m1, m2):
    """motion_cross with broadcasting over leading dims ([lin, ang])."""
    v1, w1 = m1[..., :3], m1[..., 3:]
    v2, w2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)], axis=-1
    )


def _fcross_b(m, f):
    """motion_cross_star with broadcasting ([lin, ang] force)."""
    v, w = m[..., :3], m[..., 3:]
    fl, tau = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fl), jnp.cross(w, tau) + jnp.cross(v, fl)], axis=-1
    )


def rnea_derivatives(model, q, v, a, ee_frames=(), forces_world=None):
    """(dtau/dq_tangent, dtau/dv, dtau/da, dtau/df) of rnea(), analytic.

    dq is the LOCAL tangent (the direction consumed by model_integrate /
    freeflyer_integrate's body twist — what the OCP differentiates w.r.t.).
    dtau/df is (nv, 3 * len(ee_frames)) or None. Quaternion base only
    (euler_zyx callers keep plain AD)."""
    R_w, p_w, anc, Sw, sv, V, sdot = _world_kinematics(model, q, v)
    I_w = _world_inertias(model, R_w, p_w)
    dof_link = np.asarray(_link_of_dof(model))
    nv = model.nv

    g_vec = jnp.concatenate([jnp.array([0.0, 0.0, GRAVITY]), jnp.zeros(3)])
    sa = Sw * a[:, None] + sdot * v[:, None]
    A = anc @ sa + g_vec  # (n, 6) link accelerations incl. gravity
    Iv = jnp.einsum("nij,nj->ni", I_w, V)
    IA = jnp.einsum("nij,nj->ni", I_w, A)
    f = IA + _fcross_b(V, Iv)  # (n, 6) body forces (ext forces added below)

    # DM[m, j] = 1 iff dof j moves the link carrying dof m.
    DM = anc[dof_link]  # (nv, nv)
    Vl = V[dof_link]  # (nv, 6) velocity of the carrying link

    # --- d/da: the CRBA quadratic form ---------------------------------
    ISm = jnp.einsum("nde,me->nmd", I_w, Sw)  # I_n s_m
    dtau_da = jnp.einsum("nk,nm,kd,nmd->km", anc, anc, Sw, ISm)

    # --- shared: Vt[i, j] = sum_m anc[i,m] DM[m,j] sv_m -----------------
    Vt = jnp.einsum("nm,mj,md->njd", anc, DM, sv)  # (n, nv, 6)
    # dV_q[i, j] = s_j x Vt[i, j]  (zero outside subtree(j) automatically)
    dV_q = _mcross_b(Sw[None, :, :], Vt)  # (n, nv, 6)

    # --- d/dv -----------------------------------------------------------
    dV_v = anc[:, :, None] * Sw[None, :, :]  # (n, nv, 6)
    dA_v = dV_q + anc[:, :, None] * sdot[None, :, :]
    # (dV_i/dv_m's cross term s_m x Vt[i,m] is the SAME tensor as dV_q)
    df_v = (
        jnp.einsum("nde,nme->nmd", I_w, dA_v)
        + _fcross_b(dV_v, Iv[:, None, :])
        + _fcross_b(V[:, None, :], jnp.einsum("nde,nme->nmd", I_w, dV_v))
    )
    dtau_dv = jnp.einsum("nk,kd,nmd->km", anc, Sw, df_v)

    # --- d/dq (local tangent) -------------------------------------------
    crossSS = _mcross_b(Sw[None, :, :], Sw[:, None, :])  # [m, j] = s_j x s_m
    dS = DM[:, :, None] * crossSS  # (nv_m, nv_j, 6)
    dsdot = _mcross_b(dV_q[dof_link], Sw[:, None, :]) + DM[
        :, :, None
    ] * _mcross_b(Vl[:, None, :], crossSS)
    dA_q = jnp.einsum(
        "nm,mjd->njd", anc, dS * a[:, None, None] + dsdot * v[:, None, None]
    )
    # inertia conjugation: dI_i(X) = AL*(s_j x* (I X) - I (s_j x X))
    AL = anc[:, :, None]  # (n, nv_j, 1)
    dIA = AL * (
        _fcross_b(Sw[None, :, :], IA[:, None, :])
        - jnp.einsum(
            "nde,nje->njd", I_w, _mcross_b(Sw[None, :, :], A[:, None, :])
        )
    ) + jnp.einsum("nde,nje->njd", I_w, dA_q)
    dIv = AL * (
        _fcross_b(Sw[None, :, :], Iv[:, None, :])
        - jnp.einsum(
            "nde,nje->njd", I_w, _mcross_b(Sw[None, :, :], V[:, None, :])
        )
    ) + jnp.einsum("nde,nje->njd", I_w, dV_q)
    df_q = dIA + _fcross_b(dV_q, Iv[:, None, :]) + _fcross_b(
        V[:, None, :], dIv
    )

    # --- external frame forces (world-frame linear force at a frame) ----
    dtau_df = None
    if forces_world is not None and len(ee_frames) > 0:
        df_cols = []
        for idx, fname in enumerate(ee_frames):
            fr = model.frames[fname]
            jid = fr.parent_joint
            fw = forces_world[3 * idx: 3 * idx + 3]
            p_f = R_w[jid] @ jnp.asarray(fr.p) + p_w[jid]
            # value: f_jid -= [fw, p_f x fw]
            f = f.at[jid].add(
                -jnp.concatenate([fw, jnp.cross(p_f, fw)])
            )
            # q-derivative: only the moment arm p_f moves with q_j
            dp_f = anc[jid][:, None] * (
                Sw[:, :3] + jnp.cross(Sw[:, 3:], p_f[None, :])
            )  # (nv_j, 3)
            dFx = jnp.concatenate(
                [jnp.zeros_like(dp_f), jnp.cross(dp_f, fw[None, :])],
                axis=-1,
            )
            df_q = df_q.at[jid].add(-dFx)
            # f-derivative columns: dtau_k/dfw = -anc[jid,k]
            #   (s_k[:3] + s_k[3:] x p_f) per linear-force axis
            col = -anc[jid][:, None] * (
                Sw[:, :3] + jnp.cross(Sw[:, 3:], p_f[None, :])
            )  # (nv_k, 3)
            df_cols.append(col)
        dtau_df = jnp.concatenate(df_cols, axis=1)  # (nv, 3 * n_frames)

    F_dof = anc.T @ f  # (nv, 6) subtree force sums (ext forces included)
    dtau_dq = jnp.einsum("kjd,kd->kj", dS, F_dof) + jnp.einsum(
        "nk,kd,njd->kj", anc, Sw, df_q
    )
    return dtau_dq, dtau_dv, dtau_da, dtau_df


# ---------------------------------------------------------------------------
# Lane-major batched RNEA derivatives.
#
# The per-instance analytic pass above builds (n, nv, 6)-shaped temporaries.
# Under vmap the batch lands in the LEADING axis, so XLA tiles the trailing
# (nv, 6) onto (sublane=8, lane=128) — the 6-wide lane dim pads 21x and the
# whole pass runs at ~1/20 of HBM speed (measured 72 ms at batch 512 x N14 on
# TPU v5e vs 4.8 ms for the rnea forward). This variant keeps the FLAT batch
# in the TRAILING (lane) axis for every heavy einsum, so tiles are dense.
# Delivered through a nested custom_vmap (the solver/pallas_base.py pattern):
# vmap #1 (nodes) switches to the flat implementation, vmap #2+ (scenarios)
# merges into the existing flat batch.
# ---------------------------------------------------------------------------


def _mcross_tb(m1, m2):
    """motion_cross with the spatial axis at -2 and batch trailing."""
    v1, w1 = m1[..., :3, :], m1[..., 3:, :]
    v2, w2 = m2[..., :3, :], m2[..., 3:, :]
    return jnp.concatenate(
        [jnp.cross(w1, v2, axis=-2) + jnp.cross(v1, w2, axis=-2),
         jnp.cross(w1, w2, axis=-2)], axis=-2)


def _fcross_tb(m, f):
    """motion_cross_star with the spatial axis at -2 and batch trailing."""
    v, w = m[..., :3, :], m[..., 3:, :]
    fl, tau = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [jnp.cross(w, fl, axis=-2),
         jnp.cross(w, tau, axis=-2) + jnp.cross(v, fl, axis=-2)], axis=-2)


def _rnea_derivatives_flat(model, q, v, a, ee_frames=(), forces_world=None):
    """rnea_derivatives over a flat LEADING batch (B, ...) with lane-major
    (trailing-batch) internals — numerically equivalent to mapping
    rnea_derivatives over axis 0 (same formulas; float addition order may
    differ).

    XLA-canonicalization note: einsums carrying b in BOTH operands become
    dot_generals with b as a (major) batch dim, undoing the layout (see
    /tmp round-4 measurements: einsum variant = 72 ms, same as leading-
    batch). So the tiny spatial contractions (over e/d = 6) are unrolled
    into elementwise broadcast-multiply sums — which fuse with b minor —
    and only the constant-ancestry contractions run as real GEMMs with b
    folded into the free dimension."""
    anc = jnp.asarray(_ancestry_mask(model))  # (n, nv) constant
    ancT = anc.T
    dof_link = np.asarray(_link_of_dof(model))
    nv = model.nv

    def chain(q1):
        R_w, p_w = fk(model, q1)
        Sw = _world_motion_axes(model, R_w, p_w)
        I_w = _world_inertias(model, R_w, p_w)
        return jnp.stack(R_w), jnp.stack(p_w), Sw, I_w

    # The 19-step 3x3 chain walk stays a leading-batch vmap (small-op
    # pipelines; measured inside the 4.8 ms forward). Everything heavy
    # below is trailing-batch.
    R_w, p_w, Sw, I_w = jax.vmap(chain)(q)

    St = jnp.moveaxis(Sw, 0, -1)  # (nv, 6, B)
    It = jnp.moveaxis(I_w, 0, -1)  # (n, 6, 6, B)
    vt = v.T  # (nv, B)
    at = a.T

    def anc_n(X):
        """sum_m anc[n, m] X[m, ..., b] -> (n, ..., b): a constant-matrix
        GEMM with b inside the flattened free dim."""
        return jnp.tensordot(anc, X, axes=([1], [0]))

    def anc_k(X):
        """sum_n anc[n, k] X[n, ..., b] -> (k, ..., b)."""
        return jnp.tensordot(ancT, X, axes=([1], [0]))

    def I_dot(Y):
        """sum_e It[n, d, e, b] Y[n, ..., e, b] -> (n, ..., d, b), with the
        e contraction unrolled so everything stays elementwise over b."""
        extra = Y.ndim - 3  # axes between n and e
        idx_n = (slice(None),) + (None,) * extra
        return sum(
            It[:, :, e, :][idx_n] * Y[..., e, :][..., None, :]
            for e in range(6)
        )

    svt = St * vt[:, None, :]  # (nv, 6, B)
    Vl = anc_n(svt)  # (n, 6, B) link velocities
    Vdof = Vl[dof_link]  # (nv, 6, B)
    sdot = _mcross_tb(Vdof, St)  # (nv, 6, B)

    g_vec = jnp.concatenate([jnp.array([0.0, 0.0, GRAVITY]), jnp.zeros(3)])
    sa = St * at[:, None, :] + sdot * vt[:, None, :]
    A = anc_n(sa) + g_vec[None, :, None]
    Iv = I_dot(Vl)
    IA = I_dot(A)
    f = IA + _fcross_tb(Vl, Iv)  # (n, 6, B)

    DM = anc[dof_link]  # (nv, nv) constant
    AL = anc[:, :, None, None]  # (n, nv, 1, 1) subtree mask

    # --- d/da: sum_n sum_d anc[n,k] anc[n,m] St[k,d,b] I_dot(St)[n,m,d,b]
    ISm = I_dot(jnp.broadcast_to(St[None], (It.shape[0],) + St.shape))
    Z = anc_k(AL * ISm)  # (k, m, d, b)
    dtau_da = sum(St[:, d, :][:, None, :] * Z[:, :, d, :] for d in range(6))

    # --- shared ----------------------------------------------------------
    # Vt[n,j,d,b] = sum_m anc[n,m] DM[m,j] svt[m,d,b]
    Vt = anc_n(DM[:, :, None, None] * svt[:, None, :, :])  # (n, nv, 6, B)
    dV_q = _mcross_tb(St[None], Vt)  # (n, nv, 6, B)

    # --- d/dv ------------------------------------------------------------
    dV_v = AL * St[None]  # (n, nv, 6, B)
    dA_v = dV_q + AL * sdot[None]
    df_v = I_dot(dA_v) + _fcross_tb(dV_v, Iv[:, None]) + _fcross_tb(
        Vl[:, None], I_dot(dV_v)
    )
    Zv = anc_k(df_v)  # (k, m, d, b)
    dtau_dv = sum(St[:, d, :][:, None, :] * Zv[:, :, d, :] for d in range(6))

    # --- d/dq (local tangent) ---------------------------------------------
    crossSS = _mcross_tb(St[None], St[:, None])  # [m, j] = s_j x s_m
    dS = DM[:, :, None, None] * crossSS  # (nv_m, nv_j, 6, B)
    dsdot = _mcross_tb(dV_q[dof_link], St[:, None]) + DM[
        :, :, None, None
    ] * _mcross_tb(Vdof[:, None], crossSS)
    dA_q = anc_n(dS * at[:, None, None, :] + dsdot * vt[:, None, None, :])
    dIA = AL * (
        _fcross_tb(St[None], IA[:, None])
        - I_dot(_mcross_tb(St[None], A[:, None]))
    ) + I_dot(dA_q)
    dIv = AL * (
        _fcross_tb(St[None], Iv[:, None])
        - I_dot(_mcross_tb(St[None], Vl[:, None]))
    ) + I_dot(dV_q)
    df_q = dIA + _fcross_tb(dV_q, Iv[:, None]) + _fcross_tb(Vl[:, None], dIv)

    # --- external frame forces -------------------------------------------
    dtau_df = None
    if forces_world is not None and len(ee_frames) > 0:
        df_cols = []
        for idx, fname in enumerate(ee_frames):
            fr = model.frames[fname]
            jid = fr.parent_joint
            fw = forces_world[:, 3 * idx: 3 * idx + 3].T  # (3, B)
            p_f = (
                jnp.einsum("bde,e->db", R_w[:, jid], jnp.asarray(fr.p))
                + p_w[:, jid].T
            )  # (3, B)
            f = f.at[jid].add(
                -jnp.concatenate([fw, jnp.cross(p_f, fw, axis=0)], axis=0)
            )
            arm = St[:, :3, :] + jnp.cross(St[:, 3:, :], p_f[None], axis=1)
            dp_f = anc[jid][:, None, None] * arm  # (nv, 3, B)
            dFx = jnp.concatenate(
                [jnp.zeros_like(dp_f),
                 jnp.cross(dp_f, fw[None], axis=1)], axis=1)
            df_q = df_q.at[jid].add(-dFx)
            df_cols.append(-anc[jid][:, None, None] * arm)
        dtau_df = jnp.concatenate(df_cols, axis=1)  # (nv, 3*n_frames, B)

    F_dof = anc_k(f)  # (nv, 6, B) subtree force sums (ext forces included)
    Zq = anc_k(df_q)  # (k, j, d, b)
    dtau_dq = sum(
        dS[:, :, d, :] * F_dof[:, d, :][:, None, :]
        + St[:, d, :][:, None, :] * Zq[:, :, d, :]
        for d in range(6)
    )

    outs = (jnp.moveaxis(dtau_dq, -1, 0), jnp.moveaxis(dtau_dv, -1, 0),
            jnp.moveaxis(dtau_da, -1, 0))
    if dtau_df is not None:
        outs = outs + (jnp.moveaxis(dtau_df, -1, 0),)
    return outs


_DERIVS_CV_CACHE = {}


def _derivs_batch(model, ee_frames, with_forces, q, v, a, fw=None):
    """Flat-batch derivative dispatch: the Pallas VMEM kernel on TPU (the
    XLA lane-major path still streams ~10 GB of intermediates through HBM),
    the XLA path elsewhere. TPU_LOCOMAN_DERIVS=flat|pallas overrides."""
    import os

    from ._platform import target_platform

    mode = os.environ.get("TPU_LOCOMAN_DERIVS", "auto")
    if mode == "auto":
        # Below one 128-lane tile the kernel is mostly padding and its
        # fixed call cost dominates (batch-1 accurate scan: 15.0 ms/tick
        # with the kernel vs ~9 with the XLA path) — the lane-major XLA
        # pass wins at small flat batch.
        small = q.shape[0] < 128
        mode = "pallas" if (target_platform() == "tpu" and not small) \
            else "flat"
    if mode == "pallas":
        from .pallas_rbda import rnea_derivatives_pallas

        interpret = target_platform() != "tpu"
        return rnea_derivatives_pallas(
            model, q, v, a, ee_frames if with_forces else (),
            fw if with_forces else None, interpret=interpret)
    if with_forces:
        return _rnea_derivatives_flat(model, q, v, a, ee_frames, fw)
    return _rnea_derivatives_flat(model, q, v, a)


def _rnea_derivs_cv(model, ee_frames, with_forces):
    """Cached nested-custom_vmap wrapper around rnea_derivatives: unbatched
    calls use the per-instance pass; the first vmap switches to the
    lane-major flat implementation; deeper vmaps merge into its flat batch
    (so vmap-over-scenarios x vmap-over-nodes becomes ONE flat lane-major
    batch instead of (512, ..., 14) with 14 in the lane dim)."""
    key = (id(model), tuple(ee_frames), bool(with_forces))
    fn = _DERIVS_CV_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.custom_batching import custom_vmap

    def _bcast(args, in_batched, axis_size):
        return [x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
                for x, b in zip(args, in_batched)]

    if with_forces:
        @custom_vmap
        def flat(q, v, a, fw):
            return _derivs_batch(model, ee_frames, True, q, v, a, fw)

        @flat.def_vmap
        def _flat_rule(axis_size, in_batched, *args):
            args = _bcast(args, in_batched, axis_size)
            outs = flat(*[x.reshape((-1,) + x.shape[2:]) for x in args])
            outs = tuple(o.reshape((axis_size, -1) + o.shape[1:])
                         for o in outs)
            return outs, tuple(True for _ in outs)

        @custom_vmap
        def cv(q, v, a, fw):
            return rnea_derivatives(model, q, v, a, ee_frames, fw)

        @cv.def_vmap
        def _cv_rule(axis_size, in_batched, *args):
            outs = flat(*_bcast(args, in_batched, axis_size))
            return outs, tuple(True for _ in outs)
    else:
        @custom_vmap
        def flat(q, v, a):
            return _derivs_batch(model, ee_frames, False, q, v, a)

        @flat.def_vmap
        def _flat_rule(axis_size, in_batched, *args):
            args = _bcast(args, in_batched, axis_size)
            outs = flat(*[x.reshape((-1,) + x.shape[2:]) for x in args])
            outs = tuple(o.reshape((axis_size, -1) + o.shape[1:])
                         for o in outs)
            return outs, tuple(True for _ in outs)

        @custom_vmap
        def cv(q, v, a):
            return rnea_derivatives(model, q, v, a)[:3]

        @cv.def_vmap
        def _cv_rule(axis_size, in_batched, *args):
            outs = flat(*_bcast(args, in_batched, axis_size))
            return outs, tuple(True for _ in outs)

    _DERIVS_CV_CACHE[key] = cv
    return cv


def _coord_to_tangent(model, q, dq_coords):
    """Map a configuration-coordinate tangent (nq) to the local tangent
    (nv) — the inverse chart map of model_integrate at the base point.
    Exact for tangents in the manifold's tangent space (which is what AD
    propagates through integrate). Quaternion base only."""
    R0 = lie.quat_to_matrix(q[3:7])
    dp_t = R0.T @ dq_coords[:3]
    # q' = q (x) exp(w/2): dq = q (x) [w/2, 0]  =>  w = 2 vec(conj(q) (x) dq)
    dw = 2.0 * lie.quat_mul(lie.quat_conj(q[3:7]), dq_coords[3:7])[:3]
    return jnp.concatenate([dp_t, dw, dq_coords[7:]])


# ---------------------------------------------------------------------------
# Frame kinematics with analytic derivatives.
#
# The velocity-row linearization used to reverse-sweep the fk_vel chain once
# per constraint row (~15 cotangents/node: 17 ms of the 39 ms linearize at
# batch 512 x N14 on TPU). The derivatives of LWA frame velocities,
# positions, and rotations have tiny closed forms from the same world-frame
# machinery as rnea_derivatives:
#
#   vel_f = [V_lin + V_ang x p_f, V_ang],  V = world-origin link twist
#   d vel / dv_m   = anc[lf, m] [s_m_lin + s_m_ang x p_f, s_m_ang]
#   d V / dq_j     = s_j x Vt[lf, j],  Vt = masked ancestor-twist sums
#   d p_f / dq_j   = anc[lf, j] (s_j_lin + s_j_ang x p_f)
#   d R_f / dq_j   = anc[lf, j] skew(s_j_ang) R_f
#
# (dq is the LOCAL tangent; the custom JVP maps coordinate tangents through
# _coord_to_tangent like rnea_ad, so AD through decode/integrate stays
# exact.) Quaternion base only.
# ---------------------------------------------------------------------------


def frame_kin_jac(model, frame_names, q, v):
    """Analytic frame kinematics: per frame the LWA velocity (6,), world
    position (3,), world rotation (3, 3), and their Jacobians wrt the
    LOCAL q tangent and v. Returns a dict of stacked (nf, ...) arrays."""
    R_w, p_w = fk(model, q)
    anc = np.asarray(_ancestry_mask(model))  # (n, nv) constant
    Sw = _world_motion_axes(model, R_w, p_w)  # (nv, 6)
    sv = Sw * v[:, None]
    dof_link = np.asarray(_link_of_dof(model))
    DM = anc[dof_link]  # (nv, nv) constant

    out = {k: [] for k in ("vel", "pos", "R", "Jq_vel", "Jv_vel",
                           "Jq_pos", "Jq_R")}
    for fname in frame_names:
        fr = model.frames[fname]
        lf = fr.parent_joint
        a_row = jnp.asarray(anc[lf])  # (nv,)
        R_f = R_w[lf] @ jnp.asarray(fr.R)
        p_f = R_w[lf] @ jnp.asarray(fr.p) + p_w[lf]
        V = a_row @ sv  # (6,) world-origin link twist
        vel = jnp.concatenate([V[:3] + jnp.cross(V[3:], p_f), V[3:]])

        # d/dv: the LWA frame Jacobian.
        arm = a_row[:, None] * (
            Sw[:, :3] + jnp.cross(Sw[:, 3:], p_f[None, :]))  # (nv, 3)
        Jv = jnp.concatenate(
            [arm.T, (a_row[:, None] * Sw[:, 3:]).T], axis=0)  # (6, nv)

        # d/dq (local tangent): dV[j] = s_j x Vt[j].
        Vt = (anc[lf][:, None] * DM).T @ sv  # (nv_j, 6)
        dV = jnp.concatenate(
            [jnp.cross(Sw[:, 3:], Vt[:, :3]) + jnp.cross(Sw[:, :3], Vt[:, 3:]),
             jnp.cross(Sw[:, 3:], Vt[:, 3:])], axis=1)  # (nv, 6)
        dpt = (dV[:, :3] + jnp.cross(dV[:, 3:], p_f[None, :])
               + jnp.cross(V[3:][None, :], arm))  # (nv, 3)
        Jq = jnp.concatenate([dpt.T, dV[:, 3:].T], axis=0)  # (6, nv)

        # placements: dp_f/dq_j = arm_j; dR_f/dq_j = anc skew(s_j_ang) R_f.
        Jq_R = jnp.einsum(
            "jab,bc->acj",
            a_row[:, None, None] * jax.vmap(skew)(Sw[:, 3:]), R_f)

        out["vel"].append(vel)
        out["pos"].append(p_f)
        out["R"].append(R_f)
        out["Jq_vel"].append(Jq)
        out["Jv_vel"].append(Jv)
        out["Jq_pos"].append(arm.T)  # (3, nv)
        out["Jq_R"].append(Jq_R)
    return {k: jnp.stack(vs) for k, vs in out.items()}


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def frame_kin_ad(model, frame_names, q, v):
    """Stacked frame kinematics (vel (nf, 6), pos (nf, 3), R (nf, 3, 3))
    with an analytic custom JVP: one frame_kin_jac call serves every
    tangent/cotangent instead of AD re-sweeping the fk chain per row (the
    split-linearize velocity rows). Quaternion base only."""
    jd = frame_kin_jac(model, frame_names, q, v)
    return jd["vel"], jd["pos"], jd["R"]


@frame_kin_ad.defjvp
def _frame_kin_ad_jvp(model, frame_names, primals, tangents):
    q, v = primals
    dq, dv = tangents
    jd = frame_kin_jac(model, frame_names, q, v)
    t = _coord_to_tangent(model, q, dq)
    dvel = jnp.einsum("fij,j->fi", jd["Jq_vel"], t) + jnp.einsum(
        "fij,j->fi", jd["Jv_vel"], dv)
    dpos = jnp.einsum("fij,j->fi", jd["Jq_pos"], t)
    dR = jnp.einsum("fabj,j->fab", jd["Jq_R"], t)
    return (jd["vel"], jd["pos"], jd["R"]), (dvel, dpos, dR)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 4))
def rnea_ad(model, q, v, a, ee_frames, forces_world):
    """rnea with an analytic custom JVP: one rnea_derivatives call serves
    every jacfwd tangent / vjp cotangent instead of AD re-sweeping the
    recursion per row. The JVP is linear in the tangents, so JAX
    transposes it automatically for reverse mode (the split-linearize
    path's jax.vjp)."""
    return rnea(model, q, v, a, ee_frames, forces_world)


@rnea_ad.defjvp
def _rnea_ad_jvp(model, ee_frames, primals, tangents):
    q, v, a, forces_world = primals
    dq, dv, da, df = tangents
    tau = rnea(model, q, v, a, ee_frames, forces_world)
    with_f = forces_world is not None and len(ee_frames) > 0
    if with_f:
        dtau_dq, dtau_dv, dtau_da, dtau_df = _rnea_derivs_cv(
            model, ee_frames, True)(q, v, a, forces_world)
    else:
        dtau_dq, dtau_dv, dtau_da = _rnea_derivs_cv(
            model, ee_frames, False)(q, v, a)
        dtau_df = None
    t = _coord_to_tangent(model, q, dq)
    dtau = dtau_dq @ t + dtau_dv @ dv + dtau_da @ da
    if dtau_df is not None:
        dtau = dtau + dtau_df @ df
    return tau, dtau


# ---------------------------------------------------------------------------
# CRBA — joint-space mass matrix.
# ---------------------------------------------------------------------------

def _composite_inertias(model, q):
    """Per-joint subtree composite 6x6 spatial inertias (local frames) and
    the joint transforms. Shared by crba and ccrba."""
    n = model.n_links
    bq = model.base_nq
    X = [None]
    for i in range(1, n):
        Rj = _joint_rotation(model.axis[i], q[bq + i - 1])
        R_li = jnp.asarray(model.R_tree[i]) @ Rj
        p_li = jnp.asarray(model.p_tree[i])
        X.append((R_li, p_li))

    Ic = [
        inertia_matrix(model.mass[i], model.com[i], model.inertia[i])
        for i in range(n)
    ]
    for i in range(n - 1, 0, -1):
        lam = model.parent[i]
        R_li, p_li = X[i]
        XF = force_transform_matrix(R_li, p_li)
        XM_inv = motion_transform_matrix(R_li.T, -R_li.T @ p_li)
        Ic[lam] = Ic[lam] + XF @ Ic[i] @ XM_inv
    return Ic, X


def crba_wf(model, q):
    """Mass matrix via the world-frame masked formulation:
    M = sum_i J_i^T I_i^w J_i — one batched einsum over links."""
    R_w, p_w = fk(model, q)
    anc = jnp.asarray(_ancestry_mask(model))
    Sw = _world_motion_axes(model, R_w, p_w)
    I_w = _world_inertias(model, R_w, p_w)
    J = anc[:, :, None] * Sw[None, :, :]  # (n, nv, 6)
    IJ = jnp.einsum("ikl,ivl->ikv", I_w, J)
    return jnp.einsum("ivk,ikw->vw", J, IJ)


def crba(model, q):
    """Mass matrix M(q) (pin.crba, reference dynamics_whole_body_acc.py:55).
    Classic composite-rigid-body recursion (fastest under jacfwd)."""
    n = model.n_links
    nv = model.nv
    Ic, X = _composite_inertias(model, q)

    M = jnp.zeros((nv, nv))
    # Base block.
    M = M.at[:6, :6].set(Ic[0])
    for i in range(1, n):
        S = jnp.concatenate([
            jnp.zeros(3), jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        ])
        F = Ic[i] @ S
        col = 6 + i - 1
        M = M.at[col, col].set(jnp.dot(S, F))
        j = i
        while True:
            lam = model.parent[j]
            R_li, p_li = X[j]
            F = force_act(R_li, p_li, F)
            if lam == 0:
                # base rows: S_base = identity
                M = M.at[:6, col].set(F)
                M = M.at[col, :6].set(F)
                break
            Sl = jnp.concatenate([
                jnp.zeros(3),
                jnp.asarray(np.asarray(model.axis[lam], dtype=np.float32)),
            ])
            row = 6 + lam - 1
            val = jnp.dot(Sl, F)
            M = M.at[row, col].set(val)
            M = M.at[col, row].set(val)
            j = lam
    if model.base_type == "euler_zyx":
        T = _chart_T(model, q)
        M = T.T @ M @ T
    return M


def _aba_factor_solve(model, q, v, tau, ee_frames, forces_world):
    """Shared primal: factorize M once, return (a, Linv).

    Uses the solver's unrolled chol_inv instead of jnp.linalg.cholesky +
    solve_triangular: XLA lowers those to While loops (~3 x nv serialized
    launch-latency-bound steps per call site on TPU), and this runs inside
    linearize AND every line-search merit evaluation. With Linv explicit,
    each solve is two small matmuls (round-3; VERDICT #4)."""
    from .solver.qp import chol_inv

    M = crba(model, q)
    bias = rnea(model, q, v, jnp.zeros(model.nv), ee_frames, forces_world)
    # Same SPD jitter factorize() uses before chol_inv: the explicit-inverse
    # solve loses ~cond(M)^2 accuracy in f32 near singular configurations,
    # so keep the factor bounded away from singular (ADVICE r3).
    _, Linv = chol_inv(M + 1e-6 * jnp.eye(model.nv, dtype=M.dtype))
    rhs = tau - bias
    a = Linv.T @ (Linv @ rhs)
    return a, Linv


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _aba_cjvp(model, ee_frames, q, v, tau, forces_world):
    a, _ = _aba_factor_solve(model, q, v, tau, ee_frames, forces_world)
    return a


@_aba_cjvp.defjvp
def _aba_cjvp_rule(model, ee_frames, primals, tangents):
    """Implicit differentiation of M(q) a = tau - bias(q, v, f).

    d(M a + bias) along (dq, dv, df) at FIXED a equals the jvp of
    rnea(q, v, a, f) — so every tangent costs one rnea-jvp plus two
    triangular solves against the SAME Cholesky factor, instead of
    re-deriving (and re-factorizing) the dense solve per tangent as plain
    jacfwd does (VERDICT weak #5; reference relies on CasADi AD through
    pin.aba, dynamics_whole_body_torque.py:73-103)."""
    q, v, tau, forces_world = primals
    dq, dv, dtau, df = tangents
    a, Linv = _aba_factor_solve(model, q, v, tau, ee_frames, forces_world)

    def tau_of(q_, v_, f_):
        # rnea_ad: one analytic rnea_derivatives pass is hoisted out of the
        # tangent batch (jacfwd vmaps tangents; the primal-only derivative
        # tensors are batch-invariant), so every extra tangent costs small
        # matmuls instead of a full forward-mode rnea sweep.
        if model.base_type != "euler_zyx":
            return rnea_ad(model, q_, v_, a, tuple(ee_frames), f_)
        return rnea(model, q_, v_, a, ee_frames, f_)

    _, dMa_bias = jax.jvp(tau_of, (q, v, forces_world), (dq, dv, df))
    rhs = dtau - dMa_bias
    da = Linv.T @ (Linv @ rhs)
    return a, da


def aba(model, q, v, tau, ee_frames=(), forces_world=None):
    """Forward dynamics a = aba(q, v, tau, f_ext) (pin.aba as used by
    DynamicsWholeBodyTorque.aba_dynamics, dynamics_whole_body_torque.py:73-103).

    Solves M a = tau - rnea(q, v, 0, f_ext) with a dense Cholesky — exact
    for these small (nv <= 24) systems and MXU-friendly when batched.
    Differentiation goes through an implicit-function custom_jvp that
    reuses one factorization across all tangents/cotangents.
    """
    if forces_world is None:
        forces_world = jnp.zeros(3 * len(ee_frames))
    return _aba_cjvp(model, tuple(ee_frames), q, v, tau, forces_world)


# ---------------------------------------------------------------------------
# Center of mass and centroidal dynamics.
# ---------------------------------------------------------------------------

def _com_from(model, R_w, p_w):
    total = jnp.zeros(3)
    for i in range(model.n_links):
        total = total + model.mass[i] * (R_w[i] @ jnp.asarray(model.com[i]) + p_w[i])
    return total / model.total_mass


def center_of_mass(model, q):
    """World CoM (pin.centerOfMass, reference dynamics_centroidal_vel.py:55)."""
    R_w, p_w = fk(model, q)
    return _com_from(model, R_w, p_w)


def ccrba_wf(model, q):
    """Centroidal momentum matrix via the world-frame masked formulation:
    A_O = sum_i I_i^w J_i at the world origin, translated to the CoM."""
    R_w, p_w = fk(model, q)
    anc = jnp.asarray(_ancestry_mask(model))
    Sw = _world_motion_axes(model, R_w, p_w)
    I_w = _world_inertias(model, R_w, p_w)
    J = anc[:, :, None] * Sw[None, :, :]  # (n, nv, 6)
    A_O = jnp.einsum("ikl,ivl->kv", I_w, J)  # (6, nv)
    com = _com_from(model, R_w, p_w)
    A_ang = A_O[3:] - skew(com) @ A_O[:3]
    return jnp.concatenate([A_O[:3], A_ang], axis=0)


def ccrba(model, q):
    """Centroidal momentum matrix A(q) with h = A @ v, [lin, ang] about the
    CoM in world-aligned axes (pin.computeCentroidalMap, reference
    dynamics_centroidal_vel.py:80). Composite-inertia recursion."""
    n = model.n_links
    Ic, X = _composite_inertias(model, q)
    R_w, p_w = fk(model, q)
    com = center_of_mass(model, q)

    cols = []
    # Free-flyer: 6 columns = force-transform(T_G0) @ Ic[0]
    XF0 = force_transform_matrix(R_w[0], p_w[0] - com)
    cols.append(XF0 @ Ic[0])
    for i in range(1, n):
        S = jnp.concatenate([
            jnp.zeros(3), jnp.asarray(np.asarray(model.axis[i], dtype=np.float32))
        ])
        F = Ic[i] @ S
        cols.append(force_act(R_w[i], p_w[i] - com, F)[:, None])
    A = jnp.concatenate(cols, axis=1)
    if model.base_type == "euler_zyx":
        A = A @ _chart_T(model, q)
    return A


def dccrba(model, q, v):
    """Time derivative Adot of the centroidal momentum matrix along v
    (pin.dccrba, reference dynamics_centroidal_vel.py:112).

    Computed as the directional derivative of A(q) through the manifold
    integrate — jax.jvp replaces CasADi AD.
    """
    def A_of(dq):
        return ccrba(model, model_integrate(model, q, dq))

    _, Adot = jax.jvp(A_of, (jnp.zeros(model.nv),), (v,))
    return Adot
