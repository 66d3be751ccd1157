"""The five dynamics formulations as pure stage functions.

TPU-native counterpart of the reference's dynamics/ + optimization/ocp_*.py
pairing: each formulation defines the state/input layout, the manifold
integrate/difference, the per-node decode (q, v, a, forces, tau from
decision variables), the dynamics equality residual, the default weights and
targets, and the solution retraction.  Where the reference builds CasADi SX
graph factories (``ca.Function``s), we expose plain jax-traceable functions;
jit/vmap replace graph compilation and batching.

Input padding: the reference gives whole_body_rnea a per-node variable input
width (torques only on the first tau_nodes nodes,
ocp_whole_body_rnea.py:70-77).  Ragged widths don't exist in XLA, so every
node carries the full input vector and a per-node mask deactivates the
torque block beyond tau_nodes (SURVEY.md §7 "padded+masked").
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .. import rbda
from ..rbda import model_integrate, model_difference


class StageParams(NamedTuple):
    """Per-node parameters (vmapped over the horizon)."""

    dt: jnp.ndarray  # ()
    contact: jnp.ndarray  # (4,) 0/1
    swing: jnp.ndarray  # (4,) swing phase in [0, 1]
    state_mask: jnp.ndarray  # () 0 at node 0 for non-centroidal_vel dynamics
    tau_mask: jnp.ndarray  # () 1 while torques are decision variables
    node0_mask: jnp.ndarray  # () 0 at node 0 (dx pinned), 1 otherwise


class SharedParams(NamedTuple):
    """Horizon-invariant parameters (the compiled-solver parameter vector,
    reference run_mpc.py:84-96 / ocp.py:50-69)."""

    x_init: jnp.ndarray
    base_vel_des: jnp.ndarray  # (6,)
    ext_force_des: jnp.ndarray  # (3,)
    arm_vel_des: jnp.ndarray  # (3,)
    swing_period: jnp.ndarray  # ()
    swing_height: jnp.ndarray  # ()
    swing_vel_limits: jnp.ndarray  # (2,)
    n_contacts: jnp.ndarray  # ()
    Q_diag: jnp.ndarray  # (ndx,)
    R_diag: jnp.ndarray  # (nu,)
    W_diag: jnp.ndarray  # (nj,) torque-continuity weights (rnea only)
    tau_prev: jnp.ndarray  # (nj,)


class Formulation:
    """Shared robot plumbing (reference dynamics/dynamics.py:6-31 +
    optimization/ocp.py:11-36)."""

    name = "base"

    def __init__(self, robot):
        self.robot = robot
        self.model = robot.model
        self.mass = robot.mass
        self.foot_frames = list(robot.foot_frames)
        self.ext_force_frame = robot.ext_force_frame
        self.arm_ee_frame = robot.arm_ee_frame
        self.base_frame = robot.base_frame
        self.nq = robot.nq
        self.nv = robot.nv
        self.nj = robot.nj
        self.nf = robot.nf
        self.n_feet = len(self.foot_frames)
        self.ee_frames = self.foot_frames + (
            [self.ext_force_frame] if self.ext_force_frame else []
        )

    # -- layout ---------------------------------------------------------
    @property
    def nu(self):
        raise NotImplementedError

    @property
    def n_dyn(self):
        """Number of dynamics equality rows per node."""
        raise NotImplementedError

    # -- manifold -------------------------------------------------------
    def integrate(self, x, dx):
        raise NotImplementedError

    def difference(self, x0, x1):
        raise NotImplementedError

    # -- structure ------------------------------------------------------
    def dx_next_pattern(self):
        """Constant Jacobian of the dynamics residual w.r.t. dx_next, or
        None if it is state-dependent.

        For every formulation except whole_body_rnea(include_acc=False),
        dx_next enters the residual only through the Euler-propagation rows
        with identity coefficient — so the stage Jacobian's C block never
        needs autodiff (saves ndx of the jacfwd tangents)."""
        n_prop = self.n_prop_rows
        pat = np.zeros((self.n_dyn, self.ndx), dtype=np.float32)
        pat[:n_prop, :n_prop] = np.eye(n_prop, dtype=np.float32)
        return pat

    @property
    def n_prop_rows(self):
        """Leading propagation rows of the dynamics residual (those with
        +dx_next identity coefficient)."""
        raise NotImplementedError

    def dyn_nl_idx(self):
        """Static indices (within [0, n_dyn)) of the dynamics rows whose
        (dx, u) Jacobian needs autodiff, or None when the split-linearize
        path does not apply to this configuration (transcribe then falls
        back to full jacfwd).

        For the default configs (include_base=True / include_acc=True) the
        propagation rows are affine in (dx, u) with stage-parameter-only
        coefficients — the reference instead hands ALL rows to CasADi's
        one-shot jacobian(g, x) (ocp.py:283)."""
        return None

    def dyn_lin_jacobian(self, sp):
        """(n_dyn, ndx+nu) constant Jacobian [d/d dx | d/d u] of the
        affine dynamics rows (zero on the dyn_nl_idx rows). Only called
        when dyn_nl_idx() is not None."""
        raise NotImplementedError

    def _prop_lin_jacobian(self, sp, with_rv=True):
        """Shared builder for the Euler propagation rows of the (q, v)
        state layout: r_q = dxn[:nv] - (dx*n0)[:nv] - (v0 + (dx*n0)[nv:])*dt
        and (with_rv) r_v = dxn[nv:] - (dx*n0)[nv:] - u[:nv]*dt."""
        nv = self.nv
        s = self.ndx + self.nu
        n0 = sp.node0_mask
        dt = sp.dt
        eye = jnp.eye(nv)
        J = jnp.zeros((self.n_dyn, s))
        J = J.at[:nv, :nv].set(-n0 * eye)
        J = J.at[:nv, nv:2 * nv].set(-n0 * dt * eye)
        if with_rv:
            J = J.at[nv:2 * nv, nv:2 * nv].set(-n0 * eye)
            J = J.at[nv:2 * nv, self.ndx:self.ndx + nv].set(-dt * eye)
        return J

    # -- shared force kernels ------------------------------------------
    def com_dynamics(self, q, forces):
        """hdot (scaled by mass) from contact forces — Newton-Euler about
        the CoM (reference dynamics_centroidal_vel.py:43-71)."""
        com = rbda.center_of_mass(self.model, q)
        dp = jnp.array([0.0, 0.0, -rbda.GRAVITY * self.mass])
        dl = jnp.zeros(3)
        for idx, fname in enumerate(self.ee_frames):
            f = forces[3 * idx: 3 * idx + 3]
            r = rbda.frame_position(self.model, fname, q) - com
            dp = dp + f
            dl = dl + jnp.cross(r, f)
        return jnp.concatenate([dp, dl])

    def rnea_dyn(self, q, v, a, forces):
        """Whole-body torques (reference dynamics.py:33-65).

        Quaternion-base models go through rnea_ad: the analytic-derivative
        custom JVP computes ALL of dtau/d(q,v,a,f) in one masked-einsum
        pass instead of AD re-sweeping the recursion per output row —
        the linearize hot path's dominant dynamics cost."""
        if self.model.base_type != "euler_zyx":
            return rbda.rnea_ad(
                self.model, q, v, a, tuple(self.ee_frames), forces
            )
        return rbda.rnea(self.model, q, v, a, self.ee_frames, forces)

    def frame_velocity(self, frame, q, v, relative_to_base=False):
        return rbda.frame_velocity(
            self.model, frame, q, v, relative_to_base, self.base_frame
        )

    # -- targets (reference ocp_*.py setup_targets) ---------------------
    def f_des(self, n_contacts):
        """0.8/1.2 front/rear gravity split over contact feet
        (e.g. ocp_centroidal_vel.py:73-78)."""
        f_gravity = rbda.GRAVITY * self.mass
        front = jnp.array([0.0, 0.0, 0.8]) * f_gravity / n_contacts
        rear = jnp.array([0.0, 0.0, 1.2]) * f_gravity / n_contacts
        f = jnp.concatenate([front, front, rear, rear])
        if self.ext_force_frame:
            f = jnp.concatenate([f, jnp.zeros(3)])
        return f

    def _q_weights_pos(self):
        """Base-pose + joint-pos weight diagonal shared by the acc-state
        formulations (e.g. ocp_whole_body_rnea.py:30-39)."""
        base = [0, 0, 1000, 10000, 10000, 0]
        joints = list(np.tile([1000, 500, 500], 4))
        if self.arm_ee_frame:
            joints += [100] * 6
        return base + joints

    def _q_weights_vel(self):
        return [2000, 2000, 1000, 1000, 1000, 2000] + [1] * self.nj


class CentroidalVel(Formulation):
    """State (h, q), input (v[, v_j], forces)
    (reference dynamics_centroidal_vel.py + ocp_centroidal_vel.py)."""

    name = "centroidal_vel"

    def __init__(self, robot, include_base=True):
        super().__init__(robot)
        self.include_base = include_base
        self.nv_opt = self.nv if include_base else self.nj
        self.nx = 6 + self.nq
        self.ndx = 6 + self.nv
        self.f_idx = self.nv_opt
        self.tau_idx = None

    @property
    def nu(self):
        return self.nv_opt + self.nf

    @property
    def n_dyn(self):
        return 6 + self.nv + (6 if self.include_base else 0)

    @property
    def n_prop_rows(self):
        return 6 + self.nv

    def x_nom(self):
        return np.concatenate([np.zeros(6), self.robot.q0])

    def integrate(self, x, dx):
        return jnp.concatenate(
            [x[:6] + dx[:6], model_integrate(self.model, x[6:], dx[6:])]
        )

    def difference(self, x0, x1):
        return jnp.concatenate(
            [x1[:6] - x0[:6], model_difference(self.model, x0[6:], x1[6:])]
        )

    def base_vel_dynamics(self, h, q, v_j):
        """v_b = A_b^{-1} (h m - A_j v_j) (dynamics_centroidal_vel.py:73-89)."""
        A = rbda.ccrba(self.model, q)
        v_b = jnp.linalg.solve(A[:, :6], h * self.mass - A[:, 6:] @ v_j)
        return v_b

    def base_acc_dynamics(self, q, v, a_j, forces):
        """(dynamics_centroidal_vel.py:91-134), used in retraction only."""
        A = rbda.ccrba(self.model, q)
        Adot = rbda.dccrba(self.model, q, v)
        dh = self.com_dynamics(q, forces)
        return jnp.linalg.solve(A[:, :6], dh - Adot @ v - A[:, 6:] @ a_j)

    def decode(self, x_init, dx, u):
        x = self.integrate(x_init, dx)
        h, q = x[:6], x[6:]
        forces = u[self.f_idx:]
        if self.include_base:
            v = u[: self.nv_opt]
        else:
            v_j = u[: self.nv_opt]
            v = jnp.concatenate([self.base_vel_dynamics(h, q, v_j), v_j])
        return {"h": h, "q": q, "v": v, "forces": forces, "a": None, "tau_j": None}

    def dyn_nl_idx(self):
        if not self.include_base:
            # v_b elimination makes r_q nonlinear in (dx, u) — no split
            return None
        # r_h rows (com dynamics) and the momentum gaps need AD; the q
        # propagation rows are affine (v is a decision variable).
        return np.concatenate([
            np.arange(6), np.arange(6 + self.nv, self.n_dyn)
        ]).astype(np.int32)

    def dyn_lin_jacobian(self, sp):
        nv = self.nv
        s = self.ndx + self.nu
        n0 = sp.node0_mask
        eye = jnp.eye(nv)
        J = jnp.zeros((self.n_dyn, s))
        # r_q = dxn[6:] - (dx*n0)[6:] - u[:nv]*dt
        J = J.at[6:6 + nv, 6:6 + nv].set(-n0 * eye)
        J = J.at[6:6 + nv, self.ndx:self.ndx + nv].set(-sp.dt * eye)
        return J

    def dyn_residual(self, x_init, dx, u, dx_next, sp: StageParams):
        """(ocp_centroidal_vel.py:85-129)."""
        d = self.decode(x_init, dx, u)
        h_dot = self.com_dynamics(d["q"], d["forces"]) / self.mass  # h scaled
        r_h = dx_next[:6] - (dx[:6] + h_dot * sp.dt)
        r_q = dx_next[6:] - (dx[6:] + d["v"] * sp.dt)
        res = [r_h, r_q]
        if self.include_base:
            A = rbda.ccrba(self.model, d["q"])
            gaps = A @ d["v"] - d["h"] * self.mass
            res.append(gaps)
        return jnp.concatenate(res)

    def x_des(self, shared: SharedParams):
        return jnp.concatenate(
            [shared.base_vel_des, jnp.asarray(self.robot.q0, dtype=jnp.float32)]
        )

    def default_weights(self):
        """(ocp_centroidal_vel.py:25-49)."""
        Q = np.concatenate([[1000.0] * 6, self._q_weights_pos()])
        R = np.concatenate([[1.0] * self.nv_opt, [1e-3] * self.nf])
        return Q.astype(np.float32), R.astype(np.float32)

    def u_des(self, shared):
        return jnp.concatenate(
            [jnp.zeros(self.nv_opt), self.f_des(shared.n_contacts)]
        )


class _AccStateFormulation(Formulation):
    """Shared (q, v) state layout for the acc/rnea/aba formulations
    (reference dynamics_centroidal_acc.py:12-41 etc.)."""

    def __init__(self, robot):
        super().__init__(robot)
        self.nx = self.nq + self.nv
        self.ndx = 2 * self.nv

    def x_nom(self):
        return np.concatenate([self.robot.q0, np.zeros(self.nv)])

    def integrate(self, x, dx):
        q = model_integrate(self.model, x[: self.nq], dx[: self.nv])
        v = x[self.nq:] + dx[self.nv:]
        return jnp.concatenate([q, v])

    def difference(self, x0, x1):
        dq = model_difference(self.model, x0[: self.nq], x1[: self.nq])
        dv = x1[self.nq:] - x0[self.nq:]
        return jnp.concatenate([dq, dv])

    def x_des(self, shared: SharedParams):
        return jnp.concatenate([
            jnp.asarray(self.robot.q0, dtype=jnp.float32),
            shared.base_vel_des,
            jnp.zeros(self.nj),
        ])

    def default_weights_Q(self):
        return np.concatenate([self._q_weights_pos(), self._q_weights_vel()])


class CentroidalAcc(_AccStateFormulation):
    """State (q, v), input (a[, a_j], forces); centroidal-map gaps
    (reference dynamics_centroidal_acc.py + ocp_centroidal_acc.py)."""

    name = "centroidal_acc"

    def __init__(self, robot, include_base=True):
        super().__init__(robot)
        self.include_base = include_base
        self.na_opt = self.nv if include_base else self.nj
        self.f_idx = self.na_opt
        self.tau_idx = None

    @property
    def nu(self):
        return self.na_opt + self.nf

    @property
    def n_dyn(self):
        return 2 * self.nv + (6 if self.include_base else 0)

    @property
    def n_prop_rows(self):
        return 2 * self.nv

    def base_acc_dynamics(self, q, v, a_j, forces):
        """a_b = A_b^{-1} (dh - Adot v - A_j a_j)
        (dynamics_centroidal_acc.py:43-82)."""
        A = rbda.ccrba(self.model, q)
        Adot = rbda.dccrba(self.model, q, v)
        dh = self.com_dynamics(q, forces)
        return jnp.linalg.solve(A[:, :6], dh - Adot @ v - A[:, 6:] @ a_j)

    def decode(self, x_init, dx, u):
        x = self.integrate(x_init, dx)
        q, v = x[: self.nq], x[self.nq:]
        forces = u[self.f_idx:]
        if self.include_base:
            a = u[: self.na_opt]
        else:
            a_j = u[: self.na_opt]
            a = jnp.concatenate([self.base_acc_dynamics(q, v, a_j, forces), a_j])
        return {"q": q, "v": v, "a": a, "forces": forces, "tau_j": None}

    def dyn_nl_idx(self):
        if not self.include_base:
            return None  # base-acc elimination makes r_v nonlinear
        return np.arange(2 * self.nv, self.n_dyn, dtype=np.int32)

    def dyn_lin_jacobian(self, sp):
        return self._prop_lin_jacobian(sp, with_rv=True)

    def dyn_residual(self, x_init, dx, u, dx_next, sp: StageParams):
        """(ocp_centroidal_acc.py:89-111)."""
        d = self.decode(x_init, dx, u)
        r_q = dx_next[: self.nv] - (dx[: self.nv] + d["v"] * sp.dt)
        r_v = dx_next[self.nv:] - (dx[self.nv:] + d["a"] * sp.dt)
        res = [r_q, r_v]
        if self.include_base:
            A = rbda.ccrba(self.model, d["q"])
            Adot = rbda.dccrba(self.model, d["q"], d["v"])
            dh = self.com_dynamics(d["q"], d["forces"])
            res.append(A @ d["a"] + Adot @ d["v"] - dh)
        return jnp.concatenate(res)

    def default_weights(self):
        Q = self.default_weights_Q()
        R = np.concatenate([[1e-3] * self.na_opt, [1e-3] * self.nf])
        return Q.astype(np.float32), R.astype(np.float32)

    def u_des(self, shared):
        return jnp.concatenate(
            [jnp.zeros(self.na_opt), self.f_des(shared.n_contacts)]
        )


class WholeBodyAcc(_AccStateFormulation):
    """State (q, v), input (a[, a_j], forces); full-EOM base-row gaps
    (reference dynamics_whole_body_acc.py + ocp_whole_body_acc.py)."""

    name = "whole_body_acc"

    def __init__(self, robot, include_base=True):
        super().__init__(robot)
        self.include_base = include_base
        self.na_opt = self.nv if include_base else self.nj
        self.f_idx = self.na_opt
        self.tau_idx = None

    @property
    def nu(self):
        return self.na_opt + self.nf

    @property
    def n_dyn(self):
        return 2 * self.nv + (6 if self.include_base else 0)

    @property
    def n_prop_rows(self):
        return 2 * self.nv

    def base_acc_dynamics(self, q, v, a_j, forces):
        """a_b = M_bb^{-1}(-nle_b - M_bj a_j + J_c^T f)
        (dynamics_whole_body_acc.py:43-83)."""
        M = rbda.crba(self.model, q)
        nle = rbda.nonlinear_effects(self.model, q, v)
        tau_ext = jnp.zeros(6)
        for idx, fname in enumerate(self.ee_frames):
            J = rbda.frame_jacobian_lwa(self.model, fname, q)
            tau_ext = tau_ext + J[:3, :6].T @ forces[3 * idx: 3 * idx + 3]
        rhs = -nle[:6] - M[:6, 6:] @ a_j + tau_ext
        return jnp.linalg.solve(M[:6, :6], rhs)

    def decode(self, x_init, dx, u):
        x = self.integrate(x_init, dx)
        q, v = x[: self.nq], x[self.nq:]
        forces = u[self.f_idx:]
        if self.include_base:
            a = u[: self.na_opt]
        else:
            a_j = u[: self.na_opt]
            a = jnp.concatenate([self.base_acc_dynamics(q, v, a_j, forces), a_j])
        return {"q": q, "v": v, "a": a, "forces": forces, "tau_j": None}

    def dyn_nl_idx(self):
        if not self.include_base:
            return None
        return np.arange(2 * self.nv, self.n_dyn, dtype=np.int32)

    def dyn_lin_jacobian(self, sp):
        return self._prop_lin_jacobian(sp, with_rv=True)

    def dyn_residual(self, x_init, dx, u, dx_next, sp: StageParams):
        """(ocp_whole_body_acc.py:90-112); gaps are the base rows of RNEA
        with external forces (dynamics_whole_body_acc.py:85-126)."""
        d = self.decode(x_init, dx, u)
        r_q = dx_next[: self.nv] - (dx[: self.nv] + d["v"] * sp.dt)
        r_v = dx_next[self.nv:] - (dx[self.nv:] + d["a"] * sp.dt)
        res = [r_q, r_v]
        if self.include_base:
            tau = self.rnea_dyn(d["q"], d["v"], d["a"], d["forces"])
            res.append(tau[:6])
        return jnp.concatenate(res)

    def default_weights(self):
        Q = self.default_weights_Q()
        R = np.concatenate([[1e-3] * self.na_opt, [1e-3] * self.nf])
        return Q.astype(np.float32), R.astype(np.float32)

    def u_des(self, shared):
        return jnp.concatenate(
            [jnp.zeros(self.na_opt), self.f_des(shared.n_contacts)]
        )


class WholeBodyRNEA(_AccStateFormulation):
    """Inverse-dynamics transcription: input (a, forces, tau_j) with torques
    active only on the first tau_nodes nodes
    (reference ocp_whole_body_rnea.py + dynamics_whole_body_torque.py)."""

    name = "whole_body_rnea"

    def __init__(self, robot, tau_nodes=3, include_acc=True):
        super().__init__(robot)
        self.tau_nodes = tau_nodes
        self.include_acc = include_acc
        self.na_opt = self.nv if include_acc else 0
        self.f_idx = self.na_opt
        self.tau_idx = self.f_idx + self.nf

    @property
    def nu(self):
        return self.na_opt + self.nf + self.nj

    @property
    def n_dyn(self):
        return self.nv + (self.nv if self.include_acc else 0) + 6 + self.nj

    @property
    def n_prop_rows(self):
        return self.nv + (self.nv if self.include_acc else 0)

    def dx_next_pattern(self):
        if not self.include_acc:
            # finite-difference accelerations make the RNEA rows depend on
            # dx_next — fall back to autodiff for the C block
            return None
        return super().dx_next_pattern()

    def decode(self, x_init, dx, u):
        x = self.integrate(x_init, dx)
        q, v = x[: self.nq], x[self.nq:]
        a = u[: self.na_opt] if self.include_acc else None
        forces = u[self.f_idx: self.tau_idx]
        tau_j = u[self.tau_idx:]
        return {"q": q, "v": v, "a": a, "forces": forces, "tau_j": tau_j}

    def aba_dyn(self, q, v, tau_j, forces):
        """Forward dynamics with zero base torque — used by the "aba"
        flip-reset mode (mpc.py): since RNEA(q, v, ABA(q, v, tau, f), f)
        = tau identically, seeding a flipped node's acceleration slots
        with ABA zeroes that node's RNEA-row residuals at the warm-start
        point exactly (base rows AND torque-equality rows)."""
        tau = jnp.concatenate([jnp.zeros(6), tau_j])
        return rbda.aba(self.model, q, v, tau, self.ee_frames, forces)

    def dyn_nl_idx(self):
        if not self.include_acc:
            return None  # fd accelerations couple the RNEA rows to dx_next
        # RNEA base rows + torque-equality rows (the -tau_j selector is
        # picked up by the same jacrev pass at no extra cost).
        return np.arange(2 * self.nv, self.n_dyn, dtype=np.int32)

    def dyn_lin_jacobian(self, sp):
        return self._prop_lin_jacobian(sp, with_rv=True)

    def dyn_residual(self, x_init, dx, u, dx_next, sp: StageParams):
        """(ocp_whole_body_rnea.py:138-171). Torque-equality rows are
        multiplied by tau_mask (padding for i >= tau_nodes)."""
        d = self.decode(x_init, dx, u)
        if self.include_acc:
            a = d["a"]
        else:
            a = (dx_next[self.nv:] - dx[self.nv:]) / sp.dt
        r_q = dx_next[: self.nv] - (dx[: self.nv] + d["v"] * sp.dt)
        res = [r_q]
        if self.include_acc:
            res.append(dx_next[self.nv:] - (dx[self.nv:] + a * sp.dt))
        tau = self.rnea_dyn(d["q"], d["v"], a, d["forces"])
        res.append(tau[:6])  # zero base torques
        res.append(sp.tau_mask * (tau[6:] - d["tau_j"]))
        return jnp.concatenate(res)

    def default_weights(self):
        """(ocp_whole_body_rnea.py:28-63)."""
        Q = self.default_weights_Q()
        R = np.concatenate(
            [[1e-3] * self.na_opt, [1e-3] * self.nf, [1e-4] * self.nj]
        )
        return Q.astype(np.float32), R.astype(np.float32)

    def default_W(self):
        return np.zeros(self.nj, dtype=np.float32)

    def u_des(self, shared):
        return jnp.concatenate([
            jnp.zeros(self.na_opt),
            self.f_des(shared.n_contacts),
            jnp.zeros(self.nj),
        ])


class WholeBodyABA(_AccStateFormulation):
    """Forward-dynamics transcription: input (tau_j, forces), a = ABA
    (reference ocp_whole_body_aba.py + dynamics_whole_body_torque.py:73-103)."""

    name = "whole_body_aba"

    def __init__(self, robot):
        super().__init__(robot)
        self.f_idx = self.nj
        self.tau_idx = None

    @property
    def nu(self):
        return self.nj + self.nf

    @property
    def n_dyn(self):
        return 2 * self.nv

    @property
    def n_prop_rows(self):
        return 2 * self.nv

    def aba_dyn(self, q, v, tau_j, forces):
        tau = jnp.concatenate([jnp.zeros(6), tau_j])
        return rbda.aba(self.model, q, v, tau, self.ee_frames, forces)

    def decode(self, x_init, dx, u):
        x = self.integrate(x_init, dx)
        q, v = x[: self.nq], x[self.nq:]
        tau_j = u[: self.nj]
        forces = u[self.f_idx:]
        a = self.aba_dyn(q, v, tau_j, forces)
        return {"q": q, "v": v, "a": a, "forces": forces, "tau_j": tau_j}

    def dyn_nl_idx(self):
        # r_v goes through ABA (nonlinear in everything); r_q is affine.
        return np.arange(self.nv, 2 * self.nv, dtype=np.int32)

    def dyn_lin_jacobian(self, sp):
        return self._prop_lin_jacobian(sp, with_rv=False)

    def dyn_residual(self, x_init, dx, u, dx_next, sp: StageParams):
        """(ocp_whole_body_aba.py:86-106)."""
        d = self.decode(x_init, dx, u)
        r_q = dx_next[: self.nv] - (dx[: self.nv] + d["v"] * sp.dt)
        r_v = dx_next[self.nv:] - (dx[self.nv:] + d["a"] * sp.dt)
        return jnp.concatenate([r_q, r_v])

    def default_weights(self):
        """(ocp_whole_body_aba.py:22-50)."""
        Q = self.default_weights_Q()
        R = np.concatenate([[1e-3] * self.nj, [1e-3] * self.nf])
        return Q.astype(np.float32), R.astype(np.float32)

    def u_des(self, shared):
        return jnp.concatenate(
            [jnp.zeros(self.nj), self.f_des(shared.n_contacts)]
        )


FORMULATIONS = {
    "centroidal_vel": CentroidalVel,
    "centroidal_acc": CentroidalAcc,
    "whole_body_acc": WholeBodyAcc,
    "whole_body_rnea": WholeBodyRNEA,
    "whole_body_aba": WholeBodyABA,
}

# Default per-dynamics arguments (reference ocp_args.py:3-19).
DEFAULT_ARGS = {
    "centroidal_vel": {"include_base": True},
    "centroidal_acc": {"include_base": True},
    "whole_body_acc": {"include_base": True},
    "whole_body_aba": {},
    "whole_body_rnea": {"tau_nodes": 3, "include_acc": True},
}


def make_formulation(name, robot, **kwargs):
    """Factory merging defaults with overrides (reference
    ocp_factory.py:8-27)."""
    if name not in FORMULATIONS:
        raise ValueError(f"Unknown dynamics type: {name}")
    args = dict(DEFAULT_ARGS[name])
    args.update(kwargs)
    return FORMULATIONS[name](robot, **args)
