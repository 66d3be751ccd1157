"""Stagewise NLP transcription.

TPU-native counterpart of the reference OCP constraint/objective assembly
(/root/reference/optimization/ocp.py:38-198 and the per-formulation
setup_dynamics_constraints).  Instead of a CasADi Opti object graph, the
horizon is one vmapped stage function:

    g_i = stage_residual(dx_i, u_i, dx_{i+1}; stage_params_i, shared)

with per-row bounds (l, u): equality rows use l = u = 0, inequalities use
[0, inf) or box bounds.  Node-dependent structure (the pinned initial state,
the first-node constraint exemptions, the tau_nodes torque window) is
expressed with per-node masks so every node has identical shapes.

z layout: (N+1) uniform blocks s_i = [dx_i (ndx), u_i (nu)]; block N's input
slot is a dummy pinned to zero by the objective.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..dynamics.formulations import StageParams, SharedParams
from ..gait import get_spline_vel_z

_INF = 1e9  # large-but-finite bound; keeps ADMM arithmetic clean in f32


class ObjectiveData(NamedTuple):
    """Diagonal quadratic objective sum_k w_k (z_k - t_k)^2, split into the
    base tracking term and the torque-continuity term (W_diag, rnea only,
    reference ocp_whole_body_rnea.py:108-136)."""

    P_base: jnp.ndarray  # (N+1, s)
    z_des: jnp.ndarray  # (N+1, s)
    P_w: jnp.ndarray  # (N+1, s) extra weights (tau_0 continuity)
    z_w: jnp.ndarray  # (N+1, s) target for the extra term


class Transcription:
    def __init__(self, form, nodes, mu=0.7):
        self.form = form
        self.nodes = nodes
        self.mu = mu

        self.ndx = form.ndx
        self.nu = form.nu
        self.s = self.ndx + self.nu  # uniform stage-block width

        self.has_ext = form.ext_force_frame is not None
        self.has_arm = form.arm_ee_frame is not None
        self.has_tau = getattr(form, "tau_idx", None) is not None
        nf4 = form.n_feet
        nj = form.nj

        # Row layout (per node).
        self.n_dyn = form.n_dyn
        self.n_eq = (
            self.n_dyn
            + 3 * nf4  # swing zero-force
            + 2 * nf4  # contact zero xy-velocity
            + 1 * nf4  # blended z-velocity
            + (3 if self.has_ext else 0)
            + (3 if self.has_arm else 0)
        )
        self.n_ineq = (
            2 * nf4  # friction normal + cone
            + nj  # joint position box
            + nj  # joint velocity box
            + (nj if self.has_tau else 0)
        )
        self.m = self.n_eq + self.n_ineq

        # The trailing box rows (q_j, v_j[, tau_j]) are pure selectors of
        # stage-block slots: the QP treats them via gather/scatter instead
        # of dense Jacobian rows (solver/qp.py box mode).
        self.n_box = 2 * nj + (nj if self.has_tau else 0)
        self.m_dense = self.m - self.n_box
        slots = []
        if form.name == "centroidal_vel":
            # dx = [dh(6), dq(nv)]; joint dq at 6+6+j
            slots += [6 + 6 + j for j in range(nj)]
            off = self.ndx + (6 if form.include_base else 0)
            slots += [off + j for j in range(nj)]  # v_j in u
        else:
            # dx = [dq(nv), dv(nv)]
            slots += [6 + j for j in range(nj)]
            slots += [form.nv + 6 + j for j in range(nj)]
        if self.has_tau:
            slots += [self.ndx + form.tau_idx + j for j in range(nj)]
        self.box_slots = np.asarray(slots, dtype=np.int32)

        # The dx_next block C is the constant propagation pattern (row m =
        # e_m for m < n_prop_rows) for every default formulation: the QP
        # then skips the D-side assemble einsums and streams slices instead
        # of the dense D block in its matvecs (qp.assemble_blocks).
        self.c_eye_rows = None
        pat = form.dx_next_pattern()
        if pat is not None:
            k = form.n_prop_rows
            expect = np.zeros_like(pat)
            expect[:k, :k] = np.eye(k, dtype=pat.dtype)
            if pat.shape[0] <= self.m_dense and np.array_equal(pat, expect):
                self.c_eye_rows = int(k)

        # ---- split-linearize layout (analytic affine rows + jacrev on the
        # truly nonlinear rows; the reference one-shots jacobian(g, x),
        # ocp.py:283) ------------------------------------------------------
        dyn_nl = form.dyn_nl_idx()
        self.split_ok = dyn_nl is not None and form.dx_next_pattern() is not None
        if self.split_ok:
            n_dyn = self.n_dyn
            off_sw = n_dyn
            off_xy = off_sw + 3 * nf4
            off_z = off_xy + 2 * nf4
            off_ext = off_z + nf4
            off_arm = off_ext + (3 if self.has_ext else 0)
            off_fric = off_arm + (3 if self.has_arm else 0)
            off_cone = off_fric + nf4
            assert off_cone + nf4 == self.m_dense

            self.dyn_nl_rows = np.asarray(dyn_nl, dtype=np.int32)
            vel_rows = list(range(off_xy, off_z + nf4))  # xy then z rows
            if self.has_arm:
                vel_rows += list(range(off_arm, off_arm + 3))
            self.vel_rows = np.asarray(vel_rows, dtype=np.int32)
            self.cone_rows = np.arange(off_cone, off_cone + nf4, dtype=np.int32)

            # Selector rows: (row, col) index pairs + the stage-param value
            # source is built in _lin_jacobian.
            f0 = self.ndx + form.f_idx
            self.sw_rows = np.arange(off_sw, off_sw + 3 * nf4, dtype=np.int32)
            self.sw_cols = f0 + np.arange(3 * nf4, dtype=np.int32)
            if self.has_ext:
                self.ext_rows = np.arange(off_ext, off_ext + 3, dtype=np.int32)
                self.ext_cols = f0 + 3 * nf4 + np.arange(3, dtype=np.int32)
            self.fric_rows = np.arange(off_fric, off_fric + nf4, dtype=np.int32)
            self.fric_cols = f0 + 3 * np.arange(nf4, dtype=np.int32) + 2
            self.cone_cols = f0 + np.arange(3 * nf4, dtype=np.int32)

            # vjp pullback bases: rows of I selecting which outputs of the
            # shared-forward functions get a backward pass.
            self._basis_dyn = np.eye(self.n_dyn, dtype=np.float32)[
                self.dyn_nl_rows
            ]
            self._n_vel = len(vel_rows)
            n_vb = self._n_vel + self.n_box
            self._basis_vel = np.eye(n_vb, dtype=np.float32)[: self._n_vel]

    # ------------------------------------------------------------------
    def stage_residual(self, dx, u, dx_next, sp: StageParams,
                       shared: SharedParams):
        """All constraint rows of one node (ocp.py:103-198 + subclass
        dynamics constraints)."""
        from .. import rbda

        form = self.form
        dx = dx * sp.node0_mask  # pinned initial state (ocp.py:109)
        rows = [form.dyn_residual(shared.x_init, dx, u, dx_next, sp)]

        d = form.decode(shared.x_init, dx, u)
        q, v, forces = d["q"], d["v"], d["forces"]

        # One chain pass shared by every frame-velocity constraint at this
        # node (the reference rebuilds a CasADi graph per frame; here the
        # kinematics are computed once).
        kin = rbda.fk_vel(form.model, q, v)

        # Per-foot contact/swing equalities (ocp.py:121-157).
        swing_force, vel_xy_rows, vel_z_rows = [], [], []
        for idx in range(form.n_feet):
            c = sp.contact[idx]
            f_e = forces[3 * idx: 3 * idx + 3]
            swing_force.append((1.0 - c) * f_e)

            vel = rbda.frame_velocity_from(
                form.model, form.foot_frames[idx], *kin
            )
            vel_xy_rows.append(sp.state_mask * c * vel[:2])
            vel_z_des = get_spline_vel_z(
                sp.swing[idx],
                swing_period=shared.swing_period,
                h_max=shared.swing_height,
                v_liftoff=shared.swing_vel_limits[0],
                v_touchdown=shared.swing_vel_limits[1],
            )
            blended = c * vel[2] + (1.0 - c) * (vel[2] - vel_z_des)
            vel_z_rows.append(sp.state_mask * blended[None])
        rows += swing_force + vel_xy_rows + vel_z_rows

        if self.has_ext:
            f_ext = forces[3 * form.n_feet:]
            rows.append(f_ext - shared.ext_force_des)  # ocp.py:166-168
        if self.has_arm:
            vel = rbda.frame_velocity_from(
                form.model, form.arm_ee_frame, *kin,
                relative_to_base=True, base_frame=form.base_frame,
            )
            rows.append(sp.state_mask * (vel[:3] - shared.arm_vel_des))

        # Inequality rows (value side; bounds in stage_bounds).
        frics, cones = [], []
        for idx in range(form.n_feet):
            c = sp.contact[idx]
            f_e = forces[3 * idx: 3 * idx + 3]
            frics.append(c * f_e[2][None])
            cones.append(
                (c * (self.mu**2 * f_e[2] ** 2 - f_e[0] ** 2 - f_e[1] ** 2))[None]
            )
        rows += frics + cones
        rows.append(q[form.model.base_nq:])  # joint positions (ocp.py:183-189)
        rows.append(v[6:])  # joint velocities
        if self.has_tau:
            rows.append(d["tau_j"])  # torque box (ocp_whole_body_rnea.py:169-171)
        return jnp.concatenate(rows)

    def stage_bounds(self, sp: StageParams, shared: SharedParams):
        """Per-row (l, u) for one node; equality rows are 0/0."""
        form = self.form
        nf4, nj = form.n_feet, form.nj
        l = [jnp.zeros(self.n_eq)]
        u = [jnp.zeros(self.n_eq)]

        # friction normal >= 0, cone >= 0
        l.append(jnp.zeros(2 * nf4))
        u.append(jnp.full((2 * nf4,), _INF))

        sm = sp.state_mask
        # q rows read dx slots, which are pinned at node 0 — the row cannot
        # act there, so its bounds open up (the dense path's Jacobian row is
        # zero at node 0 for the same reason).
        smq = sp.state_mask * sp.node0_mask
        pos_min = jnp.asarray(form.robot.joint_pos_min, dtype=jnp.float32)
        pos_max = jnp.asarray(form.robot.joint_pos_max, dtype=jnp.float32)
        vel_max = jnp.asarray(form.robot.joint_vel_max, dtype=jnp.float32)
        l.append(jnp.where(smq > 0, pos_min, -_INF))
        u.append(jnp.where(smq > 0, pos_max, _INF))
        smv = sm if form.name == "centroidal_vel" else sm * sp.node0_mask
        l.append(jnp.where(smv > 0, -vel_max, -_INF))
        u.append(jnp.where(smv > 0, vel_max, _INF))
        if self.has_tau:
            tau_max = jnp.asarray(form.robot.joint_torque_max, dtype=jnp.float32)
            tm = sp.tau_mask
            l.append(jnp.where(tm > 0, -tau_max, -_INF))
            u.append(jnp.where(tm > 0, tau_max, _INF))
        return jnp.concatenate(l), jnp.concatenate(u)

    # ------------------------------------------------------------------
    def evaluate(self, Z, stage_params, shared):
        """Constraint values g (N, m) at the stacked iterate Z (N+1, s)."""
        DX = Z[:, : self.ndx]
        U = Z[:-1, self.ndx:]
        return jax.vmap(
            lambda dx, u_, dxn, sp: self.stage_residual(dx, u_, dxn, sp, shared)
        )(DX[:-1], U, DX[1:], stage_params)

    # -- split-linearize helpers ---------------------------------------
    def _dyn_fn(self, dx, u, sp, shared):
        """All dynamics rows at dx_next = 0 (the dx_next block is the
        constant pattern C, added back analytically). One vjp of this
        yields the row VALUES (reused for g) plus pullbacks for the
        nonlinear rows."""
        dxm = dx * sp.node0_mask
        return self.form.dyn_residual(
            shared.x_init, dxm, u, jnp.zeros(self.ndx), sp
        )

    def _vel_box_fn(self, dx, u, sp, shared):
        """Frame-velocity rows (contact xy, UNBLENDED z, arm EE — blend/
        target constants are added back analytically) followed by the box
        row values (q_j, v_j[, tau_j]), sharing one decode + one chain
        pass. The box rows ride along for their VALUES only — their
        Jacobians are exact selectors handled by the QP's box mode.

        Quaternion-base models route the frame kinematics through
        rbda.frame_kin_ad: the analytic custom JVP computes every frame's
        velocity/placement Jacobian in one closed-form pass instead of AD
        re-sweeping the fk chain per pullback row (17 ms of the 39 ms
        linearize at batch 512 x N14 on TPU); the relative-to-base arm
        composition is cheap algebra AD chains through exactly."""
        from .. import rbda

        form = self.form
        dxm = dx * sp.node0_mask
        d = form.decode(shared.x_init, dxm, u)
        sm = sp.state_mask
        if form.model.base_type != "euler_zyx":
            frames = tuple(form.foot_frames)
            if self.has_arm:
                frames = frames + (form.arm_ee_frame, form.base_frame)
            vel, pos, R = rbda.frame_kin_ad(
                form.model, frames, d["q"], d["v"])
            xy_rows = [sm * sp.contact[i] * vel[i, :2]
                       for i in range(form.n_feet)]
            z_rows = [sm * vel[i, 2][None] for i in range(form.n_feet)]
            rows = xy_rows + z_rows
            if self.has_arm:
                va, vb = vel[form.n_feet], vel[form.n_feet + 1]
                rel_pos = pos[form.n_feet] - pos[form.n_feet + 1]
                rel_lin = va[:3] - vb[:3] - jnp.cross(vb[3:], rel_pos)
                rel_lin_b = R[form.n_feet + 1].T @ rel_lin
                rows.append(
                    sm * jnp.concatenate([rel_lin_b[:2], va[2:3]]))
        else:
            kin = rbda.fk_vel(form.model, d["q"], d["v"])
            xy_rows, z_rows = [], []
            for idx in range(form.n_feet):
                c = sp.contact[idx]
                vel = rbda.frame_velocity_from(
                    form.model, form.foot_frames[idx], *kin
                )
                xy_rows.append(sm * c * vel[:2])
                z_rows.append(sm * vel[2][None])  # blend consts drop
            rows = xy_rows + z_rows
            if self.has_arm:
                vel = rbda.frame_velocity_from(
                    form.model, form.arm_ee_frame, *kin,
                    relative_to_base=True, base_frame=form.base_frame,
                )
                rows.append(sm * vel[:3])
        rows.append(d["q"][form.model.base_nq:])
        rows.append(d["v"][6:])
        if self.has_tau:
            rows.append(d["tau_j"])
        return jnp.concatenate(rows)

    def _cone_jac(self, u, sp):
        """Analytic friction-cone Jacobian rows: d/d f of
        c*(mu^2 fz^2 - fx^2 - fy^2) = c*[-2fx, -2fy, 2 mu^2 fz]."""
        form = self.form
        f = u[form.f_idx: form.f_idx + 3 * form.n_feet].reshape(
            form.n_feet, 3
        )
        c = sp.contact[: form.n_feet]
        vals = jnp.stack(
            [-2.0 * f[:, 0], -2.0 * f[:, 1], 2.0 * self.mu**2 * f[:, 2]],
            axis=1,
        ) * c[:, None]  # (nf, 3)
        J = jnp.zeros((form.n_feet, self.s))
        rows = np.repeat(np.arange(form.n_feet), 3)
        return J.at[rows, self.cone_cols].set(vals.reshape(-1))

    def _lin_jacobian(self, sp):
        """(m_dense, s) constant Jacobian: affine dynamics rows + the
        swing-zero-force / ext-force / friction-normal selector rows.
        Rows in dyn_nl_rows / vel_rows / cone_rows stay zero (overwritten
        by the AD results)."""
        J = jnp.zeros((self.m_dense, self.s))
        J = J.at[: self.n_dyn].set(self.form.dyn_lin_jacobian(sp))
        sw_vals = jnp.repeat(1.0 - sp.contact[: self.form.n_feet], 3)
        J = J.at[self.sw_rows, self.sw_cols].set(sw_vals)
        if self.has_ext:
            J = J.at[self.ext_rows, self.ext_cols].set(1.0)
        J = J.at[self.fric_rows, self.fric_cols].set(
            sp.contact[: self.form.n_feet]
        )
        return J

    def _linearize_split(self, Z, stage_params, shared):
        """Split path: residual values AND Jacobians from two vjp forwards.

        Each AD-requiring row group runs through jax.vjp so its forward
        pass is computed ONCE and reused for the g values (jacrev +
        stage_residual would run the RNEA/FK forwards three times); every
        other row's value is a cheap closed form assembled here
        (stage_residual row order: dyn, swing force, contact xy, blended
        z, ext force, arm EE, friction normal, cone, q/v/tau boxes)."""
        DX = Z[:, : self.ndx]
        U = Z[:-1, self.ndx:]
        form = self.form
        nf = form.n_feet
        C_pat = np.asarray(form.dx_next_pattern(), dtype=np.float32)
        C_full = np.zeros((self.m_dense, self.ndx), dtype=np.float32)
        C_full[: form.n_dyn] = C_pat
        basis_d = jnp.asarray(self._basis_dyn)
        basis_v = jnp.asarray(self._basis_vel)
        n_vel = self._n_vel

        def one(dx, u_, dxn, sp):
            dyn0, pull_d = jax.vjp(
                lambda a, b: self._dyn_fn(a, b, sp, shared), dx, u_
            )
            g_dyn = dyn0 + jnp.asarray(C_pat) @ dxn
            Jd = jax.vmap(lambda ct: jnp.concatenate(pull_d(ct)))(basis_d)

            vb0, pull_v = jax.vjp(
                lambda a, b: self._vel_box_fn(a, b, sp, shared), dx, u_
            )
            Jv = jax.vmap(lambda ct: jnp.concatenate(pull_v(ct)))(basis_v)

            # Closed-form row values (forces are u slots: decode reads
            # forces = u[f_idx:] in every formulation).
            c = sp.contact[:nf]
            sm = sp.state_mask
            f = u_[form.f_idx: form.f_idx + 3 * nf].reshape(nf, 3)
            swing = (jnp.repeat(1.0 - c, 3) * f.reshape(-1))
            fric = c * f[:, 2]
            cone = c * (
                self.mu**2 * f[:, 2] ** 2 - f[:, 0] ** 2 - f[:, 1] ** 2
            )
            vzd = jax.vmap(
                lambda sw: get_spline_vel_z(
                    sw,
                    swing_period=shared.swing_period,
                    h_max=shared.swing_height,
                    v_liftoff=shared.swing_vel_limits[0],
                    v_touchdown=shared.swing_vel_limits[1],
                )
            )(sp.swing[:nf])
            rows = [
                g_dyn,
                swing,
                vb0[: 2 * nf],  # contact xy (already masked)
                vb0[2 * nf: 3 * nf] - sm * (1.0 - c) * vzd,  # blended z
            ]
            if self.has_ext:
                rows.append(
                    u_[form.f_idx + 3 * nf: form.f_idx + 3 * nf + 3]
                    - shared.ext_force_des
                )
            if self.has_arm:
                rows.append(vb0[3 * nf: 3 * nf + 3] - sm * shared.arm_vel_des)
            rows += [fric, cone, vb0[n_vel:]]
            g = jnp.concatenate(rows)

            GB = self._lin_jacobian(sp)
            GB = GB.at[self.dyn_nl_rows].set(Jd)
            GB = GB.at[self.vel_rows].set(Jv)
            GB = GB.at[self.cone_rows].set(self._cone_jac(u_, sp))
            return g, GB

        g, GB = jax.vmap(one)(DX[:-1], U, DX[1:], stage_params)
        C = jnp.broadcast_to(
            jnp.asarray(C_full), (self.nodes, self.m_dense, self.ndx)
        )
        return g, GB[..., : self.ndx], GB[..., self.ndx:], C

    def linearize(self, Z, stage_params, shared):
        """g and its stage-block Jacobians — the analog of CasADi's
        jacobian(g, x) (ocp.py:283).

        Default configs take the split path: affine rows (propagation,
        swing zero-force, ext force, friction normal) get analytic
        constant Jacobians and only the truly nonlinear rows (RNEA/ABA/
        centroidal gaps, frame velocities, cones) go through AD — jacrev,
        because those row counts (~40) are far below the stage width
        (~105 tangents for jacfwd).

        The dx_next block (C) is a constant identity pattern for all default
        formulations (Euler-propagation rows only), so those ndx tangents
        skip autodiff entirely (Formulation.dx_next_pattern)."""
        if self.split_ok:
            return self._linearize_split(Z, stage_params, shared)
        DX = Z[:, : self.ndx]
        U = Z[:-1, self.ndx:]
        C_pat = self.form.dx_next_pattern()

        if C_pat is not None:
            C_full = np.zeros((self.m, self.ndx), dtype=np.float32)
            C_full[: self.form.n_dyn] = C_pat

            def one(dx, u_, dxn, sp):
                fn = lambda a, b: self.stage_residual(a, b, dxn, sp, shared)
                g = fn(dx, u_)
                G, B = jax.jacfwd(fn, argnums=(0, 1))(dx, u_)
                return g, G, B

            g, G, B = jax.vmap(one)(DX[:-1], U, DX[1:], stage_params)
            C = jnp.broadcast_to(
                jnp.asarray(C_full[: self.m_dense]),
                (self.nodes, self.m_dense, self.ndx),
            )
            return g, G[:, : self.m_dense], B[:, : self.m_dense], C

        def one(dx, u_, dxn, sp):
            fn = lambda a, b, c: self.stage_residual(a, b, c, sp, shared)
            g = fn(dx, u_, dxn)
            G, B, C = jax.jacfwd(fn, argnums=(0, 1, 2))(dx, u_, dxn)
            return g, G, B, C

        g, G, B, C = jax.vmap(one)(DX[:-1], U, DX[1:], stage_params)
        return (g, G[:, : self.m_dense], B[:, : self.m_dense],
                C[:, : self.m_dense])

    def bounds(self, stage_params, shared):
        return jax.vmap(lambda sp: self.stage_bounds(sp, shared))(stage_params)

    # ------------------------------------------------------------------
    def objective_data(self, shared: SharedParams):
        """Diagonal tracking objective (ocp.py:80-101 + rnea variant)."""
        form = self.form
        N = self.nodes
        x_des = form.x_des(shared)
        dx_des = form.difference(shared.x_init, x_des)
        u_des = form.u_des(shared)

        Q = shared.Q_diag
        R = shared.R_diag

        P_rows, t_rows = [], []
        for i in range(N + 1):
            if i == 0:
                # dx_0 is pinned: unit dummy weight, target 0.
                pq, tq = jnp.ones(self.ndx), jnp.zeros(self.ndx)
            else:
                pq, tq = Q, dx_des
            if i < N:
                pu, tu = R, u_des
                if self.has_tau:
                    tau_sl = slice(self.ndx + form.tau_idx, self.s)
                    # beyond tau_nodes the torque slot is a pinned dummy
                    active = 1.0 if i < form.tau_nodes else 0.0
                    pu = pu.at[form.tau_idx:].set(
                        jnp.where(active > 0, R[form.tau_idx:], 1.0)
                    )
                    tu = tu.at[form.tau_idx:].set(
                        jnp.where(active > 0, tu[form.tau_idx:], 0.0)
                    )
            else:
                pu, tu = jnp.ones(self.nu), jnp.zeros(self.nu)
            P_rows.append(jnp.concatenate([pq, pu]))
            t_rows.append(jnp.concatenate([tq, tu]))
        P_base = jnp.stack(P_rows)
        z_des = jnp.stack(t_rows)

        P_w = jnp.zeros_like(P_base)
        z_w = jnp.zeros_like(z_des)
        if self.has_tau:
            sl = slice(self.ndx + form.tau_idx, self.s)
            P_w = P_w.at[0, sl].set(shared.W_diag)
            z_w = z_w.at[0, sl].set(shared.tau_prev)
        return ObjectiveData(P_base, z_des, P_w, z_w)

    def objective_value(self, Z, obj: ObjectiveData):
        e = Z - obj.z_des
        ew = Z - obj.z_w
        return jnp.sum(obj.P_base * e * e) + jnp.sum(obj.P_w * ew * ew)

    def objective_gradient(self, Z, obj: ObjectiveData):
        return 2.0 * obj.P_base * (Z - obj.z_des) + 2.0 * obj.P_w * (Z - obj.z_w)

    def hessian_diag(self, obj: ObjectiveData):
        return 2.0 * (obj.P_base + obj.P_w)
