"""Receding-horizon MPC driver.

TPU-native counterpart of the reference's run_mpc.py mpc_loop (lines 44-148)
and of the OCP parameter plumbing (ocp.py:216-242): schedule update,
warm-started solve, retraction of the executed node, and the plan-replay
state advance x <- integrate(x, DX_1) (run_mpc.py:109).  The whole tick is
one jitted function; the loop is lax.scan, so an entire MPC rollout (and a
batch of thousands of rollouts via vmap) is a single XLA program.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .dynamics.formulations import (
    StageParams,
    SharedParams,
    make_formulation,
)
from .ocp import Transcription
from .solver import SQPSolver, SQPConfig, SolverState


def geometric_dts(dt_min, dt_max, nodes):
    """Geometrically growing step sizes dt_i = dt_min * gamma^i
    (ocp.py:71-74)."""
    if nodes < 2:
        raise ValueError("geometric_dts needs nodes >= 2 (gamma exponent is 1/(nodes-1))")
    ratio = dt_max / dt_min
    gamma = ratio ** (1.0 / (nodes - 1))
    return dt_min * gamma ** jnp.arange(nodes, dtype=jnp.float32)


class MPCCarry(NamedTuple):
    x_init: jnp.ndarray
    solver_state: SolverState
    tau_prev: jnp.ndarray


class MPC:
    """One robot + formulation + horizon, solved at a fixed control rate.

    Mirrors the configuration surface of run_mpc.py:11-41 and make_ocp
    (ocp_factory.py:8-27).
    """

    def __init__(
        self,
        robot,
        dynamics="whole_body_rnea",
        nodes=14,
        dt_min=0.01,
        dt_max=0.08,
        swing_height=0.07,
        swing_vel_limits=(0.1, -0.2),
        config: SQPConfig = SQPConfig(),
        flip_reset=True,
        warm_shift=True,
        **form_kwargs,
    ):
        assert robot.gait_sequence is not None, "call robot.set_gait_sequence first"
        if isinstance(config, str):
            from .solver.sqp import PRESETS

            if config not in PRESETS:
                raise ValueError(
                    f"unknown config preset {config!r}; "
                    f"available: {sorted(PRESETS)}")
            config = PRESETS[config]()
        self.robot = robot
        self.form = make_formulation(dynamics, robot, **form_kwargs)
        self.trans = Transcription(self.form, nodes)
        self.solver = SQPSolver(self.trans, config)
        self.nodes = nodes
        self.flip_reset = flip_reset
        self.warm_shift = warm_shift
        self.dt_min = dt_min
        self.dt_max = dt_max
        self.swing_height = swing_height
        self.swing_vel_limits = swing_vel_limits
        self.dts = geometric_dts(dt_min, dt_max, nodes)

        gs = robot.gait_sequence
        self.gait = gs
        self.n_contacts = gs.n_contacts
        self.swing_period = gs.swing_period

        Q, R = self.form.default_weights()
        self.Q_diag = Q
        self.R_diag = R
        self.W_diag = (
            self.form.default_W()
            if hasattr(self.form, "default_W")
            else np.zeros(self.form.nj, dtype=np.float32)
        )

    # ------------------------------------------------------------------
    def x_nom(self):
        return jnp.asarray(self.form.x_nom(), dtype=jnp.float32)

    def make_shared(self, x_init, base_vel_des, ext_force_des=None,
                    arm_vel_des=None, tau_prev=None):
        z3 = jnp.zeros(3)
        return SharedParams(
            x_init=x_init,
            base_vel_des=jnp.asarray(base_vel_des, dtype=jnp.float32),
            ext_force_des=z3 if ext_force_des is None else jnp.asarray(
                ext_force_des, dtype=jnp.float32),
            arm_vel_des=z3 if arm_vel_des is None else jnp.asarray(
                arm_vel_des, dtype=jnp.float32),
            swing_period=jnp.float32(self.swing_period),
            swing_height=jnp.float32(self.swing_height),
            swing_vel_limits=jnp.asarray(self.swing_vel_limits, dtype=jnp.float32),
            n_contacts=jnp.float32(self.n_contacts),
            Q_diag=jnp.asarray(self.Q_diag),
            R_diag=jnp.asarray(self.R_diag),
            W_diag=jnp.asarray(self.W_diag),
            tau_prev=jnp.zeros(self.form.nj) if tau_prev is None else tau_prev,
        )

    def make_stage_params(self, t_current):
        """Per-node schedules and masks (ocp.py:234-242 analog)."""
        contact, swing = self.gait.get_gait_schedule(t_current, self.dts)
        idx = jnp.arange(self.nodes, dtype=jnp.float32)
        is_cvel = self.form.name == "centroidal_vel"
        node0 = jnp.where(idx > 0, 1.0, 0.0)
        state_mask = jnp.ones(self.nodes) if is_cvel else node0
        if getattr(self.form, "tau_idx", None) is not None:
            tau_mask = jnp.where(idx < self.form.tau_nodes, 1.0, 0.0)
        else:
            tau_mask = jnp.ones(self.nodes)
        return StageParams(
            dt=self.dts,
            contact=contact.T,  # (nodes, 4)
            swing=swing.T,
            state_mask=state_mask,
            tau_mask=tau_mask,
            node0_mask=node0,
        )

    # ------------------------------------------------------------------
    def _shift_Z(self, Z, x_old, x_new):
        """Time-consistent warm-start shift (warm_shift=True).

        The reference warm-starts each node with the SAME node's previous
        solution (ocp_whole_body_rnea.py:207-235) — after a dt_min tick
        every node's iterate is dt_min STALE in wall-clock time, which is
        what the gait-transition spike feeds on (the schedule marches,
        the iterate doesn't). Since the node-time grid is static
        (geometric dts), the previous solution can instead be linearly
        interpolated at each node's advanced time t_i + dt_min with
        compile-time-constant gather indices/weights, and the dx tangents
        rebased from the old anchor state onto the new one:

            dx'_i = difference(x_new, integrate(x_old, interp_i(dx)))

        Node 0 lands exactly on the executed node-1 state, so dx'_0 = 0
        holds by construction."""
        form = self.form
        ndx = form.ndx
        N = self.nodes
        told = np.concatenate([[0.0], np.cumsum(np.asarray(self.dts))])
        # dx grid: N+1 nodes at times told
        j = np.clip(np.searchsorted(told, told + self.dt_min) - 1, 0, N - 1)
        w = np.clip((told + self.dt_min - told[j])
                    / (told[j + 1] - told[j]), 0.0, 1.0)
        j = jnp.asarray(j, dtype=jnp.int32)
        w = jnp.asarray(w, dtype=Z.dtype)[:, None]
        dx = Z[:, :ndx]
        dx_i = (1.0 - w) * dx[j] + w * dx[j + 1]
        dx_s = jax.vmap(
            lambda d: form.difference(x_new, form.integrate(x_old, d))
        )(dx_i)
        # u grid: N nodes at times told[:N] (terminal node has no u)
        # nodes >= 2 guaranteed by geometric_dts at construction
        ju = np.clip(np.searchsorted(told[:N], told[:N] + self.dt_min) - 1,
                     0, N - 2)
        wu = np.clip((told[:N] + self.dt_min - told[ju])
                     / (told[ju + 1] - told[ju]), 0.0, 1.0)
        ju1 = jnp.asarray(ju + 1, dtype=jnp.int32)  # <= N-1 by the clip
        ju = jnp.asarray(ju, dtype=jnp.int32)
        wu = jnp.asarray(wu, dtype=Z.dtype)[:, None]
        u = Z[:N, ndx:]
        u_i = (1.0 - wu) * u[ju] + wu * u[ju1]
        u_s = jnp.concatenate([u_i, Z[N:, ndx:]], axis=0)
        return jnp.concatenate([dx_s, u_s], axis=1)

    def warm_start_Z(self, Z, sp: StageParams, shared):
        """Reset the force slots of the warm start to the (contact-masked)
        gravity-split targets, keeping previous dx / velocity / torque
        entries — mirrors the reference warm_start()
        (e.g. ocp_centroidal_acc.py:139-164)."""
        form = self.form
        f_des = form.f_des(shared.n_contacts)  # (nf,)
        # feet forces masked by the current contact schedule
        mask = jnp.repeat(sp.contact, 3, axis=1)  # (nodes, 12)
        f_feet = f_des[: 3 * form.n_feet][None, :] * mask
        f_all = (
            jnp.concatenate(
                [f_feet, jnp.tile(f_des[3 * form.n_feet:], (self.nodes, 1))],
                axis=1,
            )
            if form.nf > 3 * form.n_feet
            else f_feet
        )
        ndx = form.ndx
        f0 = ndx + form.f_idx
        return Z.at[:-1, f0: f0 + form.nf].set(f_all)

    def init_carry(self, x_init=None):
        x0 = self.x_nom() if x_init is None else jnp.asarray(x_init)
        state = self.solver.init_state()
        shared = self.make_shared(x0, jnp.zeros(6))
        sp = self.make_stage_params(jnp.float32(0.0))
        state = state._replace(Z=self.warm_start_Z(state.Z, sp, shared))
        return MPCCarry(
            x_init=x0,
            solver_state=state,
            tau_prev=jnp.zeros(self.form.nj),
        )

    def step(self, carry: MPCCarry, t_current, base_vel_des,
             ext_force_des=None, arm_vel_des=None, stage_params=None,
             prev_stage_params=None):
        """One MPC tick (run_mpc.py:69-113).

        stage_params overrides the internally generated schedules — e.g. to
        mix gait types across a vmapped scenario batch (each scenario feeds
        its own contact/swing schedules); prev_stage_params (optional)
        supplies the previous tick's schedules for the flip reset below."""
        shared = self.make_shared(
            carry.x_init, base_vel_des, ext_force_des, arm_vel_des,
            tau_prev=carry.tau_prev,
        )
        sp = stage_params if stage_params is not None else (
            self.make_stage_params(t_current)
        )
        Z = self.warm_start_Z(carry.solver_state.Z, sp, shared)

        # Flip reset: when a contact switch crosses a node boundary between
        # ticks, the carried acceleration slots of that node were optimized
        # for the OTHER contact state and one warm-started SQP iteration
        # can't fully repair them — the gait-transition violation spike.
        # Zeroing the a slots of flipped nodes cuts the spike ~30% at zero
        # runtime cost (tools/flip_reset_probe.py: go2 N8 hot config mean
        # 0.094 -> 0.081, worst 0.418 -> 0.290; duals are NOT the cause,
        # see dual_reset_probe). flip_reset="aba" instead seeds the
        # flipped nodes' a slots with ABA(q, v, tau, f_warmstart) —
        # RNEA(q, v, ABA(q, v, tau, f), f) = tau identically, so those
        # nodes' RNEA rows start at ~zero residual. MEASURED WORSE than
        # zeroing (go2 N8 hot config worst 0.29 -> 1.95,
        # tools/flip_mode_probe.py): the consistent accelerations are
        # violent at fresh swing feet (near-zero force = free fall) and
        # blow up the kinematic propagation rows instead. Kept as the
        # recorded negative result; the default stays "zero".
        na = getattr(self.form, "na_opt", 0)
        if self.flip_reset and na > 0:
            if prev_stage_params is not None:
                prev_contact = prev_stage_params.contact
            elif stage_params is None:
                prev_contact = self.make_stage_params(
                    t_current - self.dt_min).contact
            else:
                prev_contact = None
            if prev_contact is not None:
                flipped = jnp.any(sp.contact != prev_contact, axis=1)
                node_mask = jnp.concatenate(
                    [flipped, jnp.zeros(1, dtype=bool)])[:, None]
                ndx = self.form.ndx
                if (self.flip_reset == "aba"
                        and hasattr(self.form, "aba_dyn")):
                    form = self.form

                    def node_a(z):
                        d = form.decode(shared.x_init, z[:ndx], z[ndx:])
                        return form.aba_dyn(
                            d["q"], d["v"], d["tau_j"], d["forces"])

                    a_new = jax.vmap(node_a)(Z[:-1])
                    a_pad = jnp.concatenate(
                        [a_new, jnp.zeros((1, na), dtype=Z.dtype)], axis=0)
                    Z = jnp.where(
                        node_mask, Z.at[:, ndx:ndx + na].set(a_pad), Z)
                else:
                    Z = jnp.where(
                        node_mask, Z.at[:, ndx:ndx + na].set(0.0), Z)

        warm = carry.solver_state._replace(Z=Z)
        new_state, stats = self.solver.solve(warm, sp, shared)

        ndx = self.form.ndx
        DX1 = new_state.Z[1, :ndx]
        x_next = self.form.integrate(carry.x_init, DX1)

        if getattr(self.form, "tau_idx", None) is not None:
            # tau_prev reads the UNSHIFTED solution's node 1 (the executed
            # torque hand-off, run_mpc.py:111) — keep it before the shift.
            tau_prev = new_state.Z[1, ndx + self.form.tau_idx:]
        else:
            tau_prev = carry.tau_prev

        if self.warm_shift:
            # Store the next tick's warm start already time-shifted and
            # rebased onto the state we just advanced to (see _shift_Z).
            new_state = new_state._replace(
                Z=self._shift_Z(new_state.Z, carry.x_init, x_next))

        return MPCCarry(x_next, new_state, tau_prev), stats

    def run(self, n_loops, base_vel_des, ext_force_des=None, arm_vel_des=None,
            x_init=None):
        """Full MPC rollout as one lax.scan (the jittable analog of the
        mpc_loop in run_mpc.py:69-148)."""
        base_vel_des = jnp.asarray(base_vel_des, dtype=jnp.float32)

        def tick(carry, k):
            t = k.astype(jnp.float32) * self.dt_min
            carry, stats = self.step(
                carry, t, base_vel_des, ext_force_des, arm_vel_des
            )
            out = {
                "x": carry.x_init,
                "max_violation": stats["max_violation"],
                "alpha": stats["alpha"],
                # 0 = ok, 1 = line search rejected every trial, 2 = QP
                # failure (the reference leaves status a TODO, ocp.py:369)
                "status": stats["status"],
            }
            return carry, out

        carry = self.init_carry(x_init)
        carry, outs = jax.lax.scan(tick, carry, jnp.arange(n_loops))
        return carry, outs

    # ------------------------------------------------------------------
    def retract(self, Z, x_init, num_steps=None):
        """Decode the stacked solution into executed quantities
        (q, v, a, forces, tau) per node — the analog of
        retract_stacked_sol / the generated retract_solution.c
        (e.g. ocp_centroidal_vel.py:208-337)."""
        form = self.form
        n = self.nodes if num_steps is None else num_steps
        ndx, s = form.ndx, self.trans.s
        out = {"q": [], "v": [], "a": [], "forces": [], "tau": []}
        for i in range(n):
            dx = Z[i, :ndx] if i > 0 else jnp.zeros(ndx)
            u = Z[i, ndx:]
            d = form.decode(x_init, dx, u)
            q, v, forces = d["q"], d["v"], d["forces"]
            if form.name == "centroidal_vel":
                # finite-difference acc with exact base rows
                # (ocp_centroidal_vel.py:183-198)
                u_next = Z[i + 1, ndx:] if i + 1 < self.nodes else u
                dn = form.decode(x_init, Z[i + 1, :ndx], u_next)
                a = (dn["v"] - v) / self.dts[i]
                a_b = form.base_acc_dynamics(q, v, a[6:], forces)
                a = jnp.concatenate([a_b, a[6:]])
                tau = form.rnea_dyn(q, v, a, forces)[6:]
            elif form.name == "whole_body_rnea":
                a = d["a"]
                tau = d["tau_j"]
            elif form.name == "whole_body_aba":
                a = d["a"]
                tau = d["tau_j"]
            else:
                a = d["a"]
                tau = form.rnea_dyn(q, v, a, forces)[6:]
            out["q"].append(q)
            out["v"].append(v)
            out["a"].append(a)
            out["forces"].append(forces)
            out["tau"].append(tau)
        return {k: jnp.stack(vs) for k, vs in out.items()}
