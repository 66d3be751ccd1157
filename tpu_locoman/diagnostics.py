"""Solver structure and solve-quality diagnostics.

TPU-native counterpart of the reference's debugging surface:
- utils/debug_fatrop.py (spy-plot of expected vs actual stage structure)
  becomes a stage-structure report over the transcription's Jacobian blocks;
- the per-solve quality prints (ocp.py:367,388-414) become a structured
  SolveReport;
- jax.profiler hooks replace wall-clock prints (SURVEY.md §5).
"""

import contextlib
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


def row_group_layout(trans):
    """Named row groups of the per-node constraint vector — the analog of
    Fatrop's stage-structure blocks (utils/debug_fatrop.py:5-23)."""
    form = trans.form
    nv = form.nv
    groups = []
    off = 0

    def add(name, n):
        nonlocal off
        groups.append((name, off, off + n))
        off += n

    name = form.name
    if name == "centroidal_vel":
        add("dyn:h_prop", 6)
        add("dyn:q_prop", nv)
        if form.include_base:
            add("dyn:gaps", 6)
    elif name in ("centroidal_acc", "whole_body_acc"):
        add("dyn:q_prop", nv)
        add("dyn:v_prop", nv)
        if form.include_base:
            add("dyn:gaps", 6)
    elif name == "whole_body_rnea":
        add("dyn:q_prop", nv)
        if form.include_acc:
            add("dyn:v_prop", nv)
        add("dyn:rnea_base", 6)
        add("dyn:tau_eq", form.nj)
    elif name == "whole_body_aba":
        add("dyn:q_prop", nv)
        add("dyn:v_prop", nv)
    add("eq:swing_zero_force", 3 * form.n_feet)
    add("eq:contact_vel_xy", 2 * form.n_feet)
    add("eq:vel_z_blend", form.n_feet)
    if trans.has_ext:
        add("eq:ext_force", 3)
    if trans.has_arm:
        add("eq:arm_vel", 3)
    add("ineq:friction_normal", form.n_feet)
    add("ineq:friction_cone", form.n_feet)
    add("ineq:joint_pos", form.nj)
    add("ineq:joint_vel", form.nj)
    if trans.has_tau:
        add("ineq:torque", form.nj)
    assert off == trans.m, (off, trans.m)
    return groups


@dataclass
class SolveReport:
    max_violation: float
    violation_by_group: dict
    objective: float
    alpha: float
    extras: dict = field(default_factory=dict)

    def pretty(self):
        lines = [
            f"max_violation: {self.max_violation:.5f}",
            f"objective:     {self.objective:.3f}",
            f"alpha:         {self.alpha:.3f}",
            "violation by row group:",
        ]
        for k, v in sorted(
            self.violation_by_group.items(), key=lambda kv: -kv[1]
        ):
            lines.append(f"  {k:24s} {v:.5f}")
        return "\n".join(lines)


def solve_report(mpc, carry, t_current, base_vel_des, solve=False,
                 **target_kw):
    """Structured per-solve quality report (the analog of the reference's
    printouts at ocp.py:367-414).

    solve=False (default) inspects the carried iterate as-is — cheap, no
    solver compile. With solve=True one solver step is performed from the
    carry and the report covers the resulting iterate — including the real
    line-search alpha and status the reference prints every solve
    (ocp.py:475) — at the cost of compiling a full solver step."""
    shared = mpc.make_shared(
        carry.x_init, base_vel_des, tau_prev=carry.tau_prev, **target_kw
    )
    sp = mpc.make_stage_params(t_current)
    trans = mpc.trans
    extras = {}
    if solve:
        warm = carry.solver_state._replace(
            Z=mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
        )
        state, stats = mpc.solver.solve(warm, sp, shared)
        Z = state.Z
        alpha = float(stats["alpha"])
        extras["status"] = int(stats["status"])
    else:
        Z = carry.solver_state.Z
        alpha = float("nan")
    g = trans.evaluate(Z, sp, shared)
    l, u = trans.bounds(sp, shared)
    viol = np.asarray(jnp.maximum(0, l - g) + jnp.maximum(0, g - u))
    groups = row_group_layout(trans)
    by_group = {
        name: float(viol[:, a:b].max()) if b > a else 0.0
        for name, a, b in groups
    }
    obj = trans.objective_value(Z, trans.objective_data(shared))
    return SolveReport(
        max_violation=float(viol.max()),
        violation_by_group=by_group,
        objective=float(obj),
        alpha=alpha,
        extras=extras,
    )


def structure_check(mpc, tol=1e-6):
    """Verify the stage-structure assumption the KKT solver relies on:
    node i's constraint rows touch only (dx_i, u_i, dx_{i+1}) — the analog
    of Fatrop's structure detection (ocp.py:251 'structure_detection:auto',
    utils/debug_fatrop.py)."""
    import jax.numpy as jnp

    trans = mpc.trans
    carry = mpc.init_carry()
    shared = mpc.make_shared(carry.x_init, jnp.zeros(6),
                             tau_prev=carry.tau_prev)
    sp = mpc.make_stage_params(jnp.float32(0.0))
    rng = np.random.default_rng(0)
    Z = jnp.asarray(
        rng.normal(size=(mpc.nodes + 1, trans.s)) * 0.01, dtype=jnp.float32
    )
    g, G, B, C = trans.linearize(Z, sp, shared)
    report = {
        "rows_per_node": trans.m,
        "eq_rows": trans.n_eq,
        "ineq_rows": trans.n_ineq,
        "stage_width": trans.s,
        "G_nonzero_frac": float((np.abs(np.asarray(G)) > tol).mean()),
        "B_nonzero_frac": float((np.abs(np.asarray(B)) > tol).mean()),
        "C_nonzero_frac": float((np.abs(np.asarray(C)) > tol).mean()),
        "finite": bool(
            np.all(np.isfinite(np.asarray(G)))
            and np.all(np.isfinite(np.asarray(B)))
            and np.all(np.isfinite(np.asarray(C)))
        ),
    }
    return report


def spy_plot(mpc, path, node=1, tol=1e-6):
    """Expected-vs-actual stage-structure spy plot — the analog of the
    reference's Fatrop structure debugging (utils/debug_fatrop.py:5-23),
    which images the A/B/C/D/I blocks and marks offending rows.

    Renders the actual nonzero pattern of one node's [G | B | C] Jacobian
    blocks, draws the named row-group boundaries, and overlays (in red) any
    nonzeros outside the expected stage structure: C entries outside the
    constant propagation pattern, and box-selector rows that acquired
    off-selector entries."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trans = mpc.trans
    carry = mpc.init_carry()
    shared = mpc.make_shared(carry.x_init, jnp.zeros(6),
                             tau_prev=carry.tau_prev)
    sp = mpc.make_stage_params(jnp.float32(0.13))
    rng = np.random.default_rng(0)
    Z = jnp.asarray(
        rng.normal(size=(mpc.nodes + 1, trans.s)) * 0.01, dtype=jnp.float32
    )
    g, G, B, C = jax.device_get(trans.linearize(Z, sp, shared))
    GBC = np.concatenate([G[node], B[node], C[node]], axis=1)
    actual = np.abs(GBC) > tol

    # Expected C block: constant propagation pattern only.
    C_pat = mpc.form.dx_next_pattern()
    offending = np.zeros_like(actual)
    if C_pat is not None:
        expected_C = np.zeros((trans.m_dense, trans.ndx), dtype=bool)
        expected_C[: mpc.form.n_dyn] = np.abs(C_pat) > 0
        off_C = (np.abs(C[node]) > tol) & ~expected_C
        offending[:, trans.s:] = off_C

    fig, ax = plt.subplots(figsize=(12, 9))
    img = np.zeros(actual.shape + (3,))
    img[actual] = [0.15, 0.45, 0.85]
    img[offending] = [0.9, 0.1, 0.1]
    ax.imshow(1 - 0.9 * (img.sum(-1) > 0)[..., None] * (1 - img),
              aspect="auto", interpolation="nearest")
    for x_ in (trans.ndx, trans.s):
        ax.axvline(x_ - 0.5, color="k", lw=0.8)
    for name, a, b in row_group_layout(trans):
        if b > a and a < trans.m_dense:
            ax.axhline(a - 0.5, color="gray", lw=0.5)
            ax.text(GBC.shape[1] + 1, (a + min(b, trans.m_dense)) / 2, name,
                    fontsize=6, va="center")
    ax.set_title(
        f"node {node} stage Jacobian [G | B | C] nonzeros "
        f"(red = outside expected structure)"
    )
    ax.set_xlabel("dx | u | dx_next")
    ax.set_ylabel("constraint row")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    n_off = int(offending.sum())
    return {"path": path, "offending_entries": n_off}


@contextlib.contextmanager
def profile_trace(logdir="/tmp/tpu_locoman_trace"):
    """jax.profiler trace context (SURVEY.md §5 tracing equivalent)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
