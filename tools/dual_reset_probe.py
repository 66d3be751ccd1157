"""Hypothesis probe: gait-transition violation spikes come from STALE ADMM
DUALS on rows whose contact status flipped between ticks (the warm-started
y_admm carries the dual from the row's previous activation phase).

Runs the hot config rollout twice — vanilla vs zeroing the carried duals on
(node, foot) rows whose contact schedule changed since the previous tick —
and prints the per-tick max-violation profile of each. Round-2 reference
point: corrector=5 halves spikes (0.76 -> 0.32, go2 N=8 CPU hot config).

Env: DRP_ROBOT (go2), DRP_NODES (8), DRP_TICKS (40), DRP_SQP (1),
DRP_ADMM (10), DRP_RESET_Z (0: duals only; 1: also reset z rows).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def contact_row_masks(trans):
    """(n_feet, m) bool: rows of the per-node constraint vector whose
    activity depends on foot f's contact flag."""
    from tpu_locoman.diagnostics import row_group_layout

    groups = {name: (a, b) for name, a, b in row_group_layout(trans)}
    nf = trans.form.n_feet
    masks = np.zeros((nf, trans.m), dtype=bool)
    per_foot = {
        "eq:swing_zero_force": 3,
        "eq:contact_vel_xy": 2,
        "eq:vel_z_blend": 1,
        "ineq:friction_normal": 1,
        "ineq:friction_cone": 1,
    }
    for name, width in per_foot.items():
        a, b = groups[name]
        assert b - a == width * nf, (name, a, b, width, nf)
        for f in range(nf):
            masks[f, a + width * f: a + width * (f + 1)] = True
    return masks


def rollout(mpc, ticks, reset_duals, reset_z=False):
    import jax
    import jax.numpy as jnp

    foot_rows = jnp.asarray(contact_row_masks(mpc.trans))  # (nf, m)
    bvd = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
    step = jax.jit(lambda c, t: mpc.step(c, t, bvd))

    carry = mpc.init_carry()
    prev_contact = mpc.make_stage_params(jnp.float32(0.0)).contact
    viols = []
    for k in range(ticks):
        t = jnp.float32(k * mpc.dt_min)
        if reset_duals:
            sp = mpc.make_stage_params(t)
            changed = sp.contact != prev_contact          # (nodes, nf)
            reset = jnp.einsum("nf,fm->nm", changed.astype(jnp.float32),
                               foot_rows.astype(jnp.float32)) > 0
            ss = carry.solver_state
            y = jnp.where(reset, 0.0, ss.y_admm)
            z = jnp.where(reset, 0.0, ss.z_admm) if reset_z else ss.z_admm
            carry = carry._replace(
                solver_state=ss._replace(y_admm=y, z_admm=z))
            prev_contact = sp.contact
        carry, stats = step(carry, t)
        viols.append(float(stats["max_violation"]))
    return np.asarray(viols)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu"
                      if jax.default_backend() == "cpu" else "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpu_locoman import Go2, B2G, MPC, SQPConfig, ADMMConfig

    robot_name = os.environ.get("DRP_ROBOT", "go2")
    nodes = int(os.environ.get("DRP_NODES", "8"))
    ticks = int(os.environ.get("DRP_TICKS", "40"))
    sqp_iters = int(os.environ.get("DRP_SQP", "1"))
    admm_iters = int(os.environ.get("DRP_ADMM", "10"))
    reset_z = os.environ.get("DRP_RESET_Z", "0") == "1"

    robot = {"go2": Go2, "b2g": B2G}[robot_name]()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
              config=SQPConfig(sqp_iters=sqp_iters,
                               admm=ADMMConfig(iters=admm_iters)))

    base = rollout(mpc, ticks, reset_duals=False)
    rset = rollout(mpc, ticks, reset_duals=True, reset_z=reset_z)
    for name, v in (("vanilla", base), ("dual-reset", rset)):
        print(f"{name:12s} mean {v.mean():.3f}  median {np.median(v):.3f}  "
              f"worst {v.max():.3f}")
    print("per-tick (vanilla):   ", np.round(base, 3).tolist())
    print("per-tick (dual-reset):", np.round(rset, 3).tolist())


if __name__ == "__main__":
    main()
