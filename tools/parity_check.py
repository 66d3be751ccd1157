"""Control-sequence parity harness.

BASELINE.json's parity target compares our solver's executed control
sequence (q, v, a, forces, tau over the horizon) against the reference
Fatrop solution on the same configuration.  The reference stack (Pinocchio/
CasADi/Fatrop) is not installed in this image, so this tool works against a
dump file:

1. On a machine with the reference installed, run its run_ocp.py/run_mpc.py
   and save {q_sol, v_sol, a_sol, forces_sol, tau_sol} as JSON
   (lists of per-node arrays).
2. Here: `python tools/parity_check.py reference_dump.json` re-solves the
   same configuration with tpu-locoman and reports per-quantity errors.

Without a dump file, `--self-check` runs the internal physics-consistency
identity (the reference's own EOM-vs-RNEA debug check, run_mpc.py:186-241)
as the parity proxy.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def self_check():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig, rbda

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot, dynamics="whole_body_rnea", nodes=14,
        config=SQPConfig(sqp_iters=4, admm=ADMMConfig(iters=150)),
    )
    carry = mpc.init_carry()
    step = jax.jit(lambda c: mpc.step(
        c, jnp.float32(0.0), jnp.array([0.2, 0, 0, 0, 0, 0])))
    for _ in range(3):  # a few ticks to converge the warm start
        carry, stats = step(carry)
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    model = mpc.form.model
    ee = mpc.form.ee_frames
    tau_diffs, tau_b = [], []
    for k in range(mpc.nodes):
        q, v, a, forces = sol["q"][k], sol["v"][k], sol["a"][k], sol["forces"][k]
        tau_rnea = rbda.rnea(model, q, v, a, ee, forces)
        tau_diffs.append(float(jnp.linalg.norm(tau_rnea[6:] - sol["tau"][k])))
        tau_b.append(float(jnp.linalg.norm(tau_rnea[:6])))
    print(json.dumps({
        "check": "eom_vs_rnea_self_consistency",
        "avg_tau_diff": float(np.mean(tau_diffs)),
        "avg_tau_b_norm": float(np.mean(tau_b)),
        "max_violation": float(stats["max_violation"]),
    }))


def compare(dump_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig, ADMMConfig

    with open(dump_path) as f:
        ref = json.load(f)
    cfg = ref.get("config", {})
    robot_cls = {"go2": Go2, "b2": B2, "b2g": B2G}[cfg.get("robot", "b2g")]
    robot = robot_cls()
    robot.set_gait_sequence(cfg.get("gait", "trot"), cfg.get("gait_period", 0.8))
    mpc = MPC(
        robot,
        dynamics=cfg.get("dynamics", "whole_body_rnea"),
        nodes=cfg.get("nodes", 14),
        config=SQPConfig(sqp_iters=6, admm=ADMMConfig(iters=200)),
    )
    carry = mpc.init_carry(
        jnp.asarray(ref["x_init"], dtype=jnp.float32) if "x_init" in ref else None
    )
    step = jax.jit(lambda c: mpc.step(
        c, jnp.float32(0.0),
        jnp.asarray(cfg.get("base_vel_des", [0.2, 0, 0, 0, 0, 0]),
                    dtype=jnp.float32)))
    for _ in range(cfg.get("converge_ticks", 1)):
        carry, _ = step(carry)
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    out = {}
    for key in ["q", "v", "a", "forces", "tau"]:
        if key + "_sol" in ref:
            ours = np.asarray(sol[key])
            theirs = np.asarray(ref[key + "_sol"])[: ours.shape[0]]
            err = np.abs(ours - theirs)
            out[key] = {
                "max_abs_err": float(err.max()),
                "rms_err": float(np.sqrt((err ** 2).mean())),
                "ref_scale": float(np.abs(theirs).max()),
            }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", nargs="?", default=None)
    ap.add_argument("--self-check", action="store_true")
    args = ap.parse_args()
    if args.dump:
        compare(args.dump)
    else:
        self_check()
