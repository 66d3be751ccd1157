"""Single-OCP solve example — the analog of the reference run_ocp.py.

Solves one trajectory-optimization problem to convergence (multiple SQP
iterations, the Fatrop-quality path) and prints the solve-quality metrics
the reference prints (solve time, horizon length, max violation, and the
EOM-vs-RNEA debug check from run_ocp.py:106-161).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="b2g", choices=["go2", "b2", "b2g"])
    ap.add_argument("--dynamics", default="whole_body_rnea")
    ap.add_argument("--gait", default="trot")
    ap.add_argument("--gait-period", type=float, default=0.8)
    ap.add_argument("--nodes", type=int, default=14)
    ap.add_argument("--dt-min", type=float, default=0.01)
    ap.add_argument("--dt-max", type=float, default=0.08)
    ap.add_argument("--sqp-iters", type=int, default=5)
    ap.add_argument("--admm-iters", type=int, default=100)
    ap.add_argument("--vx", type=float, default=0.2)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig, ADMMConfig, rbda

    robot = {"go2": Go2, "b2": B2, "b2g": B2G}[args.robot]()
    robot.set_gait_sequence(args.gait, args.gait_period)

    mpc = MPC(
        robot,
        dynamics=args.dynamics,
        nodes=args.nodes,
        dt_min=args.dt_min,
        dt_max=args.dt_max,
        config=SQPConfig(
            sqp_iters=args.sqp_iters, admm=ADMMConfig(iters=args.admm_iters)
        ),
    )
    base_vel_des = jnp.array([args.vx, 0, 0, 0, 0, 0], dtype=jnp.float32)

    carry = mpc.init_carry()
    step = jax.jit(lambda c: mpc.step(c, jnp.float32(0.0), base_vel_des))
    t0 = time.time()
    carry, stats = step(carry)
    jax.block_until_ready(carry.x_init)
    print("Solve time incl. compile (ms):", round((time.time() - t0) * 1e3, 1))
    t0 = time.time()
    carry, stats = step(carry)
    jax.block_until_ready(carry.x_init)
    print("Solve time (ms):", round((time.time() - t0) * 1e3, 1))
    print("Horizon length (s):", float(jnp.sum(mpc.dts)))
    print("Max violation:", float(stats["max_violation"]))

    if args.debug:
        sol = mpc.retract(carry.solver_state.Z, carry.x_init)
        model = mpc.form.model
        feet = mpc.form.foot_frames
        ee = feet + ([mpc.form.ext_force_frame] if mpc.form.ext_force_frame else [])
        tau_diffs, tau_b_norms = [], []
        for k in range(len(sol["q"])):
            q, v, a = sol["q"][k], sol["v"][k], sol["a"][k]
            forces = sol["forces"][k]
            M = rbda.crba(model, q)
            nle = rbda.nonlinear_effects(model, q, v)
            tau_ext = jnp.zeros(model.nv)
            for idx, fname in enumerate(ee):
                J = rbda.frame_jacobian_lwa(model, fname, q)
                tau_ext = tau_ext + J[:3].T @ forces[3 * idx: 3 * idx + 3]
            tau_all = M @ a + nle - tau_ext
            tau_rnea = rbda.rnea(model, q, v, a, ee, forces)
            tau_diffs.append(float(jnp.linalg.norm(tau_all - tau_rnea)))
            tau_b_norms.append(float(jnp.linalg.norm(tau_all[:6])))
        print("Avg tau_diff:", np.mean(tau_diffs))
        print("Avg tau_b_norm:", np.mean(tau_b_norms))


if __name__ == "__main__":
    main()
