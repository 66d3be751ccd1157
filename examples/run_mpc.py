"""Receding-horizon MPC example — the analog of the reference run_mpc.py.

Runs the full jitted MPC loop (one lax.scan), prints solve statistics, and
optionally dumps the executed trajectory for host-side visualization (the
MeshCat analog is a trajectory file; see --dump).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="b2g", choices=["go2", "b2", "b2g"])
    ap.add_argument("--dynamics", default="whole_body_rnea")
    ap.add_argument("--gait", default="trot")
    ap.add_argument("--gait-period", type=float, default=0.8)
    ap.add_argument("--nodes", type=int, default=14)
    ap.add_argument("--mpc-loops", type=int, default=100)
    ap.add_argument("--sqp-iters", type=int, default=2)
    ap.add_argument("--admm-iters", type=int, default=100)
    ap.add_argument("--vx", type=float, default=0.2)
    ap.add_argument("--dump", default=None, help="write trajectory JSON here")
    ap.add_argument("--viz", default=None,
                    help="write a self-contained 3D replay HTML here")
    ap.add_argument("--live", action="store_true",
                    help="serve a live 3D viewer and stream ticks to it "
                         "(the MeshCat live-display analog)")
    ap.add_argument("--live-port", type=int, default=8765)
    ap.add_argument("--warm-shift", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="time-consistent warm-start shift (halves "
                    "gait-transition violation spikes; see mpc._shift_Z). "
                    "On by default; --no-warm-shift for the reference's "
                    "same-node warm start")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig, ADMMConfig

    robot = {"go2": Go2, "b2": B2, "b2g": B2G}[args.robot]()
    robot.set_gait_sequence(args.gait, args.gait_period)
    mpc = MPC(
        robot,
        dynamics=args.dynamics,
        nodes=args.nodes,
        warm_shift=args.warm_shift,
        config=SQPConfig(
            sqp_iters=args.sqp_iters, admm=ADMMConfig(iters=args.admm_iters)
        ),
    )
    base_vel_des = jnp.array([args.vx, 0, 0, 0, 0, 0], dtype=jnp.float32)

    if args.live:
        # Per-tick Python loop (instead of the lax.scan rollout) so each
        # executed state can be streamed to the browser as it happens —
        # the reference's robot.init_visualizer() + display(q) loop
        # (run_mpc.py:163-165).
        from tpu_locoman.viz import LiveViewer

        viewer = LiveViewer(mpc.form.model,
                            frame_names=tuple(mpc.form.foot_frames),
                            dt=mpc.dt_min, port=args.live_port)
        print("Live viewer serving at", viewer.url)
        step = jax.jit(lambda c, t: mpc.step(c, t, base_vel_des))
        carry = mpc.init_carry()
        for k in range(args.mpc_loops):
            t_tick = time.time()
            carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
            x = np.asarray(carry.x_init)
            q = x[: mpc.form.nq] if mpc.form.name != "centroidal_vel" \
                else x[6:]
            viewer.push(q)
            time.sleep(max(0.0, mpc.dt_min - (time.time() - t_tick)))
        print("Live run done (streamed", args.mpc_loops, "ticks)")
        viewer.close()
        return

    run = jax.jit(lambda: mpc.run(args.mpc_loops, base_vel_des))
    t0 = time.time()
    carry, outs = run()
    jax.block_until_ready(carry.x_init)
    total = time.time() - t0
    print("Total wall (s, incl. compile):", round(total, 2))
    t0 = time.time()
    carry, outs = run()
    jax.block_until_ready(carry.x_init)
    total = time.time() - t0
    print("Avg solve time (ms):", round(total / args.mpc_loops * 1e3, 2))
    v = np.asarray(outs["max_violation"])
    print("Violation median/max:", round(float(np.median(v)), 4),
          round(float(v.max()), 4))
    x = np.asarray(outs["x"])
    print("Final base pos:", x[-1, :3].round(3))
    vx = (x[-1, 0] - x[len(x) // 3, 0]) / ((len(x) - len(x) // 3) * mpc.dt_min)
    print("Tracked vx (m/s):", round(float(vx), 3))

    if args.dump:
        with open(args.dump, "w") as f:
            json.dump({"x": x.tolist(), "dt": mpc.dt_min}, f)
        print("Trajectory dumped to", args.dump)

    if args.viz:
        from tpu_locoman import viz

        q_traj = x[:, : mpc.form.nq] if mpc.form.name != "centroidal_vel" \
            else x[:, 6:]
        scene = viz.dump_scene(
            args.viz + ".json", mpc.form.model, q_traj, mpc.dt_min,
            frame_names=tuple(mpc.form.foot_frames),
        )
        html = viz.write_player_html(args.viz, scene)
        print("3D replay written to", html, "(open in a browser)")


if __name__ == "__main__":
    main()
