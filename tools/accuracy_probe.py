"""Probe solver accuracy vs effort on the flagship config (B2G
whole_body_rnea trot N=14) — maps the (sqp_iters x admm_iters x options) ->
max-violation frontier toward the Fatrop tolerance 1e-3
(/root/reference/optimization/ocp.py:256-257).

Env knobs: PROBE_SQP, PROBE_ADMM, PROBE_EQ_BOOST, PROBE_RHO, PROBE_TICKS,
PROBE_NODES, PROBE_ROBOT, PROBE_REFINE, PROBE_SCHEDULE (comma ints).
Prints per-tick max violation and a final violation-by-row-group report.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/jax_cache" if jax.default_backend() != "cpu" else "/tmp/jax_cache_cpu",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from tpu_locoman import B2G, Go2, MPC, SQPConfig, ADMMConfig
    from tpu_locoman import diagnostics

    sqp_iters = int(os.environ.get("PROBE_SQP", "6"))
    admm_iters = int(os.environ.get("PROBE_ADMM", "400"))
    eq_boost = float(os.environ.get("PROBE_EQ_BOOST", "1e3"))
    rho = float(os.environ.get("PROBE_RHO", "2e-2"))
    ticks = int(os.environ.get("PROBE_TICKS", "8"))
    nodes = int(os.environ.get("PROBE_NODES", "14"))
    sched = os.environ.get("PROBE_SCHEDULE", "")
    schedule = tuple(int(x) for x in sched.split(",")) if sched else None
    polish_iters = int(os.environ.get("PROBE_POLISH_ITERS", "0"))
    polish_boost = float(os.environ.get("PROBE_POLISH_BOOST", "100"))
    line_search = os.environ.get("PROBE_LS", "1") == "1"
    corrector = int(os.environ.get("PROBE_CORRECTOR", "0"))
    scaling = int(os.environ.get("PROBE_SCALING", "0"))
    kkt = os.environ.get("PROBE_KKT", "0") == "1"
    eqproj = int(os.environ.get("PROBE_EQPROJ", "0"))
    n_trials = int(os.environ.get("PROBE_LS_TRIALS", "8"))
    factorizer = os.environ.get("PROBE_FACTORIZER", "sequential")

    robot = {"b2g": B2G, "go2": Go2}[os.environ.get("PROBE_ROBOT", "b2g")]()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot,
        dynamics="whole_body_rnea",
        nodes=nodes,
        config=SQPConfig(
            sqp_iters=sqp_iters,
            admm=ADMMConfig(iters=admm_iters, eq_boost=eq_boost, rho=rho,
                            polish_iters=polish_iters,
                            polish_boost=polish_boost,
                            scaling_iters=scaling,
                            factorizer=factorizer),
            admm_schedule=schedule,
            line_search=line_search,
            corrector_iters=corrector,
            kkt_polish=kkt,
            eq_projection=eqproj,
            n_trials=n_trials,
        ),
    )
    base_vel_des = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
    carry = mpc.init_carry()
    step = jax.jit(lambda c, t: mpc.step(c, t, base_vel_des))
    print(f"config: sqp={sqp_iters} admm={admm_iters} eq_boost={eq_boost} "
          f"rho={rho} schedule={schedule} nodes={nodes} "
          f"polish={polish_iters}x{polish_boost} ls={line_search} "
          f"corrector={corrector} scaling={scaling} kkt={kkt} "
          f"eqproj={eqproj}")
    x_prev = carry.x_init
    tau_prev_last = carry.tau_prev
    for k in range(ticks):
        x_prev = carry.x_init
        tau_prev_last = carry.tau_prev
        carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
        mv = float(stats["max_violation"])
        print(f"tick {k}: max_violation {mv:.3e} alpha "
              f"{float(stats['alpha']):.3f} status {int(stats['status'])}")
    # Report at the LAST solved tick's parameters (the carry's Z is the
    # optimizer of that tick; evaluating at tick+1 would just show the
    # warm-start shift residual). x_init must be the pre-advance state, so
    # re-evaluate through the transcription directly.
    t_last = jnp.float32((ticks - 1) * mpc.dt_min)
    shared = mpc.make_shared(x_prev, base_vel_des, tau_prev=tau_prev_last)
    sp = mpc.make_stage_params(t_last)
    g = mpc.trans.evaluate(carry.solver_state.Z, sp, shared)
    l, u = mpc.trans.bounds(sp, shared)
    viol = np.asarray(jnp.maximum(0, l - g) + jnp.maximum(0, g - u))
    groups = diagnostics.row_group_layout(mpc.trans)
    print("violation by row group (last solved tick):")
    for name, a, b in sorted(groups, key=lambda g_: -viol[:, g_[1]:g_[2]].max()
                             if g_[2] > g_[1] else 0):
        if b > a:
            print(f"  {name:24s} {viol[:, a:b].max():.6f}")

    save = os.environ.get("PROBE_SAVE")
    if save:
        # Save the solved iterate + tick parameters for the float64
        # re-evaluation (tools/verify_f64.py): the f32 residual evaluation
        # itself has a ~1e-3 noise floor on the RNEA rows, so the
        # Fatrop-tolerance claim must be checked in f64.
        np.savez(
            save,
            Z=np.asarray(carry.solver_state.Z),
            x_init=np.asarray(x_prev),
            tau_prev=np.asarray(tau_prev_last),
            t=float(t_last),
            base_vel_des=np.asarray(base_vel_des),
            robot=os.environ.get("PROBE_ROBOT", "b2g"),
            nodes=nodes,
        )
        print("iterate saved to", save)


if __name__ == "__main__":
    main()
