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

    robot = {"b2g": B2G, "go2": Go2}[os.environ.get("PROBE_ROBOT", "b2g")]()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot,
        dynamics="whole_body_rnea",
        nodes=nodes,
        config=SQPConfig(
            sqp_iters=sqp_iters,
            admm=ADMMConfig(iters=admm_iters, eq_boost=eq_boost, rho=rho),
            admm_schedule=schedule,
        ),
    )
    base_vel_des = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
    carry = mpc.init_carry()
    step = jax.jit(lambda c, t: mpc.step(c, t, base_vel_des))
    print(f"config: sqp={sqp_iters} admm={admm_iters} eq_boost={eq_boost} "
          f"rho={rho} schedule={schedule} nodes={nodes}")
    for k in range(ticks):
        carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
        mv = float(stats["max_violation"])
        print(f"tick {k}: max_violation {mv:.3e} alpha "
              f"{float(stats['alpha']):.3f} status {int(stats['status'])}")
    rep = diagnostics.solve_report(
        mpc, carry, jnp.float32(ticks * mpc.dt_min), base_vel_des, solve=False
    )
    print(rep.pretty())


if __name__ == "__main__":
    main()
