"""Quality A/B of the bf16 ADMM storage knobs (matvec_dtype/factor_dtype)
on a hot-config rollout: violation mean/worst over DTP_TICKS ticks.

The round-1 bf16 rejection (viol 445) predates the consistent rounding in
qp.prepare (G/B/C rounded BEFORE assembly); this probe re-prices the knob.

Env: DTP_ROBOT (b2g), DTP_NODES (14), DTP_TICKS (30), DTP_ADMM (10),
DTP_CORRECTOR (5), DTP_LS (4), DTP_COMBOS (comma list like
"f32/f32,bf16/f32,bf16/bf16,f32/bf16").
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from tpu_locoman import MPC, SQPConfig, ADMMConfig
    from tpu_locoman.robots import Go2, B2, B2G

    get_robot = {"go2": Go2, "b2": B2, "b2g": B2G}.__getitem__

    name = os.environ.get("DTP_ROBOT", "b2g")
    nodes = int(os.environ.get("DTP_NODES", "14"))
    ticks = int(os.environ.get("DTP_TICKS", "30"))
    admm = int(os.environ.get("DTP_ADMM", "10"))
    corr = int(os.environ.get("DTP_CORRECTOR", "5"))
    ls = int(os.environ.get("DTP_LS", "4"))
    combos = os.environ.get(
        "DTP_COMBOS", "f32/f32,bf16/f32,bf16/bf16,f32/bf16").split(",")

    names = {"f32": "float32", "bf16": "bfloat16"}
    for combo in combos:
        mv, fd = combo.split("/")
        robot = get_robot(name)()
        robot.set_gait_sequence("trot", 0.8)
        mpc = MPC(
            robot, dynamics="whole_body_rnea", nodes=nodes, flip_reset=True,
            config=SQPConfig(
                sqp_iters=1, n_trials=ls, corrector_iters=corr,
                admm=ADMMConfig(iters=admm, matvec_dtype=names[mv],
                                factor_dtype=names[fd])))
        bvd = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
        step = jax.jit(lambda c, t: mpc.step(c, t, bvd))
        carry = mpc.init_carry()
        viols = []
        for k in range(ticks):
            carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
            viols.append(float(stats["max_violation"]))
        v = np.asarray(viols)
        print(f"{combo:12s} viol mean {v.mean():.4g}  worst {v.max():.4g}  "
              f"last5 {v[-5:].round(4)}", flush=True)


if __name__ == "__main__":
    main()
