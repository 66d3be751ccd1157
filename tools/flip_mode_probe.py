"""A/B the MPC flip_reset modes (False / zero / "aba") on a hot-config
rollout. The "aba" mode seeds flipped nodes' acceleration slots with
forward dynamics so their RNEA rows start each solve at ~zero residual.

Env: FMP_ROBOT (go2), FMP_NODES (8), FMP_TICKS (40), FMP_ADMM (10),
FMP_CORRECTOR (5), FMP_LS (4), FMP_CACHE (/tmp/jax_cache_cpu2).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    # Do NOT consult jax.default_backend() here: it initializes the pinned
    # axon backend and takes the TPU claim for a CPU-only probe.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("FMP_CACHE", "/tmp/jax_cache_cpu2"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from tpu_locoman import Go2, B2G, MPC, SQPConfig, ADMMConfig

    name = os.environ.get("FMP_ROBOT", "go2")
    nodes = int(os.environ.get("FMP_NODES", "8"))
    ticks = int(os.environ.get("FMP_TICKS", "40"))
    admm = int(os.environ.get("FMP_ADMM", "10"))
    corr = int(os.environ.get("FMP_CORRECTOR", "5"))
    ls = int(os.environ.get("FMP_LS", "4"))

    combos = os.environ.get(
        "FMP_MODES", "none,zero,aba,shift,zero+shift").split(",")
    modes = {"none": False, "zero": True, "aba": "aba", "shift": False}
    for combo in combos:
        parts = combo.split("+")
        mode = modes[parts[0]]
        shift = parts[0] == "shift" or "shift" in parts[1:]
        robot = {"go2": Go2, "b2g": B2G}[name]()
        robot.set_gait_sequence("trot", 0.8)
        mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
                  flip_reset=mode, warm_shift=shift,
                  config=SQPConfig(sqp_iters=1, n_trials=ls,
                                   corrector_iters=corr,
                                   admm=ADMMConfig(iters=admm)))
        bvd = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
        step = jax.jit(lambda c, t: mpc.step(c, t, bvd))
        carry = mpc.init_carry()
        viols = []
        for k in range(ticks):
            carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
            viols.append(float(stats["max_violation"]))
        v = np.asarray(viols)
        print(f"{combo:12s} (flip_reset={mode} warm_shift={shift}) "
              f"mean {v.mean():.4f}  median {np.median(v):.4f}  "
              f"worst {v.max():.4f}", flush=True)
        print("   per-tick:", np.round(v, 3).tolist(), flush=True)


if __name__ == "__main__":
    main()
