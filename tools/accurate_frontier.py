"""Sweep the accuracy-vs-effort frontier toward the CHEAPEST config that
holds mean max-violation <= 1e-3 over a rollout (VERDICT round-2 item 3:
price the accurate mode — Fatrop ships 1e-3 at production speed,
reference ocp.py:256-257).

Cost model per MPC tick on TPU (RESULTS.md anatomy, batch 512):
  ~4.5 ms per ADMM sweep, ~60-150 ms per (linearize+factorize), so ADMM
  iterations dominate any config with iters >~50. The sweep therefore
  explores LOW-admm counts propped up by eq-projection passes (a direct
  equality solve per pass) instead of the round-2 brute-force
  sqp6 x admm400.

Run on CPU with a smaller robot for ranking; confirm the winner on the
flagship. Env: AF_ROBOT (go2), AF_NODES (8), AF_TICKS (30), AF_CONFIGS
(semicolon list "sqp,admm,eqproj,corrector,polish_iters").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_CONFIGS = (
    # sqp, admm, eqproj, corrector, polish_iters
    "6,400,2,0,0",   # round-2 golden (known-good reference point)
    "2,100,2,0,0",   # known insufficient on b2g (floor ~1e-2)
    "2,50,3,0,0",
    "3,50,3,0,0",
    "2,100,3,0,0",
    "3,100,3,0,0",
    "2,50,4,0,0",
    "3,150,2,0,0",
    "4,200,2,0,0",
)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/jax_cache_cpu" if jax.default_backend() == "cpu"
        else "/tmp/jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from tpu_locoman import Go2, B2G, MPC, SQPConfig, ADMMConfig

    robot_name = os.environ.get("AF_ROBOT", "go2")
    nodes = int(os.environ.get("AF_NODES", "8"))
    ticks = int(os.environ.get("AF_TICKS", "30"))
    configs = os.environ.get("AF_CONFIGS", ";".join(DEFAULT_CONFIGS))

    bvd = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
    results = []
    for spec in configs.split(";"):
        sqp_i, admm_i, eqp, corr, pol = (int(x) for x in spec.split(","))
        robot = {"go2": Go2, "b2g": B2G}[robot_name]()
        robot.set_gait_sequence("trot", 0.8)
        mpc = MPC(
            robot, dynamics="whole_body_rnea", nodes=nodes,
            config=SQPConfig(
                sqp_iters=sqp_i,
                admm=ADMMConfig(iters=admm_i, polish_iters=pol),
                eq_projection=eqp, corrector_iters=corr,
            ),
        )
        step = jax.jit(lambda c, t, _m=mpc: _m.step(c, t, bvd))
        carry = mpc.init_carry()
        t0 = time.time()
        viols = []
        for k in range(ticks):
            carry, stats = step(carry, jnp.float32(k * mpc.dt_min))
            viols.append(float(stats["max_violation"]))
        v = np.asarray(viols)
        # TPU tick-cost estimate (ms, batch 512; RESULTS.md anatomy with
        # the pallas factorizer assumption factorize~10ms)
        est = sqp_i * (48 + 10 + 23 + admm_i * 4.5) + eqp * (48 + 10) \
            + corr * 4.5 + pol * 4.5
        results.append((spec, v.mean(), np.median(v), v.max(), est,
                        time.time() - t0))
        print(f"cfg sqp={sqp_i:d} admm={admm_i:3d} eqproj={eqp} "
              f"corr={corr:2d} polish={pol:3d} | mean {v.mean():.2e} "
              f"median {np.median(v):.2e} worst {v.max():.2e} | "
              f"est_tpu {est:6.0f} ms/tick | wall {time.time() - t0:5.1f}s",
              flush=True)

    ok = [r for r in results if r[1] <= 1e-3]
    if ok:
        best = min(ok, key=lambda r: r[4])
        print(f"\ncheapest config holding mean <=1e-3: {best[0]} "
              f"(est {best[4]:.0f} ms/tick)")
    else:
        print("\nno swept config holds mean <=1e-3")


if __name__ == "__main__":
    main()
