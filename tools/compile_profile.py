"""Where does the flagship's cold compile go? (VERDICT round-2 weak #5)

Times jax trace+lower vs XLA compile for the full batched MPC step and for
its pieces (linearize, assemble+factorize, ADMM sweeps, line search) so
jit-unit splits target the dominant piece. Run on CPU or TPU:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/compile_profile.py

Env knobs: CP_BATCH (default 8), CP_NODES (14), CP_SQP (1), CP_ADMM (10),
CP_FACTORIZER (sequential).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(name, fn, *args):
    t0 = time.time()
    lowered = jax_jit_cache[name].lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    hlo_lines = lowered.as_text().count("\n")
    print(f"{name:28s} lower {t_lower:7.2f}s  compile {t_compile:7.2f}s  "
          f"stablehlo_lines {hlo_lines}", flush=True)
    return compiled


jax_jit_cache = {}


def main():
    import jax

    # No persistent cache: we are measuring the true cold compile.
    import jax.numpy as jnp

    from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig
    from tpu_locoman.parallel import batched_step, batched_init

    batch = int(os.environ.get("CP_BATCH", "8"))
    nodes = int(os.environ.get("CP_NODES", "14"))
    sqp_iters = int(os.environ.get("CP_SQP", "1"))
    admm_iters = int(os.environ.get("CP_ADMM", "10"))
    factorizer = os.environ.get("CP_FACTORIZER", "sequential")

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot, dynamics="whole_body_rnea", nodes=nodes,
        config=SQPConfig(sqp_iters=sqp_iters,
                         admm=ADMMConfig(iters=admm_iters,
                                         factorizer=factorizer)),
    )

    t = jnp.float32(0.0)
    carry = mpc.init_carry()
    shared = mpc.make_shared(carry.x_init, jnp.zeros(6),
                             tau_prev=carry.tau_prev)
    sp = mpc.make_stage_params(t)
    trans = mpc.trans
    Z = carry.solver_state.Z

    # --- pieces ---
    jax_jit_cache["linearize"] = jax.jit(
        lambda Z, sp, shared: trans.linearize(Z, sp, shared))
    timed("linearize", jax_jit_cache["linearize"], Z, sp, shared)

    jax_jit_cache["evaluate"] = jax.jit(
        lambda Z, sp, shared: trans.evaluate(Z, sp, shared))
    timed("evaluate", jax_jit_cache["evaluate"], Z, sp, shared)

    from tpu_locoman.solver import qp

    g, G, B, C = trans.linearize(Z, sp, shared)
    l_b, u_b = trans.bounds(sp, shared)
    obj = trans.objective_data(shared)
    P_diag = trans.hessian_diag(obj)

    cfg = ADMMConfig(iters=admm_iters, factorizer=factorizer)
    jax_jit_cache["prepare(factorize)"] = jax.jit(
        lambda G, B, C, P: qp.prepare(G, B, C, P, l_b - g, u_b - g, cfg,
                                      box_idx=trans.box_slots))
    timed("prepare(factorize)", jax_jit_cache["prepare(factorize)"],
          G, B, C, P_diag)

    work = qp.prepare(G, B, C, P_diag, l_b - g, u_b - g, cfg,
                      box_idx=trans.box_slots)
    qz = jnp.zeros_like(Z)
    # work is a closure (its .cyclic flag is a python-level static)
    jax_jit_cache["run_iters(sweeps)"] = jax.jit(
        lambda q: qp.run_iters(
            work, q, l_b - g, u_b - g, cfg,
            jnp.zeros_like(Z), jnp.zeros_like(l_b), jnp.zeros_like(l_b),
            cfg.iters, box_idx=trans.box_slots))
    timed("run_iters(sweeps)", jax_jit_cache["run_iters(sweeps)"], qz)

    # --- single-scenario full step ---
    jax_jit_cache["mpc.step(single)"] = jax.jit(
        lambda c, t: mpc.step(c, t, jnp.zeros(6)))
    timed("mpc.step(single)", jax_jit_cache["mpc.step(single)"], carry, t)

    # --- batched full step (the bench unit) ---
    carries = batched_init(mpc, batch)
    targets = jnp.zeros((batch, 6), dtype=jnp.float32)
    sfn = batched_step(mpc, donate=False)
    t0 = time.time()
    sfn(carries, t, targets)[0].x_init.block_until_ready()
    print(f"{'batched_step(end-to-end)':28s} total "
          f"{time.time() - t0:7.2f}s (trace+compile+run)", flush=True)


if __name__ == "__main__":
    main()
