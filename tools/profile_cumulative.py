"""Cumulative-composition profile of the MPC tick.

tools/profile_tick.py times each stage as its OWN jit with captured
inputs; those numbers do not add up to the end-to-end tick (bench.py
admm-iteration sweeps show a ~179 ms intercept where the standalone
stages sum to ~84 ms). This tool times nested prefixes of the REAL
composition — each probe jit starts from the same carries and includes
one more stage — so the cost of each stage IN CONTEXT is the delta
between consecutive probes. Reductions force materialization without
changing layouts.

Env: BENCH_BATCH, BENCH_NODES, BENCH_ADMM_ITERS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig
from tpu_locoman.parallel import batched_init
from tpu_locoman.solver import qp


def timeit(fn, *args, iters=10, label=""):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {1000 * dt:8.2f} ms   (compile {compile_s:5.1f} s)",
          flush=True)
    return dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    admm_iters = int(os.environ.get("BENCH_ADMM_ITERS", "10"))
    factorizer = os.environ.get("BENCH_FACTORIZER", "sequential")

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    dynamics = os.environ.get("BENCH_DYNAMICS", "whole_body_rnea")
    mpc = MPC(
        robot,
        dynamics=dynamics,
        nodes=nodes,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(
            iters=admm_iters, factorizer=factorizer)),
    )
    print(f"factorizer={factorizer} dynamics={dynamics}", flush=True)
    trans = mpc.trans
    cfg = mpc.solver.cfg

    carries = batched_init(mpc, batch)
    targets = jnp.tile(
        jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32), (batch, 1)
    )
    t = jnp.float32(0.0)

    def prefix(depth):
        """One scenario's tick prefix; depth selects how far to go."""

        def fn(carry, target):
            shared = mpc.make_shared(carry.x_init, target,
                                     tau_prev=carry.tau_prev)
            sp = mpc.make_stage_params(t)
            state = carry.solver_state._replace(
                Z=mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
            )
            Z = state.Z
            if depth == 0:  # warm start only
                return Z.sum()
            g, G, B, C = trans.linearize(Z, sp, shared)
            if depth == 1:  # + values/jacobians
                return g.sum() + G.sum() + B.sum() + C.sum()
            obj = trans.objective_data(shared)
            P_diag = trans.hessian_diag(obj)
            l_b, u_b = trans.bounds(sp, shared)
            l = l_b - g
            u = u_b - g
            rho_vec = jnp.where(u - l < 1e-7, cfg.admm.eq_boost
                                * cfg.admm.rho, cfg.admm.rho)
            with jax.default_matmul_precision(cfg.admm.precision):
                work = qp.prepare(G, B, C, P_diag, l, u, cfg.admm,
                                  box_idx=trans.box_slots, rho_vec=rho_vec)
                if depth == 2:  # + assemble + factorize
                    return work.fac.Linv.sum() + work.fac.W.sum()
                q_g = trans.objective_gradient(Z, obj)
                x, z, y = qp.run_iters(
                    work, q_g, l, u, cfg.admm,
                    jnp.zeros_like(Z), state.z_admm, state.y_admm,
                    cfg.admm.iters, box_idx=trans.box_slots,
                )
            if depth == 3:  # + ADMM sweeps
                return x.sum() + z.sum() + y.sum()
            Znew, alpha, max_viol = mpc.solver._line_search(
                Z, x, obj, sp, shared, l_b, u_b, g
            )
            return Znew.sum() + max_viol  # depth 4: + line search

        return jax.jit(jax.vmap(fn))

    for depth, label in [
        (0, "warm start"),
        (1, "+ linearize (g,G,B,C)"),
        (2, "+ assemble/factorize"),
        (3, f"+ {admm_iters} admm sweeps"),
        (4, "+ line search"),
    ]:
        timeit(prefix(depth), carries, targets, label=label)

    step = jax.jit(jax.vmap(lambda c, tg: mpc.step(c, t, tg)))
    timeit(step, carries, targets, label="full step (ref)")


if __name__ == "__main__":
    main()
