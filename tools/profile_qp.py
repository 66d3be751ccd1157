"""Fine-grained QP-stage anatomy (round 4): split assemble from factorize,
and measure one ADMM sweep's parts in context.

Cumulative prefixes like profile_cumulative.py; deltas between consecutive
probes are the in-context stage costs.

Env: BENCH_BATCH, BENCH_NODES, BENCH_ADMM_ITERS, BENCH_FACTORIZER.
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
    print(f"{label:34s} {1000 * dt:8.2f} ms   (compile {compile_s:5.1f} s)",
          flush=True)
    return dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    admm_iters = int(os.environ.get("BENCH_ADMM_ITERS", "10"))
    factorizer = os.environ.get("BENCH_FACTORIZER", "cholinv_pb")

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
              config=SQPConfig(sqp_iters=1, admm=ADMMConfig(
                  iters=admm_iters, factorizer=factorizer)))
    trans = mpc.trans
    cfg = mpc.solver.cfg
    print(f"factorizer={factorizer} s={trans.s} m_dense={trans.m_dense} "
          f"n_box={trans.n_box}", flush=True)

    carries = batched_init(mpc, batch)
    targets = jnp.tile(
        jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32), (batch, 1))
    t = jnp.float32(0.0)

    def prefix(depth):
        def fn(carry, target):
            shared = mpc.make_shared(carry.x_init, target,
                                     tau_prev=carry.tau_prev)
            sp = mpc.make_stage_params(t)
            state = carry.solver_state._replace(
                Z=mpc.warm_start_Z(carry.solver_state.Z, sp, shared))
            Z = state.Z
            g, G, B, C = trans.linearize(Z, sp, shared)
            if depth == 0:
                return g.sum() + G.sum() + B.sum() + C.sum()
            obj = trans.objective_data(shared)
            P_diag = trans.hessian_diag(obj)
            l_b, u_b = trans.bounds(sp, shared)
            l = l_b - g
            u = u_b - g
            rho_vec = jnp.where(u - l < 1e-7, cfg.admm.eq_boost
                                * cfg.admm.rho, cfg.admm.rho)
            with jax.default_matmul_precision(cfg.admm.precision):
                H, U, A, D = qp.assemble_blocks(
                    G, B, C, P_diag, rho_vec, cfg.admm.sigma,
                    box_idx=trans.box_slots)
                if depth == 1:  # + assemble only
                    return H.sum() + U.sum() + A.sum() + D.sum()
                fac = qp.factorize(H, U, chol_impl=factorizer)
                if depth == 2:  # + factorize
                    return fac.Linv.sum() + fac.W.sum() + fac.V.sum()
                work = qp.QPWork(A=A, D=D, fac=fac, rho_vec=rho_vec,
                                 cyclic=False)
                q_g = trans.objective_gradient(Z, obj)
                x, z, y = qp.run_iters(
                    work, q_g, l, u, cfg.admm,
                    jnp.zeros_like(Z), state.z_admm, state.y_admm,
                    depth - 2,  # 1 sweep at depth 3, admm_iters at 4
                    box_idx=trans.box_slots)
                return x.sum() + z.sum() + y.sum()

        return jax.jit(jax.vmap(fn))

    for depth, label in [
        (0, "linearize"),
        (1, "+ assemble"),
        (2, "+ factorize"),
        (3, "+ 1 admm sweep"),
        (2 + admm_iters, f"+ {admm_iters} admm sweeps"),
    ]:
        timeit(prefix(depth), carries, targets, label=label)


if __name__ == "__main__":
    main()
