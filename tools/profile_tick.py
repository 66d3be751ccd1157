"""Per-phase timing of the flagship MPC tick on real hardware.

Times, each as its own jitted program at the bench batch size:
  - linearize: vmapped stage jacobians (the CasADi jacobian(g,x) analog)
  - admm: the fixed-count ADMM QP on frozen problem data
  - merit: the line-search merit evaluations (n_trials residual passes)
  - tick: the full batched MPC step (bench.py's unit of work)

Timings bracket a host device_get round trip (block_until_ready is not a
reliable barrier over the axon relay — CLAUDE.md).
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
from tpu_locoman.parallel import batched_init, batched_step
from tpu_locoman.solver.qp import admm_solve


def timeit(fn, *args, iters=10, label=""):
    tc = time.time()
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))  # compile barrier
    compile_s = time.time() - tc
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters
    print(f"{label:12s} {1000 * dt:8.2f} ms   (compile {compile_s:6.1f} s)")
    return dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    admm_iters = int(os.environ.get("BENCH_ADMM_ITERS", "10"))
    factorizer = os.environ.get("BENCH_FACTORIZER", "sequential")
    matvec_dtype = os.environ.get("BENCH_MATVEC_DTYPE", "float32")

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot,
        dynamics=os.environ.get("BENCH_DYNAMICS", "whole_body_rnea"),
        nodes=nodes,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(
            iters=admm_iters, factorizer=factorizer,
            matvec_dtype=matvec_dtype)),
    )
    trans = mpc.trans
    solver = mpc.solver

    carries = batched_init(mpc, batch)
    targets = jnp.tile(
        jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32), (batch, 1)
    )

    # Advance a few ticks so the iterate is a realistic warm start.
    step = batched_step(mpc, donate=False)
    for k in range(3):
        carries, _ = step(carries, jnp.float32(k * mpc.dt_min), targets)
    np.asarray(jax.device_get(carries.x_init))

    t = jnp.float32(3 * mpc.dt_min)

    def make_problem(carry, target):
        shared = mpc.make_shared(carry.x_init, target, tau_prev=carry.tau_prev)
        sp = mpc.make_stage_params(t)
        return shared, sp

    def lin_only(carry, target):
        shared, sp = make_problem(carry, target)
        with jax.default_matmul_precision("highest"):
            return trans.linearize(carry.solver_state.Z, sp, shared)

    def eval_only(carry, target):
        shared, sp = make_problem(carry, target)
        return trans.evaluate(carry.solver_state.Z, sp, shared)

    def merit_only(carry, target):
        shared, sp = make_problem(carry, target)
        Z = carry.solver_state.Z
        obj = trans.objective_data(shared)
        l_b, u_b = trans.bounds(sp, shared)
        g = trans.evaluate(Z, sp, shared)
        d = 0.01 * jnp.ones_like(Z)
        return solver._line_search(Z, d, obj, sp, shared, l_b, u_b, g)

    lin_b = jax.jit(jax.vmap(lin_only))
    eval_b = jax.jit(jax.vmap(eval_only))
    merit_b = jax.jit(jax.vmap(merit_only))

    # Frozen QP data for the admm-only timing.
    g, G, B, C = jax.device_get(lin_b(carries, targets))

    def qp_data(carry, target):
        shared, sp = make_problem(carry, target)
        obj = trans.objective_data(shared)
        P_diag = trans.hessian_diag(obj)
        q = trans.objective_gradient(carry.solver_state.Z, obj)
        l_b, u_b = trans.bounds(sp, shared)
        return P_diag, q, l_b, u_b

    P_diag, q, l_b, u_b = jax.device_get(jax.jit(jax.vmap(qp_data))(carries, targets))
    G = jnp.asarray(G); B = jnp.asarray(B); C = jnp.asarray(C)
    g = jnp.asarray(g)
    l = jnp.asarray(l_b) - g
    u = jnp.asarray(u_b) - g
    P_diag = jnp.asarray(P_diag); q = jnp.asarray(q)

    cfg = solver.cfg.admm

    def admm_only(G, B, C, P_diag, q, l, u):
        return admm_solve(G, B, C, P_diag, q, l, u, cfg,
                          box_idx=trans.box_slots)

    admm_b = jax.jit(jax.vmap(admm_only, in_axes=(0,) * 7))

    # Factorize-only (iters=0 still builds + factorizes M).
    cfg0 = cfg._replace(iters=0)

    def fac_only(G, B, C, P_diag, q, l, u):
        return admm_solve(G, B, C, P_diag, q, l, u, cfg0,
                          box_idx=trans.box_slots)

    fac_b = jax.jit(jax.vmap(fac_only, in_axes=(0,) * 7))

    # Per-iteration slope: admm at 2x the iteration count.
    cfg2 = cfg._replace(iters=2 * cfg.iters)

    def admm_2x(G, B, C, P_diag, q, l, u):
        return admm_solve(G, B, C, P_diag, q, l, u, cfg2,
                          box_idx=trans.box_slots)

    admm_2x_b = jax.jit(jax.vmap(admm_2x, in_axes=(0,) * 7))

    print(f"batch={batch} nodes={nodes} admm_iters={admm_iters} "
          f"factorizer={cfg.factorizer} matvec={cfg.matvec_dtype}")
    timeit(eval_b, carries, targets, label="evaluate")
    if trans.split_ok:
        timeit(lin_b, carries, targets, label="lin_split")
        trans.split_ok = False
        lin_full = jax.jit(jax.vmap(lin_only))
        timeit(lin_full, carries, targets, label="lin_full")
        trans.split_ok = True
    else:
        timeit(lin_b, carries, targets, label="linearize")
    timeit(merit_b, carries, targets, label="line_search")
    timeit(fac_b, G, B, C, P_diag, q, l, u, label="assemble+fac")
    timeit(admm_b, G, B, C, P_diag, q, l, u, label="admm_total")
    timeit(admm_2x_b, G, B, C, P_diag, q, l, u, label="admm_2x")
    timeit(step, carries, t, targets, label="full_tick")


if __name__ == "__main__":
    main()
