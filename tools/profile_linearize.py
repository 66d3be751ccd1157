"""Where do linearize's 83 ms/tick go? (round-3 anatomy; round-4 item 1)

Cumulative-composition probes INSIDE Transcription._linearize_split at
the flagship shape: each probe jits the real batched computation up to a
depth and chains `iters` repetitions through a carried reduction so the
relay round trip is paid once, not per iteration.

Depths:
  0 evaluate() only (the value path the line search pays per trial)
  1 dyn vjp forward + pullbacks (Jd)
  2 + vel vjp forward + pullbacks (Jv)
  3 + closed-form rows, cone jac, assembly == full linearize

Env: BENCH_BATCH (512), BENCH_NODES (14), PL_ITERS (10).
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


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    iters = int(os.environ.get("PL_ITERS", "10"))

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
              config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10)))
    t = mpc.trans

    carries = batched_init(mpc, batch)
    targets = jnp.tile(jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32),
                       (batch, 1))
    tc = jnp.float32(0.0)

    def probe(depth):
        def one(carry, target):
            shared = mpc.make_shared(carry.x_init, target,
                                     tau_prev=carry.tau_prev)
            sp = mpc.make_stage_params(tc)
            Z = mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
            if depth == 0:
                g = t.evaluate(Z, sp, shared)
                return jnp.sum(g)
            # replicate _linearize_split's internals at partial depth
            DX = Z[:, : t.ndx]
            U = Z[:-1, t.ndx:]
            basis_d = jnp.asarray(t._basis_dyn)
            basis_v = jnp.asarray(t._basis_vel)

            def stage(dx, u_, sp1):
                acc = jnp.zeros(())
                dyn0, pull_d = jax.vjp(
                    lambda a, b: t._dyn_fn(a, b, sp1, shared), dx, u_)
                Jd = jax.vmap(
                    lambda ct: jnp.concatenate(pull_d(ct)))(basis_d)
                acc = acc + jnp.sum(dyn0) + jnp.sum(Jd)
                if depth >= 2:
                    vb0, pull_v = jax.vjp(
                        lambda a, b: t._vel_box_fn(a, b, sp1, shared),
                        dx, u_)
                    Jv = jax.vmap(
                        lambda ct: jnp.concatenate(pull_v(ct)))(basis_v)
                    acc = acc + jnp.sum(vb0) + jnp.sum(Jv)
                return acc

            sps = mpc.make_stage_params(tc)
            if depth >= 3:
                g, G, B, C = t.linearize(Z, sps, shared)
                return (jnp.sum(g) + jnp.sum(G) + jnp.sum(B) + jnp.sum(C))
            vals = jax.vmap(stage)(DX[:-1], U, sps)
            return jnp.sum(vals)

        def chained(carries, targets):
            acc = jnp.zeros(())
            for k in range(iters):
                acc = acc + jax.vmap(one)(
                    jax.tree.map(
                        lambda x: x + 0 * acc.astype(x.dtype), carries),
                    targets,
                ).sum()
            return acc

        return jax.jit(chained)

    labels = {0: "evaluate only", 1: "dyn vjp+pullbacks",
              2: "+ vel vjp+pullbacks", 3: "full linearize"}
    for depth in (0, 1, 2, 3):
        fn = probe(depth)
        t0 = time.time()
        np.asarray(jax.device_get(fn(carries, targets)))
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_get(fn(carries, targets)))
        dt = (time.time() - t0) / iters
        print(f"depth {depth} {labels[depth]:28s} {1000 * dt:8.2f} ms/iter"
              f"   (compile {compile_s:5.1f} s)", flush=True)


if __name__ == "__main__":
    main()
