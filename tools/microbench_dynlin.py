"""A/B the dyn-row linearization strategies on the flagship shape.

Round-4 item 1: profile_linearize shows the dyn vjp at ~71 ms of the
~90 ms linearize (TPU, batch 512 x N14). Round-2 anatomy had linearize
at 48 ms BEFORE rnea_ad (analytic derivatives) replaced plain AD
pullbacks — the analytic einsums (dims 6/19/24) pad badly onto TPU
8x128 tiles. This tool measures, at the real stage shapes:

  ad       current: vjp of _dyn_fn with rnea_ad (rnea_derivatives once
           + 18 matvec pullbacks)
  plain    vjp of _dyn_fn with plain rnea (18 reverse sweeps of the
           unrolled local-frame recursion)
  wf       vjp with rnea_wf (masked-einsum world-frame forward)
  derivs   rnea_derivatives alone (the JVP-rule forward cost)
  rnea     rnea forward alone

Env: BENCH_BATCH (512), BENCH_NODES (14), MB_ITERS (10),
MB_MODES (comma list, default all).
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
from tpu_locoman import rbda
from tpu_locoman.parallel import batched_init


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    iters = int(os.environ.get("MB_ITERS", "10"))
    modes = os.environ.get(
        "MB_MODES", "rnea,derivs,ad,plain,wf").split(",")

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
              config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10)))
    t = mpc.trans
    form = mpc.form

    carries = batched_init(mpc, batch)
    targets = jnp.tile(jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32),
                       (batch, 1))
    tc = jnp.float32(0.0)
    basis_d = jnp.asarray(t._basis_dyn)

    ee = tuple(form.ee_frames)

    def dyn_fn_with(rnea_impl, dx, u_, sp, shared):
        """_dyn_fn semantics with a pluggable torque kernel."""
        dxm = dx * sp.node0_mask
        d = form.decode(shared.x_init, dxm, u_)
        a = d["a"]
        r_q = (dx * sp.node0_mask * 0.0)  # placeholder, rebuilt below
        # replicate WholeBodyRNEA.dyn_residual at dx_next = 0
        nv = form.nv
        dxn = jnp.zeros(form.ndx)
        r_q = dxn[:nv] - (dxm[:nv] + d["v"] * sp.dt)
        r_v = dxn[nv:] - (dxm[nv:] + a * sp.dt)
        tau = rnea_impl(d["q"], d["v"], a, d["forces"])
        return jnp.concatenate(
            [r_q, r_v, tau[:6], sp.tau_mask * (tau[6:] - d["tau_j"])])

    impls = {
        "ad": lambda q, v, a, f: rbda.rnea_ad(form.model, q, v, a, ee, f),
        "plain": lambda q, v, a, f: rbda.rnea(form.model, q, v, a, ee, f),
        "wf": lambda q, v, a, f: rbda.rnea_wf(form.model, q, v, a, ee, f),
    }

    def probe(mode):
        def one(carry, target):
            shared = mpc.make_shared(carry.x_init, target,
                                     tau_prev=carry.tau_prev)
            sp = mpc.make_stage_params(tc)
            Z = mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
            DX = Z[:, : t.ndx]
            U = Z[:-1, t.ndx:]

            if mode in ("rnea", "derivs"):
                def stage(dx, u_, sp1):
                    dxm = dx * sp1.node0_mask
                    d = form.decode(shared.x_init, dxm, u_)
                    if mode == "rnea":
                        tau = rbda.rnea(form.model, d["q"], d["v"],
                                        d["a"], ee, d["forces"])
                        return jnp.sum(tau)
                    outs = rbda.rnea_derivatives(
                        form.model, d["q"], d["v"], d["a"], ee,
                        d["forces"])
                    return sum(jnp.sum(o) for o in outs if o is not None)
            else:
                impl = impls[mode]

                def stage(dx, u_, sp1):
                    dyn0, pull = jax.vjp(
                        lambda a, b: dyn_fn_with(impl, a, b, sp1, shared),
                        dx, u_)
                    Jd = jax.vmap(
                        lambda ct: jnp.concatenate(pull(ct)))(basis_d)
                    return jnp.sum(dyn0) + jnp.sum(Jd)

            sps = mpc.make_stage_params(tc)
            return jnp.sum(jax.vmap(stage)(DX[:-1], U, sps))

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

    for mode in modes:
        fn = probe(mode)
        t0 = time.time()
        np.asarray(jax.device_get(fn(carries, targets)))
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_get(fn(carries, targets)))
        dt = (time.time() - t0) / iters
        print(f"{mode:8s} {1000 * dt:8.2f} ms/iter   "
              f"(compile {compile_s:5.1f} s)", flush=True)


if __name__ == "__main__":
    main()
