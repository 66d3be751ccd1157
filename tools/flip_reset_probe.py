"""Hypothesis probe: gait-transition spikes come from STALE PRIMAL slots at
nodes whose contact flag flipped between ticks (the carried a/tau/dx of a
node that was swing-optimized is wrong once the node becomes stance, and
one warm-started SQP iteration can't fully repair it).

Runs the hot-config rollout (corrector included) with warm-start REPAIR
strategies applied at flipped (node, foot) pairs before each solve:

  none   vanilla (baseline)
  a      zero the acceleration slots of flipped nodes
  u      reset the whole input block of flipped nodes to u_des
         (a = 0, forces already reset by warm_start_Z, tau = 0)
  dv     'a' + zero the velocity half of dx at flipped nodes

Env: FRP_ROBOT (go2), FRP_NODES (8), FRP_TICKS (40), FRP_SQP (1),
FRP_ADMM (10), FRP_CORRECTOR (5), FRP_LS_TRIALS (4).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rollout(mpc, ticks, strategy):
    import jax
    import jax.numpy as jnp

    form = mpc.form
    ndx = form.ndx
    nv = form.nv
    bvd = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
    step = jax.jit(lambda c, t: mpc.step(c, t, bvd))

    carry = mpc.init_carry()
    prev_contact = mpc.make_stage_params(jnp.float32(0.0)).contact
    viols = []
    for k in range(ticks):
        t = jnp.float32(k * mpc.dt_min)
        if strategy != "none":
            sp = mpc.make_stage_params(t)
            flipped = jnp.any(sp.contact != prev_contact, axis=1)  # (nodes,)
            Z = carry.solver_state.Z
            node_mask = jnp.concatenate(
                [flipped, jnp.zeros(1, dtype=bool)])[:, None]  # (N+1, 1)
            if strategy in ("a", "dv", "u"):
                a_sl = jnp.zeros((Z.shape[0], form.na_opt))
                Z = jnp.where(node_mask, Z.at[:, ndx:ndx + form.na_opt].set(
                    a_sl), Z)
            if strategy == "u":
                tau0 = ndx + form.tau_idx
                Z = jnp.where(
                    node_mask, Z.at[:, tau0:].set(0.0), Z)
            if strategy == "dv":
                Z = jnp.where(
                    node_mask, Z.at[:, nv:ndx].set(0.0), Z)
            carry = carry._replace(
                solver_state=carry.solver_state._replace(Z=Z))
            prev_contact = sp.contact
        carry, stats = step(carry, t)
        viols.append(float(stats["max_violation"]))
    return np.asarray(viols)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu"
                      if jax.default_backend() == "cpu" else "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpu_locoman import Go2, B2G, MPC, SQPConfig, ADMMConfig

    robot_name = os.environ.get("FRP_ROBOT", "go2")
    nodes = int(os.environ.get("FRP_NODES", "8"))
    ticks = int(os.environ.get("FRP_TICKS", "40"))
    sqp_iters = int(os.environ.get("FRP_SQP", "1"))
    admm_iters = int(os.environ.get("FRP_ADMM", "10"))
    corrector = int(os.environ.get("FRP_CORRECTOR", "5"))
    n_trials = int(os.environ.get("FRP_LS_TRIALS", "4"))

    robot = {"go2": Go2, "b2g": B2G}[robot_name]()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=nodes,
              config=SQPConfig(sqp_iters=sqp_iters,
                               corrector_iters=corrector,
                               n_trials=n_trials,
                               admm=ADMMConfig(iters=admm_iters)))

    for strategy in ("none", "a", "u", "dv"):
        v = rollout(mpc, ticks, strategy)
        print(f"{strategy:6s} mean {v.mean():.3f}  median "
              f"{np.median(v):.3f}  worst {v.max():.3f}", flush=True)
        print("   per-tick:", np.round(v, 3).tolist(), flush=True)


if __name__ == "__main__":
    main()
