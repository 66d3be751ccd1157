"""Multi-device scaling benchmark (mechanism validation).

Measures batched-MPC throughput at 1..N devices with the scenario batch
sharded over a ("dp",) mesh — the rebuild's scaling story (SURVEY.md §2.3).
On this single-chip environment it runs on the virtual CPU mesh
(JAX_PLATFORMS handled by --cpu); on a real pod slice the same code measures
ICI scaling.

Prints one JSON line per device count plus a scaling-efficiency summary.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=6)
    ap.add_argument("--admm-iters", type=int, default=25)
    ap.add_argument("--ticks", type=int, default=5)
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scaling")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig
    from tpu_locoman.parallel import (
        make_mesh, shard_batch, batched_step, batched_init,
    )

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot,
        dynamics="whole_body_rnea",
        nodes=args.nodes,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=args.admm_iters)),
    )

    devices = jax.devices()
    counts = [n for n in [1, 2, 4, 8] if n <= len(devices)]
    results = {}
    for n in counts:
        mesh = make_mesh(devices[:n])
        batch = args.batch_per_device * n
        carries = shard_batch(batched_init(mpc, batch), mesh)
        targets = shard_batch(
            jnp.tile(jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32),
                     (batch, 1)),
            mesh,
        )
        step = batched_step(mpc, donate=False)
        carries, _ = step(carries, jnp.float32(0.0), targets)
        np.asarray(jax.device_get(carries.x_init))
        t0 = time.time()
        for k in range(args.ticks):
            carries, _ = step(carries, jnp.float32(0.01 * (k + 1)), targets)
        np.asarray(jax.device_get(carries.x_init))
        dt = time.time() - t0
        sps = batch * args.ticks / dt
        results[n] = sps
        print(json.dumps({
            "metric": "scaling_mpc_solves_per_s",
            "devices": n,
            "value": round(sps, 1),
            "unit": "solves/s",
        }))

    base = results[counts[0]]
    for n in counts[1:]:
        eff = results[n] / (base * n)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "devices": n,
            "value": round(eff, 3),
            "unit": "fraction of linear",
        }))


if __name__ == "__main__":
    main()
