"""Two-process jax.distributed demo: proves initialize() /
host_chip_mesh() / local_batch_slice() end to end on CPU.

Each process owns 2 virtual CPU devices; the (2 hosts x 2 chips) mesh
shards a global scenario batch of MPC instances. Per-scenario solves stay
device-local; the cross-host traffic is the final stat reduction — the
production communication pattern (SURVEY.md §2.3).

Run (one line per "host"):
    python tools/distributed_demo.py --nproc 2 --pid 0 --coord localhost:9876 &
    python tools/distributed_demo.py --nproc 2 --pid 1 --coord localhost:9876
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--coord", default="localhost:9876")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpu_locoman.distributed import (
        initialize,
        host_chip_mesh,
        local_batch_slice,
        warmup_collectives,
    )

    ok = initialize(
        coordinator_address=args.coord,
        num_processes=args.nproc,
        process_id=args.pid,
    )
    assert ok, "initialize() must bootstrap in multi-process mode"
    assert jax.process_count() == args.nproc
    assert jax.device_count() == 2 * args.nproc
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig
    from tpu_locoman.parallel import batched_init

    mesh = host_chip_mesh()
    assert mesh.devices.shape == (args.nproc, 2)
    # Rendezvous the Gloo clique NOW, while both processes are at the same
    # line — the MPC compile below can skew them past the 30 s transport
    # deadline otherwise (see distributed.warmup_collectives).
    warmup_collectives(mesh)

    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(
        robot,
        dynamics="centroidal_acc",
        nodes=3,
        config=SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=3)),
    )

    # Global batch: each process owns its local_batch_slice of scenarios.
    g_batch = args.batch
    sl = local_batch_slice(g_batch)
    assert sl.stop - sl.start == g_batch // args.nproc

    # Per-scenario vx targets, globally defined; each process materializes
    # only its slice.
    vx_all = np.linspace(0.0, 0.2, g_batch).astype(np.float32)
    targets_all = np.zeros((g_batch, 6), dtype=np.float32)
    targets_all[:, 0] = vx_all

    sharding = NamedSharding(mesh, P(("host", "chip")))

    def make_global(arr_local, g_shape):
        return jax.make_array_from_process_local_data(
            sharding, arr_local, g_shape
        )

    carries_local = jax.device_get(
        batched_init(mpc, sl.stop - sl.start)
    )
    carries = jax.tree.map(
        lambda x: make_global(np.asarray(x), (g_batch,) + x.shape[1:]),
        carries_local,
    )
    targets = make_global(targets_all[sl], targets_all.shape)

    def tick(carries, targets):
        c, stats = jax.vmap(
            lambda c_, tg: mpc.step(c_, jnp.float32(0.0), tg)
        )(carries, targets)
        # Cross-host reduction: global mean violation (DCN collective).
        return c, jnp.mean(stats["max_violation"])

    c2, mv_mean = jax.jit(
        tick, out_shardings=(sharding, NamedSharding(mesh, P()))
    )(carries, targets)
    jax.block_until_ready(c2.x_init)
    mv = float(mv_mean)
    assert np.isfinite(mv), mv
    print(f"proc {args.pid}: mesh {mesh.devices.shape}, "
          f"slice {sl.start}:{sl.stop}, global mean violation {mv:.4f}")


if __name__ == "__main__":
    main()
