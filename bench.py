"""Benchmark: batched MPC solves/s/chip on the flagship configuration.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the north-star
target is >= 10k batched MPC solves/s on one v5p host (~4 chips), i.e.
2500 solves/s/chip. vs_baseline = solves_per_s_per_chip / 2500.

Config mirrors the reference operating point (run_mpc.py:13-19): B2G,
whole_body_rnea, trot 0.8 s, N=14, dt 0.01->0.08.
"""

import json
import os
import subprocess
import sys
import time


def _wait_for_tpu():
    """Block until the axon TPU backend initializes (or a deadline passes).

    Rounds 2 and 4 both ended with the driver's bench run failing rc=1 on
    "Unable to initialize backend 'axon'" during a transient pool outage,
    discarding an entire round's verified performance. Backend-init failure
    is sticky in-process (xla_bridge caches it), so probe in a fresh
    subprocess and only proceed in THIS process once a probe succeeds.

    The probe only ENUMERATES devices (no compute/compile is dispatched),
    so timing out and killing the probe subprocess does not abandon an
    in-flight compile/execute — the kill-mid-work wedge mode (CLAUDE.md)
    needs a compute lease the probe never takes. Enumeration also fails
    fast during a pool outage (the observed round-2/4 failure mode);
    note it can still SUCCEED on a wedged-but-enumerable device, in
    which case the bench itself hangs honestly afterwards.

    Controlled by BENCH_TPU_WAIT_S (default 1800 s; <= 0 disables the
    guard entirely — no probe is spawned). After the deadline we proceed
    anyway so the real error surfaces honestly.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() in ("cpu",):
        return
    wait_s = float(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    if wait_s <= 0:
        return
    deadline = time.time() + wait_s
    probe = "import jax; jax.devices()[0]"
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=120,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                print(f"bench: TPU backend up after {attempt} probes",
                      file=sys.stderr)
            return
        remaining = deadline - time.time()
        if remaining <= 0:
            print("bench: TPU wait deadline passed; proceeding anyway",
                  file=sys.stderr)
            return
        print(f"bench: TPU backend unavailable (probe {attempt}); "
              f"retrying for {int(remaining)}s more", file=sys.stderr)
        time.sleep(min(60.0, max(1.0, remaining)))


def main():
    _wait_for_tpu()
    import jax

    # Persistent compilation cache: bench reruns skip the (minutes-long)
    # XLA compile of the full MPC program.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # TPU matmuls default to bf16; the KKT solve needs f32 accumulate.
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("BENCH_MATMUL_PRECISION", "highest"),
    )
    import jax.numpy as jnp
    import numpy as np

    from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig
    from tpu_locoman.parallel import batched_step, batched_init

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    nodes = int(os.environ.get("BENCH_NODES", "14"))
    admm_iters = int(os.environ.get("BENCH_ADMM_ITERS", "10"))
    sqp_iters = int(os.environ.get("BENCH_SQP_ITERS", "1"))
    timed_ticks = int(os.environ.get("BENCH_TICKS", "10"))
    qp_precision = os.environ.get("BENCH_QP_PRECISION", "highest")
    factorizer = os.environ.get("BENCH_FACTORIZER", "sequential")
    matvec_dtype = os.environ.get("BENCH_MATVEC_DTYPE", "float32")
    factor_dtype = os.environ.get("BENCH_FACTOR_DTYPE", "float32")
    chol_base = int(os.environ.get("BENCH_CHOL_BASE", "16"))
    asm_precision = os.environ.get("BENCH_ASM_PRECISION", "highest")
    dynamics = os.environ.get("BENCH_DYNAMICS", "whole_body_rnea")
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    ls_trials = int(os.environ.get("BENCH_LS_TRIALS", "8"))
    line_search = os.environ.get("BENCH_LINE_SEARCH", "1") == "1"
    corrector = int(os.environ.get("BENCH_CORRECTOR", "0"))
    eqproj = int(os.environ.get("BENCH_EQPROJ", "0"))
    flip_reset = os.environ.get("BENCH_FLIP_RESET", "1") == "1"
    warm_shift = os.environ.get("BENCH_WARM_SHIFT", "0") == "1"
    # On-device scan rollout (mpc.run): amortizes the per-call host round
    # trip (dominant over the axon tunnel at batch 1), so scan_ms_per_tick
    # is the honest on-robot per-tick latency vs the reference's ~10 ms
    # single-scenario budget (BASELINE.md; ref ocp.py:256-263 solve loop).
    scan_ticks = int(os.environ.get("BENCH_SCAN_TICKS", "0"))

    # Hardware-validated shipping defaults: tools/adjudicate_battery.py
    # writes SHIPPING.json only from a passing real-TPU battery (the
    # "flip defaults only on a real-TPU pass" rule). Env vars override;
    # no file = the in-code defaults above.
    ship_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "SHIPPING.json")
    if os.path.exists(ship_path):
        with open(ship_path) as f:
            ship = json.load(f).get("bench_defaults", {})
        if "BENCH_FACTORIZER" not in os.environ:
            factorizer = str(ship.get("factorizer", factorizer))
        if "BENCH_LS_TRIALS" not in os.environ:
            ls_trials = int(ship.get("ls_trials", ls_trials))
        if "BENCH_CORRECTOR" not in os.environ:
            corrector = int(ship.get("corrector", corrector))
        if "BENCH_ADMM_ITERS" not in os.environ:
            admm_iters = int(ship.get("admm_iters", admm_iters))
        if "BENCH_WARM_SHIFT" not in os.environ:
            warm_shift = bool(ship.get("warm_shift", warm_shift))

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot,
        dynamics=dynamics,
        nodes=nodes,
        flip_reset=flip_reset,
        warm_shift=warm_shift,
        config=SQPConfig(
            sqp_iters=sqp_iters,
            n_trials=ls_trials,
            line_search=line_search,
            corrector_iters=corrector,
            eq_projection=eqproj,
            admm=ADMMConfig(iters=admm_iters, precision=qp_precision,
                            factorizer=factorizer,
                            matvec_dtype=matvec_dtype,
                            factor_dtype=factor_dtype,
                            chol_base=chol_base,
                            assemble_precision=asm_precision),
        ),
    )

    carries = batched_init(mpc, batch)
    targets = jnp.tile(
        jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32), (batch, 1)
    )
    step = batched_step(mpc, donate=donate)

    # Warmup (compile + 2 ticks). NOTE: block_until_ready is not reliable
    # over the remote-TPU relay; a host device_get is the only trustworthy
    # completion barrier, so timings bracket a full host round trip.
    t0 = time.time()
    carries, _ = step(carries, jnp.float32(0.0), targets)
    np.asarray(jax.device_get(carries.x_init))
    compile_s = time.time() - t0
    carries, _ = step(carries, jnp.float32(0.01), targets)
    np.asarray(jax.device_get(carries.x_init))

    t0 = time.time()
    for k in range(timed_ticks):
        carries, stats = step(
            carries, jnp.float32((k + 2) * mpc.dt_min), targets
        )
    np.asarray(jax.device_get(carries.x_init))
    elapsed = time.time() - t0

    # True latency percentiles: every tick individually barriered with a
    # host device_get (the only trustworthy completion point over the axon
    # relay). >= 30 samples so p99 means something (VERDICT weak #6).
    lat_samples = int(os.environ.get("BENCH_LATENCY_SAMPLES", "30"))
    lat_ms = []
    viol_ticks = []
    for k in range(lat_samples):
        t0 = time.time()
        carries, stats = step(
            carries, jnp.float32((k + 2 + timed_ticks) * mpc.dt_min), targets
        )
        np.asarray(jax.device_get(carries.x_init))
        lat_ms.append(1000 * (time.time() - t0))
        viol_ticks.append(float(np.asarray(stats["max_violation"]).mean()))
    lat_ms = np.asarray(lat_ms)
    viol_ticks = np.asarray(viol_ticks)

    scan_extra = {}
    if scan_ticks > 0:
        vel_des = jnp.array([0.2, 0, 0, 0, 0, 0], dtype=jnp.float32)
        if batch > 1:
            # Batched on-device rollout: vmap the whole lax.scan rollout
            # over scenarios — amortizes the per-tick host round trip that
            # the step-loop headline pays (~25 ms/tick over the axon relay
            # at batch 512), i.e. the honest production throughput of a
            # resident batch solver.
            vel_des = jnp.tile(vel_des, (batch, 1))
            run_fn = jax.jit(jax.vmap(
                lambda v: mpc.run(scan_ticks, v)[1]["max_violation"]))
        else:
            run_fn = jax.jit(
                lambda v: mpc.run(scan_ticks, v)[1]["max_violation"])
        t0 = time.time()
        np.asarray(jax.device_get(run_fn(vel_des)))
        scan_compile_s = time.time() - t0
        reps = int(os.environ.get("BENCH_SCAN_REPS", "3"))
        t0 = time.time()
        for _ in range(reps):
            viol_scan = np.asarray(jax.device_get(run_fn(vel_des)))
        scan_elapsed = time.time() - t0
        scan_extra = {
            "scan_ticks": scan_ticks,
            "scan_ms_per_tick": round(
                1000 * scan_elapsed / (reps * scan_ticks), 3),
            "scan_solves_per_s_per_chip": round(
                batch * scan_ticks * reps / scan_elapsed
                / max(1, len(jax.devices())), 2),
            "scan_compile_s": round(scan_compile_s, 1),
            "scan_max_violation_mean": float(viol_scan.mean()),
            "scan_max_violation_worst_tick": float(viol_scan.max()),
        }

    n_dev = len(jax.devices())
    solves = batch * timed_ticks
    solves_per_s = solves / elapsed
    per_chip = solves_per_s / max(1, n_dev)
    result = {
        "metric": f"b2g_{dynamics}_trot_N{nodes}_mpc_solves_per_s_per_chip",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / 2500.0, 4),
        "extra": {
            "batch": batch,
            "nodes": nodes,
            "sqp_iters": sqp_iters,
            "admm_iters": admm_iters,
            "qp_precision": qp_precision,
            "factorizer": factorizer,
            "matvec_dtype": matvec_dtype,
            "factor_dtype": factor_dtype,
            "chol_base": chol_base,
            "asm_precision": asm_precision,
            "ls_trials": ls_trials,
            "line_search": line_search,
            "corrector": corrector,
            "flip_reset": flip_reset,
            "warm_shift": warm_shift,
            "eqproj": eqproj,
            "timed_ticks": timed_ticks,
            "elapsed_s": round(elapsed, 3),
            "compile_s": round(compile_s, 1),
            "avg_ms_per_tick": round(1000 * elapsed / timed_ticks, 2),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "devices": n_dev,
            "platform": jax.devices()[0].platform,
            # Mean over all latency-sample ticks AND scenarios — a single
            # tick is unrepresentative (the rollout has recurring
            # gait-transition spikes; see RESULTS.md).
            "max_violation_mean": float(viol_ticks.mean()),
            "max_violation_worst_tick": float(viol_ticks.max()),
            **scan_extra,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
