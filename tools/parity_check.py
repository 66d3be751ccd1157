"""Control-sequence parity harness.

BASELINE.json's parity target compares our solver's executed control
sequence (q, v, a, forces, tau over the horizon) against the reference
Fatrop solution on the same configuration.  The reference stack (Pinocchio/
CasADi/Fatrop) is not installed in this image, so this tool works against
dump files in a documented interchange format (the "parity ABI"):

Modes
-----
1. `--dump out.json [--ticks 100] [--hot]` — run OUR MPC rollout and write
   a golden dump (committed as tools/golden_b2g_rnea_n14.json).  Default is
   the accurate configuration (eq_projection=2, violation <= ~1e-3, i.e.
   Fatrop-comparable); `--hot` uses the shipping real-time config instead.
2. `--diff ours.json theirs.json` — pure-numpy tick-by-tick comparison of
   two ABI dumps (no solver run; works anywhere).
3. `python tools/parity_check.py reference_dump.json` — legacy single-shot
   compare: re-solves the dumped configuration here and diffs per-node
   solution arrays {q,v,a,forces,tau}_sol from the file.
4. `--self-check` — internal physics-consistency identity (the reference's
   own EOM-vs-RNEA debug check, run_mpc.py:186-241) as the parity proxy.

Parity ABI v1 (what a reference-side script must produce)
---------------------------------------------------------
Run the reference MPC (reference run_mpc.py mpc_loop, run_mpc.py:69-148)
for `ticks` control ticks with the configuration in `config` and record,
AFTER each solve, the retracted solution at nodes 0 and 1
(retract_stacked_sol; node 0 = current state, node 1 = first optimized
step — the quantities a robot would execute).  JSON schema:

    {
      "abi_version": 1,
      "config": {
        "robot": "b2g",                  # go2 | b2 | b2g
        "gait": "trot", "gait_period": 0.8,
        "dynamics": "whole_body_rnea",
        "nodes": 14, "dt_min": 0.01, "dt_max": 0.08,
        "base_vel_des": [0.2, 0, 0, 0, 0, 0],
        "ticks": 100
      },
      "solver": { ...free-form description of solver settings... },
      "t": [ticks],                      # solve wall-time t_current per tick
      "x": [ticks][nx],                  # applied state AFTER each tick
      "max_violation": [ticks],          # solver-reported max violation
      "node0": {"q": [ticks][nq], "v": [ticks][nv], "a": [ticks][nv],
                 "forces": [ticks][nf*3], "tau": [ticks][nj]},
      "node1": { same keys/shapes }
    }

All arrays are plain nested JSON lists, row-major, float.  Quaternions use
(x, y, z, w) ordering with the free-flyer base translation first
(Pinocchio convention, so the reference can dump q verbatim).  Forces are
stacked per end-effector [fx, fy, fz] in the robot's ee_frames order
(FL, FR, RL, RR, then gripper for b2g).  `--diff` compares every key
present in BOTH files and reports max/rms error per quantity.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def self_check():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import B2G, MPC, SQPConfig, ADMMConfig, rbda

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(
        robot, dynamics="whole_body_rnea", nodes=14,
        config=SQPConfig(sqp_iters=4, admm=ADMMConfig(iters=150)),
    )
    carry = mpc.init_carry()
    step = jax.jit(lambda c: mpc.step(
        c, jnp.float32(0.0), jnp.array([0.2, 0, 0, 0, 0, 0])))
    for _ in range(3):  # a few ticks to converge the warm start
        carry, stats = step(carry)
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    model = mpc.form.model
    ee = mpc.form.ee_frames
    tau_diffs, tau_b = [], []
    for k in range(mpc.nodes):
        q, v, a, forces = sol["q"][k], sol["v"][k], sol["a"][k], sol["forces"][k]
        tau_rnea = rbda.rnea(model, q, v, a, ee, forces)
        tau_diffs.append(float(jnp.linalg.norm(tau_rnea[6:] - sol["tau"][k])))
        tau_b.append(float(jnp.linalg.norm(tau_rnea[:6])))
    print(json.dumps({
        "check": "eom_vs_rnea_self_consistency",
        "avg_tau_diff": float(np.mean(tau_diffs)),
        "avg_tau_b_norm": float(np.mean(tau_b)),
        "max_violation": float(stats["max_violation"]),
    }))


def compare(dump_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig, ADMMConfig

    with open(dump_path) as f:
        ref = json.load(f)
    cfg = ref.get("config", {})
    robot_cls = {"go2": Go2, "b2": B2, "b2g": B2G}[cfg.get("robot", "b2g")]
    robot = robot_cls()
    robot.set_gait_sequence(cfg.get("gait", "trot"), cfg.get("gait_period", 0.8))
    mpc = MPC(
        robot,
        dynamics=cfg.get("dynamics", "whole_body_rnea"),
        nodes=cfg.get("nodes", 14),
        config=SQPConfig(sqp_iters=6, admm=ADMMConfig(iters=200)),
    )
    carry = mpc.init_carry(
        jnp.asarray(ref["x_init"], dtype=jnp.float32) if "x_init" in ref else None
    )
    step = jax.jit(lambda c: mpc.step(
        c, jnp.float32(0.0),
        jnp.asarray(cfg.get("base_vel_des", [0.2, 0, 0, 0, 0, 0]),
                    dtype=jnp.float32)))
    for _ in range(cfg.get("converge_ticks", 1)):
        carry, _ = step(carry)
    sol = mpc.retract(carry.solver_state.Z, carry.x_init)
    out = {}
    for key in ["q", "v", "a", "forces", "tau"]:
        if key + "_sol" in ref:
            ours = np.asarray(sol[key])
            theirs = np.asarray(ref[key + "_sol"])[: ours.shape[0]]
            err = np.abs(ours - theirs)
            out[key] = {
                "max_abs_err": float(err.max()),
                "rms_err": float(np.sqrt((err ** 2).mean())),
                "ref_scale": float(np.abs(theirs).max()),
            }
    print(json.dumps(out, indent=2))


def make_dump(out_path, ticks=100, hot=False, robot_name="b2g",
              dynamics="whole_body_rnea", nodes=14,
              base_vel_des=(0.2, 0, 0, 0, 0, 0), gait="trot",
              gait_period=0.8):
    """Write a parity-ABI v1 golden dump of OUR rollout (VERDICT round-2
    item 6: the committed interchange a reference Fatrop run is diffed
    against the day one appears)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_locoman import Go2, B2, B2G, MPC, SQPConfig, ADMMConfig

    robot_cls = {"go2": Go2, "b2": B2, "b2g": B2G}[robot_name]
    robot = robot_cls()
    robot.set_gait_sequence(gait, gait_period)
    if hot:
        cfg = SQPConfig(sqp_iters=1, admm=ADMMConfig(iters=10))
        solver_desc = {"mode": "hot", "sqp_iters": 1, "admm_iters": 10}
    else:
        # Accurate mode: the round-2 Fatrop-tolerance config (accuracy_probe
        # sqp=6 x admm=400 + eq_projection=2, f64-verified <= ~1e-3 per
        # solve) — a converged reference run should agree with this dump to
        # solver tolerance, not to ADMM-floor noise.
        cfg = SQPConfig(sqp_iters=6, admm=ADMMConfig(iters=400),
                        eq_projection=2)
        solver_desc = {"mode": "accurate", "sqp_iters": 6,
                       "admm_iters": 400, "eq_projection": 2}
    mpc = MPC(robot, dynamics=dynamics, nodes=nodes, config=cfg)
    bvd = jnp.asarray(base_vel_des, dtype=jnp.float32)
    step = jax.jit(lambda c, t: mpc.step(c, t, bvd))

    carry = mpc.init_carry()
    rec = {
        "t": [], "x": [], "max_violation": [],
        "node0": {k: [] for k in ("q", "v", "a", "forces", "tau")},
        "node1": {k: [] for k in ("q", "v", "a", "forces", "tau")},
    }
    for k in range(ticks):
        t = jnp.float32(k * mpc.dt_min)
        x_solve = carry.x_init  # the state this tick's solution retracts from
        carry, stats = step(carry, t)
        sol = mpc.retract(carry.solver_state.Z, x_solve, num_steps=2)
        rec["t"].append(float(t))
        rec["x"].append(np.asarray(carry.x_init, dtype=np.float64).tolist())
        rec["max_violation"].append(float(stats["max_violation"]))
        for node in (0, 1):
            for key in ("q", "v", "a", "forces", "tau"):
                rec[f"node{node}"][key].append(
                    np.asarray(sol[key][node], dtype=np.float64).tolist()
                )
        if (k + 1) % 10 == 0:
            print(f"tick {k + 1}/{ticks} viol={rec['max_violation'][-1]:.2e}",
                  flush=True)
    dump = {
        "abi_version": 1,
        "config": {
            "robot": robot_name, "gait": gait, "gait_period": gait_period,
            "dynamics": dynamics, "nodes": nodes,
            "dt_min": float(mpc.dt_min), "dt_max": float(mpc.dts[-1]),
            "base_vel_des": list(map(float, base_vel_des)), "ticks": ticks,
        },
        "solver": solver_desc,
        **rec,
    }
    with open(out_path, "w") as f:
        json.dump(dump, f)
    print(f"wrote {out_path} "
          f"(mean viol {np.mean(rec['max_violation']):.2e}, "
          f"worst {np.max(rec['max_violation']):.2e})")


def diff(path_a, path_b):
    """Pure-numpy tick-by-tick comparison of two parity-ABI dumps."""
    import numpy as np

    with open(path_a) as f:
        a = json.load(f)
    with open(path_b) as f:
        b = json.load(f)
    for d, p in ((a, path_a), (b, path_b)):
        if d.get("abi_version") != 1:
            print(f"warning: {p} has abi_version={d.get('abi_version')!r}, "
                  "expected 1", file=sys.stderr)
    if a.get("config") != b.get("config"):
        print("warning: configs differ — comparison may be meaningless",
              file=sys.stderr)
        for key in set(a.get("config", {})) | set(b.get("config", {})):
            va, vb = a["config"].get(key), b["config"].get(key)
            if va != vb:
                print(f"  config.{key}: {va!r} vs {vb!r}", file=sys.stderr)
    out = {}

    def cmp(key, arr_a, arr_b):
        ta, tb = np.asarray(arr_a, float), np.asarray(arr_b, float)
        n = min(ta.shape[0], tb.shape[0])
        ta, tb = ta[:n], tb[:n]
        err = np.abs(ta - tb)
        out[key] = {
            "ticks_compared": int(n),
            "max_abs_err": float(err.max()),
            "rms_err": float(np.sqrt((err ** 2).mean())),
            "ref_scale": float(np.abs(tb).max()),
        }

    for key in ("x", "max_violation"):
        if key in a and key in b:
            cmp(key, a[key], b[key])
    for node in ("node0", "node1"):
        if node in a and node in b:
            for q in set(a[node]) & set(b[node]):
                cmp(f"{node}.{q}", a[node][q], b[node][q])
    print(json.dumps(out, indent=2, sort_keys=True))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", nargs="?", default=None,
                    help="legacy: reference per-node solution dump to "
                         "re-solve against")
    ap.add_argument("--self-check", action="store_true")
    ap.add_argument("--dump-out", metavar="OUT.json",
                    help="write a parity-ABI golden dump of our rollout")
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--hot", action="store_true",
                    help="dump the shipping real-time config instead of "
                         "accurate mode")
    ap.add_argument("--diff", nargs=2, metavar=("OURS", "THEIRS"),
                    help="compare two parity-ABI dumps (no solver run)")
    args = ap.parse_args()
    if args.diff:
        diff(*args.diff)
    elif args.dump_out:
        make_dump(args.dump_out, ticks=args.ticks, hot=args.hot)
    elif args.dump:
        compare(args.dump)
    else:
        self_check()
