"""The guarded default flip: battery logs -> SHIPPING.json adjudication.

Encodes the round-2 VERDICT rule (fastest config with mean violation
<= 0.35 at >= 2500 solves/s/chip; else fastest within the <= 1.0 band;
real-TPU evidence only) — tools/adjudicate_battery.py.
"""

import json
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "adjudicate_battery.py")


def _mk(d, name, obj):
    with open(os.path.join(d, name), "w") as f:
        f.write("warning noise\n")
        if obj is not None:
            f.write(json.dumps(obj) + "\n")


def _row(value, factorizer="pallas", viol=0.5, platform="tpu", **extra):
    e = {"factorizer": factorizer, "ls_trials": 8, "corrector": 0,
         "admm_iters": 10, "platform": platform,
         "max_violation_mean": viol}
    e.update(extra)
    return {"metric": "m", "value": value, "unit": "u",
            "vs_baseline": value / 2500.0, "extra": e}


def _run(d):
    out = os.path.join(d, "out.json")
    env = dict(os.environ, BATTERY_LOG_DIR=str(d), SHIPPING_OUT=out,
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, TOOL], env=env,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    ship = json.load(open(out)) if os.path.exists(out) else None
    return ship, r.stdout


def test_quality_gate_preferred(tmp_path):
    _mk(tmp_path, "01_default.log", _row(2069, "sequential", viol=0.75))
    _mk(tmp_path, "02_pallas.log", _row(3900, viol=0.74))
    _mk(tmp_path, "03_pallas_corr5.log", _row(3300, viol=0.31, corrector=5))
    _mk(tmp_path, "05_pallas_corr5_ls5.log",
        _row(3500, viol=0.30, corrector=5, ls_trials=5))
    ship, _ = _run(tmp_path)
    # fastest config MEETING the quality gate wins, not the fastest overall
    assert ship["quality_gate_met"]
    assert ship["bench_defaults"] == {
        "factorizer": "pallas", "ls_trials": 5, "corrector": 5,
        "admm_iters": 10}


def test_failed_pallas_and_cpu_rows_rejected(tmp_path):
    _mk(tmp_path, "01_default.log", _row(2069, "sequential", viol=0.75))
    _mk(tmp_path, "02_pallas.log", None)  # Mosaic crash: no JSON line
    _mk(tmp_path, "03_pallas_corr5.log",
        _row(3300, viol=0.30, platform="cpu"))  # not hardware evidence
    ship, out = _run(tmp_path)
    assert "reject 03_pallas_corr5.log" in out
    assert ship["bench_defaults"]["factorizer"] == "sequential"
    assert not ship["quality_gate_met"]


def test_no_valid_runs_leaves_shipping_untouched(tmp_path):
    _mk(tmp_path, "02_pallas.log", _row(4000, viol=400.0))  # insane quality
    ship, out = _run(tmp_path)
    assert ship is None
    assert "untouched" in out


def test_bench_reads_shipping_defaults(tmp_path):
    """bench.py must apply SHIPPING.json defaults with env overrides —
    checked against the same parsing logic on a synthetic file."""
    ship = {"bench_defaults": {"factorizer": "pallas", "ls_trials": 5,
                               "corrector": 5, "admm_iters": 10}}
    p = tmp_path / "SHIPPING.json"
    p.write_text(json.dumps(ship))
    # replicate bench.py's guarded read (env override wins)
    loaded = json.load(open(p)).get("bench_defaults", {})
    assert loaded["factorizer"] == "pallas"
    src = open(os.path.join(os.path.dirname(TOOL), "..", "bench.py")).read()
    # the bench actually wires the file in, env-guarded
    assert "SHIPPING.json" in src
    for knob in ("BENCH_FACTORIZER", "BENCH_LS_TRIALS", "BENCH_CORRECTOR",
                 "BENCH_ADMM_ITERS"):
        assert f'"{knob}" not in os.environ' in src
