"""Tests for the parity interchange tooling (tools/parity_check.py):
the --diff comparator and the committed golden dump's ABI shape."""

import importlib.util
import json
import os

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "parity_check", os.path.join(ROOT, "tools", "parity_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_dump(ticks=3, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(ticks, 5))
    node = {
        k: (base + jitter * rng.normal(size=base.shape)).tolist()
        for k in ("q", "v", "a", "forces", "tau")
    }
    return {
        "abi_version": 1,
        "config": {"robot": "go2", "ticks": ticks},
        "t": list(range(ticks)),
        "x": base.tolist(),
        "max_violation": [1e-3] * ticks,
        "node0": node,
        "node1": node,
    }


def test_diff_identical_dumps(tmp_path):
    tool = _load_tool()
    a = tmp_path / "a.json"
    d = _fake_dump()
    a.write_text(json.dumps(d))
    out = tool.diff(str(a), str(a))
    assert out["node0.tau"]["max_abs_err"] == 0.0
    assert out["x"]["rms_err"] == 0.0
    assert out["node1.q"]["ticks_compared"] == 3


def test_diff_reports_errors(tmp_path):
    tool = _load_tool()
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    da = _fake_dump()
    db = _fake_dump(jitter=1e-3, seed=1)
    db["x"] = (np.asarray(da["x"]) + 0.5).tolist()
    a.write_text(json.dumps(da))
    b.write_text(json.dumps(db))
    out = tool.diff(str(a), str(b))
    assert abs(out["x"]["max_abs_err"] - 0.5) < 1e-12
    assert out["node0.tau"]["max_abs_err"] > 0.0


def test_golden_dump_abi_shape():
    path = os.path.join(ROOT, "tools", "golden_b2g_rnea_n14.json")
    with open(path) as f:
        d = json.load(f)
    assert d["abi_version"] == 1
    cfg = d["config"]
    assert cfg["robot"] == "b2g" and cfg["dynamics"] == "whole_body_rnea"
    ticks = cfg["ticks"]
    assert len(d["t"]) == ticks and len(d["x"]) == ticks
    for node in ("node0", "node1"):
        for k in ("q", "v", "a", "forces", "tau"):
            assert len(d[node][k]) == ticks
    # the committed dump is the accurate-mode (Fatrop-tolerance) rollout
    assert float(np.mean(d["max_violation"])) < 2e-3
