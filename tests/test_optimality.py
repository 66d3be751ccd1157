"""External optimality validation: the SQP/ADMM solution of a tiny Go2
instance must agree with an independent dense-NLP solve (scipy
trust-constr on a float64 promotion of the same problem) — beyond the
feasibility-only EOM-vs-RNEA identity (VERDICT round-1 missing #2).

Runs in a subprocess because the f64 oracle flips jax_enable_x64, which
must not leak into this process's traces (tools/crosscheck_nlp.py
docstring)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Per-dynamics accurate-mode configs: the short N=3 horizon makes the
# whole-body RNEA rows genuinely nonlinear (line search takes alpha
# 0.25-0.5), so it needs more SQP iterations to land on the manifold.
CONFIGS = {
    "centroidal_acc": ["--sqp-iters", "6", "--eqproj", "2"],
    "whole_body_rnea": ["--sqp-iters", "12", "--admm-iters", "400",
                        "--eqproj", "3"],
}


@pytest.mark.slow
@pytest.mark.parametrize("dynamics", sorted(CONFIGS))
def test_matches_independent_nlp_optimum(dynamics):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = f"{ROOT}:/root/.axon_site"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "crosscheck_nlp.py"),
         dynamics, "--json"] + CONFIGS[dynamics],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])

    # Ours is feasible to the reference production tolerance (Fatrop tol
    # 1e-3, ref ocp.py:256-257), measured on the FLOAT64 promotion — the
    # f32 evaluation has a ~1e-3 noise floor on RNEA rows.
    assert out["viol_ours"] < 1e-3, out
    # The oracle itself converged to a feasible point (else the objective
    # comparison is meaningless).
    assert out["viol_scipy"] < 1e-8, out
    # Optimality: polishing from our point with a second-order f64 method,
    # scipy must not find a meaningfully lower objective. (It may be
    # *higher* only through its own feasibility/objective trade — that
    # direction does not indict our point.)
    assert out["obj_gap_rel"] < 5e-3, out
    # Same basin: the two iterates describe the same trajectory.
    assert out["z_dist_inf"] < 0.5, out
