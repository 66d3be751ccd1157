"""External optimality validation: the SQP/ADMM solution of a tiny Go2
instance must agree with an independent dense-NLP solve (scipy
trust-constr) of the exact same problem — beyond the feasibility-only
EOM-vs-RNEA identity (VERDICT round-1 missing #2)."""

import pytest

from tools.crosscheck_nlp import crosscheck


@pytest.mark.parametrize("dynamics", ["centroidal_acc", "whole_body_rnea"])
def test_matches_independent_nlp_optimum(dynamics):
    out = crosscheck(dynamics=dynamics, nodes=3, sqp_iters=6,
                     admm_iters=300, verbose=False)
    assert out["scipy_status"] in (1, 2), out  # converged (xtol/gtol)
    assert out["viol_scipy"] < 1e-3, out
    assert out["viol_ours"] < 5e-2, out
    # Optimality: our objective must not exceed the independent optimum by
    # more than 2% (it may be lower only via constraint slack).
    assert out["obj_gap_rel"] < 2e-2, out
    # Same basin: the iterates describe the same trajectory.
    assert out["z_dist_inf"] < 0.1, out
