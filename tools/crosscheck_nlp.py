"""Independent optimality cross-check against a dense scipy NLP solve.

The repo's physics identities (EOM-vs-RNEA, run_mpc.py:186-241 analog) prove
feasibility, not optimality — a suboptimal-but-feasible point passes them.
This tool solves the exact same stagewise NLP

    min  objective_value(Z)   s.t.  l <= g(Z) <= u

with scipy's trust-constr on a tiny instance and compares the incumbent
SQP/ADMM solution against that independent solve: objective gap, violation,
and iterate distance.

The oracle runs on a FLOAT64 promotion of the NLP (jax_enable_x64 +
promoting every input leaf, the tools/verify_f64.py trick): on the raw f32
evaluation trust-constr is not a usable oracle — its Newton steps live
below the f32 noise floor, scipy reports singular Jacobians and walks
UPHILL in both objective and feasibility even when started exactly at the
optimum (measured: f 346->376, viol 1e-5->0.25). In f64 the problem is
smooth and trust-constr can actually certify/deny optimality. Because
flipping x64 mid-process invalidates jit caches and leaks into later
traces, callers that share a process with other jax work (pytest) should
run crosscheck in a subprocess: `python tools/crosscheck_nlp.py --json`.

Usable standalone (python tools/crosscheck_nlp.py) and from
tests/test_optimality.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def crosscheck(dynamics="centroidal_acc", nodes=3, sqp_iters=6,
               admm_iters=300, eq_projection=2, verbose=True):
    import jax
    import jax.numpy as jnp
    from scipy.optimize import NonlinearConstraint, minimize

    from tpu_locoman import Go2, MPC, SQPConfig, ADMMConfig

    robot = Go2()
    robot.set_gait_sequence("trot", 0.5)
    mpc = MPC(
        robot,
        dynamics=dynamics,
        nodes=nodes,
        # Accurate mode: the comparison below is objective-vs-objective at
        # EQUAL feasibility, so our point must sit on the constraint
        # manifold (viol ~1e-5..1e-3), not at the hot-config ~0.05 floor —
        # a loose point "wins" objective through constraint slack and the
        # comparison means nothing.
        config=SQPConfig(
            sqp_iters=sqp_iters, admm=ADMMConfig(iters=admm_iters),
            eq_projection=eq_projection,
        ),
    )
    trans = mpc.trans
    base_vel_des = jnp.array([0.1, 0, 0, 0, 0, 0], dtype=jnp.float32)

    carry = mpc.init_carry()
    shared = mpc.make_shared(carry.x_init, base_vel_des,
                             tau_prev=carry.tau_prev)
    sp = mpc.make_stage_params(jnp.float32(0.0))

    shape = (nodes + 1, trans.s)

    # --- ours: warm-started SQP/ADMM at accurate settings (f32, the
    # production arithmetic) ---------------------------------------------
    state = carry.solver_state._replace(
        Z=mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
    )
    z0 = np.asarray(state.Z).reshape(-1).astype(np.float64)
    state, stats = jax.jit(mpc.solver.solve)(state, sp, shared)
    z_ours = np.asarray(state.Z).reshape(-1).astype(np.float64)

    # --- oracle: float64 promotion of the same NLP ----------------------
    # (see module docstring for why f32 is not oracle-able)
    jax.config.update("jax_enable_x64", True)
    try:
        mpc64 = MPC(robot, dynamics=dynamics, nodes=nodes)
        trans64 = mpc64.trans

        def to64(a):
            return jnp.asarray(np.asarray(a), dtype=jnp.float64)

        shared64 = jax.tree.map(to64, shared)
        sp64 = jax.tree.map(to64, sp)
        obj64 = trans64.objective_data(shared64)
        l_b, u_b = (np.asarray(a, dtype=np.float64).reshape(-1)
                    for a in jax.device_get(trans64.bounds(sp64, shared64)))

        def f_flat(z):
            return trans64.objective_value(z.reshape(shape), obj64)

        def g_flat(z):
            return trans64.evaluate(z.reshape(shape), sp64, shared64
                                    ).reshape(-1)

        f_jit = jax.jit(f_flat)
        fg_jit = jax.jit(jax.grad(f_flat))
        g_jit = jax.jit(g_flat)
        gj_jit = jax.jit(jax.jacfwd(g_flat))

        def as64(z):
            return jnp.asarray(z, dtype=jnp.float64)

        def viol(z):
            g = np.asarray(g_jit(as64(z)))
            return float(np.maximum(0, l_b - g).max()
                         + np.maximum(0, g - u_b).max())

        f_ours = float(f_jit(as64(z_ours)))
        v_ours = viol(z_ours)

        # Condition the NLP for scipy. The raw row set is unusable by
        # trust-constr even in f64: masked (inactive-contact) rows are
        # identically zero — a massively rank-deficient Jacobian ("Singular
        # Jacobian matrix" warnings, SVD fallback) — and live rows span
        # ~5 orders of magnitude (RNEA wrenches O(1e3) vs velocity rows
        # O(1e-2)). Neither transformation changes the feasible set or the
        # optimum: drop rows whose Jacobian is zero at both the warm start
        # and our solution (checking they are trivially satisfied), and
        # row-normalize the rest to unit inf-norm.
        J_ours = np.asarray(gj_jit(as64(z_ours)))
        J_0 = np.asarray(gj_jit(as64(z0)))
        row_norm = np.maximum(np.abs(J_ours).max(axis=1),
                              np.abs(J_0).max(axis=1))
        keep = row_norm > 1e-9
        g_at_ours = np.asarray(g_jit(as64(z_ours)))
        dropped_viol = float(
            (np.maximum(0, l_b - g_at_ours) + np.maximum(0, g_at_ours - u_b)
             )[~keep].max(initial=0.0)
        )
        assert dropped_viol < 1e-6, (
            f"a zero-Jacobian row is violated ({dropped_viol}); "
            "it cannot be pruned from the oracle problem"
        )
        scale = 1.0 / row_norm[keep]

        con = NonlinearConstraint(
            lambda z: np.asarray(g_jit(as64(z)))[keep] * scale,
            l_b[keep] * scale, u_b[keep] * scale,
            jac=lambda z: np.asarray(gj_jit(as64(z)))[keep] * scale[:, None],
        )
        res = minimize(
            lambda z: float(f_jit(as64(z))),
            # Started from our solution: if the SQP/ADMM point is optimal,
            # trust-constr stays put (small z_dist, equal objective); if it
            # is suboptimal, scipy walks downhill and the gap shows up
            # directly. (A cold start from the warm-start point works in
            # f64 too but needs thousands of iterations on the rnea
            # variants — not CI material.)
            z_ours,
            jac=lambda z: np.asarray(fg_jit(as64(z))),
            method="trust-constr",
            constraints=[con],
            options={"maxiter": 500, "gtol": 1e-8, "xtol": 1e-12},
        )
        z_sp = res.x
        f_sp = float(f_jit(as64(z_sp)))
        v_sp = viol(z_sp)
    finally:
        jax.config.update("jax_enable_x64", False)

    out = {
        "f_ours": f_ours,
        "f_scipy": f_sp,
        "viol_ours": v_ours,
        "viol_scipy": v_sp,
        "obj_gap_rel": (f_ours - f_sp) / max(1.0, abs(f_sp)),
        "z_dist_inf": float(np.abs(z_ours - z_sp).max()),
        "scipy_status": int(res.status),
        "scipy_iters": int(res.niter),
        "alpha": float(stats["alpha"]),
    }
    if verbose:
        for k, v in out.items():
            print(f"{k:14s} {v}")
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("dynamics", nargs="?", default="centroidal_acc")
    ap.add_argument("--sqp-iters", type=int, default=6)
    ap.add_argument("--admm-iters", type=int, default=300)
    ap.add_argument("--eqproj", type=int, default=2)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    out = crosscheck(dynamics=args.dynamics, sqp_iters=args.sqp_iters,
                     admm_iters=args.admm_iters,
                     eq_projection=args.eqproj, verbose=not args.json)
    if args.json:
        print(json.dumps(out))
