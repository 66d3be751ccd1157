"""Independent optimality cross-check against a dense scipy NLP solve.

The repo's physics identities (EOM-vs-RNEA, run_mpc.py:186-241 analog) prove
feasibility, not optimality — a suboptimal-but-feasible point passes them.
This tool solves the exact same stagewise NLP

    min  objective_value(Z)   s.t.  l <= g(Z) <= u

with scipy's trust-constr (float64 optimizer iterations over the jitted
residuals) on a tiny instance and compares the incumbent SQP/ADMM solution
against that independent optimum: objective gap, violation, and iterate
distance.  Usable standalone (python tools/crosscheck_nlp.py) and from
tests/test_optimality.py.
"""

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
        # manifold (viol ~1e-4), not at the hot-config ~0.05 floor — a
        # loose point "wins" objective through constraint slack and the
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
    obj_data = trans.objective_data(shared)
    l_b, u_b = jax.device_get(trans.bounds(sp, shared))

    shape = (nodes + 1, trans.s)

    def f_flat(z):
        return trans.objective_value(z.reshape(shape), obj_data)

    def g_flat(z):
        return trans.evaluate(z.reshape(shape), sp, shared).reshape(-1)

    f_jit = jax.jit(f_flat)
    fg_jit = jax.jit(jax.grad(f_flat))
    g_jit = jax.jit(g_flat)
    gj_jit = jax.jit(jax.jacfwd(g_flat))

    def viol(z):
        g = np.asarray(g_jit(jnp.asarray(z, dtype=jnp.float32)))
        return float(
            np.maximum(0, l_b.reshape(-1) - g).max()
            + np.maximum(0, g - u_b.reshape(-1)).max()
        )

    # --- ours: warm-started SQP/ADMM at accurate settings ---------------
    state = carry.solver_state._replace(
        Z=mpc.warm_start_Z(carry.solver_state.Z, sp, shared)
    )
    z0 = np.asarray(state.Z).reshape(-1).astype(np.float64)
    state, stats = jax.jit(mpc.solver.solve)(state, sp, shared)
    z_ours = np.asarray(state.Z).reshape(-1).astype(np.float64)
    f_ours = float(f_jit(jnp.asarray(z_ours, dtype=jnp.float32)))
    v_ours = viol(z_ours)

    # --- scipy: independent dense solve STARTED FROM OUR SOLUTION -------
    # If the SQP/ADMM point is optimal, trust-constr stays put (small
    # z_dist, equal objective); if it is suboptimal, scipy walks away and
    # the gap shows up directly. Starting from the optimum also keeps the
    # independent solve fast enough for CI. (Cold starts are useless here:
    # trust-constr on the f32-evaluated NLP diverges from the warm-start
    # point — measured viol 10 / z_dist 148 — so "scipy found the optimum
    # independently" is not an available oracle; "scipy cannot improve on
    # our point at equal feasibility" is.)
    con = NonlinearConstraint(
        lambda z: np.asarray(g_jit(jnp.asarray(z, dtype=jnp.float32)),
                             dtype=np.float64),
        l_b.reshape(-1).astype(np.float64),
        u_b.reshape(-1).astype(np.float64),
        jac=lambda z: np.asarray(gj_jit(jnp.asarray(z, dtype=jnp.float32)),
                                 dtype=np.float64),
    )
    res = minimize(
        lambda z: float(f_jit(jnp.asarray(z, dtype=jnp.float32))),
        z_ours,
        jac=lambda z: np.asarray(fg_jit(jnp.asarray(z, dtype=jnp.float32)),
                                 dtype=np.float64),
        method="trust-constr",
        constraints=[con],
        # f32-evaluated objective/jacobians put a ~1e-6 floor under what
        # trust-constr can resolve; tighter tolerances spin to maxiter
        # (status 0) without moving.
        options={"maxiter": 500, "gtol": 1e-6, "xtol": 1e-9},
    )
    z_sp = res.x
    f_sp = float(f_jit(jnp.asarray(z_sp, dtype=jnp.float32)))
    v_sp = viol(z_sp)

    out = {
        "f_ours": f_ours,
        "f_scipy": f_sp,
        "viol_ours": v_ours,
        "viol_scipy": v_sp,
        "obj_gap_rel": (f_ours - f_sp) / max(1.0, abs(f_sp)),
        "z_dist_inf": float(np.abs(z_ours - z_sp).max()),
        "scipy_status": res.status,
        "alpha": float(stats["alpha"]),
    }
    if verbose:
        for k, v in out.items():
            print(f"{k:14s} {v}")
    return out


if __name__ == "__main__":
    crosscheck()
