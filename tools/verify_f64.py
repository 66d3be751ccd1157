"""Float64 re-evaluation of a solved f32 iterate (the honest
Fatrop-tolerance check).

The f32 residual evaluation has an absolute noise floor of ~1e-3 on the
RNEA base rows (catastrophic cancellation of O(1e3) N·m wrench terms at
eps_f32), so a solver that has truly converged still *measures* 2-6e-3 in
f32. The reference's tolerance 1e-3 (ocp.py:256-257) is checked by Fatrop
in float64. This tool re-evaluates the violation of an iterate saved by
accuracy_probe (PROBE_SAVE=...) with JAX x64 enabled — promoting the whole
residual computation to f64 — and prints the true violation.

Run in its own process: the x64 flag must be set before any jax use.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def evaluate_f64(npz_path):
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")  # f64 is a host-side check
    import jax.numpy as jnp

    from tpu_locoman import B2G, Go2, MPC

    d = np.load(npz_path, allow_pickle=True)
    robot = {"b2g": B2G, "go2": Go2}[str(d["robot"])]()
    robot.set_gait_sequence("trot", 0.8)
    mpc = MPC(robot, dynamics="whole_body_rnea", nodes=int(d["nodes"]))
    trans = mpc.trans

    shared = mpc.make_shared(
        jnp.asarray(d["x_init"]),
        jnp.asarray(d["base_vel_des"]),
        tau_prev=jnp.asarray(d["tau_prev"]),
    )
    sp = mpc.make_stage_params(jnp.float32(float(d["t"])))
    # Promote every leaf (and the iterate) to f64; model constants are
    # exact-valued f32 numpy arrays that promote inside the ops.
    to64 = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float64)
    shared = jax.tree.map(to64, shared)
    sp = jax.tree.map(to64, sp)
    Z = to64(d["Z"])

    g = trans.evaluate(Z, sp, shared)
    l, u = trans.bounds(sp, shared)
    l, u = to64(l), to64(u)
    viol = np.asarray(jnp.maximum(0, l - g) + jnp.maximum(0, g - u))
    assert viol.dtype == np.float64, viol.dtype

    from tpu_locoman.diagnostics import row_group_layout

    out = {"max_violation_f64": float(viol.max())}
    print(f"max violation (f64 evaluation): {viol.max():.3e}")
    print("by row group:")
    for name, a, b in sorted(
        row_group_layout(trans), key=lambda g_: -viol[:, g_[1]:g_[2]].max()
    ):
        if b > a:
            print(f"  {name:24s} {viol[:, a:b].max():.3e}")
            out[name] = float(viol[:, a:b].max())
    return out


if __name__ == "__main__":
    evaluate_f64(sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_iterate.npz")
