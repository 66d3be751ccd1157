"""Checkpoint / resume for MPC state.

The reference's persistence story is (a) warm-start primal/dual state
carried in memory and (b) compiled-solver artifacts on disk (SURVEY.md §5).
Here both are first-class: aot.py persists the solver; this module persists
the full warm-start carry (primal iterate, ADMM duals, robot state, torque
hand-off) so an MPC session can resume exactly where it stopped — e.g.
across a controller restart on hardware.
"""

import numpy as np
import jax.numpy as jnp

from .mpc import MPCCarry
from .solver.sqp import SolverState


def save_carry(path, carry: MPCCarry):
    # np.savez appends ".npz" when missing; normalize so the returned path
    # is the file that actually exists on disk.
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(
        path,
        x_init=np.asarray(carry.x_init),
        Z=np.asarray(carry.solver_state.Z),
        z_admm=np.asarray(carry.solver_state.z_admm),
        y_admm=np.asarray(carry.solver_state.y_admm),
        tau_prev=np.asarray(carry.tau_prev),
    )
    return path


def load_carry(path) -> MPCCarry:
    d = np.load(path)
    return MPCCarry(
        x_init=jnp.asarray(d["x_init"]),
        solver_state=SolverState(
            Z=jnp.asarray(d["Z"]),
            z_admm=jnp.asarray(d["z_admm"]),
            y_admm=jnp.asarray(d["y_admm"]),
        ),
        tau_prev=jnp.asarray(d["tau_prev"]),
    )
