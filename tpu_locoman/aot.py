"""AOT compilation and serialized deployment artifacts.

TPU-native counterpart of the reference's codegen/deployment path
(ocp.py:324-357 + codegen/: CasADi ``generate()`` -> C -> CMake -> .so loaded
via ``ca.external``, run_mpc.py:53).  Here the deployable artifact is a
serialized ``jax.export`` StableHLO module: portable across processes,
loadable without the Python model-construction code, and compiled by XLA on
the target TPU.

The exported ABI mirrors the reference's compiled-solver parameter vector
(run_mpc.py:84-96): one flat call
    step(carry..., t_current, base_vel_des[, ext_force_des, arm_vel_des])
returning the new carry and solve stats; and a ``retract`` function mirroring
retract_solution.c (compile_solution, e.g. ocp_centroidal_vel.py:267-337).
"""

import jax
import jax.numpy as jnp
import jax.export as jexp

from .solver.sqp import SolverState
from .mpc import MPCCarry

# Custom pytree namedtuples crossing the export ABI need registered
# serializations (once per process).
for _t in (SolverState, MPCCarry):
    try:
        jexp.register_namedtuple_serialization(
            _t, serialized_name=f"tpu_locoman.{_t.__name__}"
        )
    except ValueError:
        pass  # already registered


def _export(fn, args, path, platforms):
    """Shared export: when a single target platform is given, trace with the
    solver's target-platform override so factorizer='auto' and the Pallas
    interpret flag resolve for the ARTIFACT's platform, not this host's
    backend (ADVICE r3: a CPU-host TPU export must keep cholinv_pb)."""
    from .solver.qp import override_target_platform

    kw = {}
    ctx = None
    if platforms:
        kw["platforms"] = list(platforms)
        if len(platforms) == 1:
            ctx = override_target_platform(platforms[0])
    if ctx is not None:
        with ctx:
            exported = jexp.export(jax.jit(fn), **kw)(*args)
    else:
        exported = jexp.export(jax.jit(fn), **kw)(*args)
    data = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def export_mpc_step(mpc, path=None, platforms=None):
    """Export one jitted MPC tick as a serialized StableHLO artifact.

    `platforms`: jax.export target platform list (e.g. ["tpu"]); a single
    entry also pins the solver's auto-factorizer to that platform.
    Returns the serialized bytes (and writes them to `path` if given).
    """
    carry = mpc.init_carry()

    def step(carry, t, base_vel_des, ext_force_des, arm_vel_des):
        new_carry, stats = mpc.step(
            carry, t, base_vel_des, ext_force_des, arm_vel_des
        )
        return new_carry, stats["max_violation"]

    args = (
        carry,
        jnp.float32(0.0),
        jnp.zeros(6, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32),
    )
    return _export(step, args, path, platforms)


def export_retract(mpc, num_steps=3, path=None, platforms=None):
    """Export the solution retraction for the first num_steps nodes — the
    analog of the generated retract_solution.c (hardware-side decode)."""
    def retract(Z, x_init):
        sol = mpc.retract(Z, x_init, num_steps=num_steps)
        return sol["q"], sol["v"], sol["a"], sol["forces"], sol["tau"]

    args = (
        jnp.zeros((mpc.nodes + 1, mpc.trans.s), dtype=jnp.float32),
        jnp.zeros(mpc.form.nx, dtype=jnp.float32),
    )
    return _export(retract, args, path, platforms)


def load_artifact(data_or_path):
    """Deserialize an exported artifact; returns a callable
    (the ``ca.external`` analog)."""
    if isinstance(data_or_path, (str, bytes)) and not isinstance(
        data_or_path, bytes
    ):
        with open(data_or_path, "rb") as f:
            data = f.read()
    else:
        data = data_or_path
    exported = jexp.deserialize(data)
    return exported.call
