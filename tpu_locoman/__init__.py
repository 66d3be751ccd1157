"""tpu-locoman: a TPU-native loco-manipulation MPC engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
lukasmolnar/pino-locoman (see SURVEY.md): Go2/B2/B2G robots, five dynamics
formulations, contact-schedule gaits, and a batched stagewise SQP solver.
"""

from . import lie, rbda, gait, model
from .robots import Go2, B2, B2G, Robot
from .dynamics import make_formulation, FORMULATIONS
from .dynamics.formulations import DEFAULT_ARGS as OCP_ARGS
from .mpc import MPC, geometric_dts
from .solver import SQPConfig, ADMMConfig

__version__ = "0.1.0"


def make_ocp(dynamics, default_args=None, robot=None, nodes=14,
             solver="sqp", **kwargs):
    """Reference-familiar factory (ocp_factory.py:8-27 + ocp_args.py):
    returns a ready MPC for the given dynamics formulation.

    `solver` accepts "sqp" (this engine's native solver; the Fatrop/OSQP
    roles are both filled by the SQP+ADMM stack — see PARITY.md)."""
    assert robot is not None, "make_ocp requires robot="
    args = dict(default_args or OCP_ARGS.get(dynamics, {}))
    args.update(kwargs)
    config = args.pop("config", SQPConfig())
    return MPC(robot, dynamics=dynamics, nodes=nodes, config=config, **args)
