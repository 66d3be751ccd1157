"""tpu-locoman: a TPU-native loco-manipulation MPC engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
lukasmolnar/pino-locoman (see SURVEY.md): Go2/B2/B2G robots, five dynamics
formulations, contact-schedule gaits, and a batched stagewise SQP solver.
"""

from . import lie, rbda, gait, model
from .robots import Go2, B2, B2G, Robot
from .dynamics import make_formulation, FORMULATIONS
from .mpc import MPC, geometric_dts
from .solver import SQPConfig, ADMMConfig

__version__ = "0.1.0"
