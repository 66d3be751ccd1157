from .qp import BlockTridiagFactor, admm_solve, ADMMConfig
from .sqp import SQPConfig, SQPSolver, SolverState
