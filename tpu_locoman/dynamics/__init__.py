from .formulations import (
    Formulation,
    CentroidalVel,
    CentroidalAcc,
    WholeBodyAcc,
    WholeBodyRNEA,
    WholeBodyABA,
    make_formulation,
    FORMULATIONS,
)
