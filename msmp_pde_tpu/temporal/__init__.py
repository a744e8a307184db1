from msmp_pde_tpu.temporal.tableaux import (
    Tableau,
    FORWARD_EULER,
    EXPLICIT_MIDPOINT,
    RK3,
    RK4,
    DOPRI45,
)
from msmp_pde_tpu.temporal.erk import erk_step, solve_fixed, solve_adaptive
