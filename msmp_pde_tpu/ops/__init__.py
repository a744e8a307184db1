from msmp_pde_tpu.ops.fd import (
    periodic_pad,
    correlate1d,
    fdm_first_derivative,
    fdm_second_derivative,
    fdm_third_derivative,
    fdm_fourth_derivative,
    weno_pad,
    weno_reconstruct,
    weno_godunov,
    weno_laxfriedrichs,
)
