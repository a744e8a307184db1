from msmp_pde_tpu.equations.base import PDE
from msmp_pde_tpu.equations.ce import CE
from msmp_pde_tpu.equations.ad import AD
from msmp_pde_tpu.equations.kf import KF
from msmp_pde_tpu.equations.we import WE
from msmp_pde_tpu.equations.ks import KS
