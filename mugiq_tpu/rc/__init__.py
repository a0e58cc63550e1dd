from .cplx import (to_rc, from_rc, conj_rc, cmul, ceinsum, cvdot, cnorm2,
                   cscale)
from .dirac_rc import WilsonDiracRC
from .contract_rc import loop_contract_rc
from .phase_rc import momentum_project_rc
