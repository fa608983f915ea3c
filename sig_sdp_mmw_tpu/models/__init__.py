from sig_sdp_mmw_tpu.models.base import SDPSolverBase  # noqa: F401
from sig_sdp_mmw_tpu.models.mmw import MMW, mmw_solve  # noqa: F401
from sig_sdp_mmw_tpu.models.rounding import (  # noqa: F401
    rounding,
    rounding_one_attempt,
    verify_assignment,
)
from sig_sdp_mmw_tpu.models.search import BinarySearchRelaxation  # noqa: F401
from sig_sdp_mmw_tpu.models.baselines import RandSDPSolver, SpectralSDPSolver  # noqa: F401
from sig_sdp_mmw_tpu.models.admm import ADMMSDPSolver  # noqa: F401
from sig_sdp_mmw_tpu.models.lrp import LRPSolver  # noqa: F401
from sig_sdp_mmw_tpu.models.heuristics import MAX_GAIN, MAX_ASSO, MAX_RAND  # noqa: F401
from sig_sdp_mmw_tpu.models.heuristics_ell import (  # noqa: F401
    MAX_ASSO_ELL,
    MAX_GAIN_ELL,
    MAX_RAND_ELL,
)
