from sig_sdp_mmw_tpu.core.problem import (  # noqa: F401
    SigState,
    state_from_arrays,
    state_from_scipy,
    state_to_scipy,
)
from sig_sdp_mmw_tpu.core.preprocess import MMWOperands, build_mmw_operands  # noqa: F401
