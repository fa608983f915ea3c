from sig_sdp_mmw_tpu.parallel.mesh import make_mesh  # noqa: F401
from sig_sdp_mmw_tpu.parallel.batch import (  # noqa: F401
    stack_states,
    solve_scenarios_batched,
    ParallelProbeSearch,
    ParallelProbeSearchEll,
)
