from sig_sdp_mmw_tpu.utils.stats import StatsObject, STATS_OBJECT  # noqa: F401
from sig_sdp_mmw_tpu.utils.logging import (  # noqa: F401
    CsvWriter,
    CSV_WRITER_OBJECT,
    get_log_path_for_sim_script,
    GET_LOG_PATH_FOR_SIM_SCRIPT,
)
from sig_sdp_mmw_tpu.utils.profiling import (  # noqa: F401
    GLOBAL_PROF_ENABLER,
    annotate,
    device_trace,
    profile,
)
from sig_sdp_mmw_tpu.utils.checkpoint import SweepCheckpoint  # noqa: F401
