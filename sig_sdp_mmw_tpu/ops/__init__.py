from sig_sdp_mmw_tpu.ops.expm import lanczos_expm_multiply, taylor_expm_multiply  # noqa: F401
from sig_sdp_mmw_tpu.ops.lanczos import lanczos_extreme_eigs  # noqa: F401
from sig_sdp_mmw_tpu.ops.rsvd import randomized_symmetric_lowrank  # noqa: F401
