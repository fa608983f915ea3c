from sig_sdp_mmw_tpu.env.env import WirelessEnv, EnvParams  # noqa: F401
from sig_sdp_mmw_tpu.env.mob import MobileEnv, Controller  # noqa: F401
