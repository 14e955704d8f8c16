from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings  # noqa: F401
from rav1e_tpu.api.context import Context, EncoderStatus, Packet  # noqa: F401
