from rav1e_tpu.ec.msac import MsacEncoder, MsacDecoder, update_cdf  # noqa: F401
