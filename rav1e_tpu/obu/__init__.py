from rav1e_tpu.obu.bitio import BitWriter, leb128  # noqa: F401
