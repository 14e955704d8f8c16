from rav1e_tpu.utils.frame import Frame, Plane  # noqa: F401
