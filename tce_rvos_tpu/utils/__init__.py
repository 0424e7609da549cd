from tce_rvos_tpu.utils import boxes, interpolate, nested  # noqa: F401
