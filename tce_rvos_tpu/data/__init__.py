from tce_rvos_tpu.data.registry import build_dataset  # noqa: F401
