# Model assembly entry point: tce_rvos_tpu.models.build.build_model
