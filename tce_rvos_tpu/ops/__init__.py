from tce_rvos_tpu.ops.msda import (  # noqa: F401
    ms_deform_attn,
    ms_deform_attn_3d,
)
