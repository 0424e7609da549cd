"""Device-profile the full flagship model forward (bf16, Pallas MSDA),
aggregating the device timeline by op-name prefix."""

import sys
import tempfile

import jax

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax.numpy as jnp
import numpy as np

T, H, W = 5, 384, 640


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                      msda_impl="pallas", compute_dtype=dtype)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    @jax.jit
    def fwd(variables, **kw):
        out = model.apply(variables, **kw)
        return out["pred_masks"].sum()

    jax.block_until_ready(fwd(variables, **inputs))
    tmp = tempfile.mkdtemp()
    reps = 3
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            jax.block_until_ready(fwd(variables, **inputs))
    from _timeline import load_tpu_events, print_breakdown, self_time_aggregate

    total, agg = self_time_aggregate(load_tpu_events(tmp), reps)
    print_breakdown(total, agg, f"forward ({dtype})", top=40)


if __name__ == "__main__":
    main()
