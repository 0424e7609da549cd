"""One-off: count the flagship model's USEFUL forward/train FLOPs.

Uses XLA's cost analysis on the *gather-oracle* MSDA build
(msda_impl="xla"), where deformable attention is counted at its true
4*L*P-taps-per-query arithmetic — NOT the Pallas dense-separable blowup
(whose executed FLOPs are a design choice, not useful work). The resulting
number is hardcoded into bench.py's MFU report with this script as the
derivation.

Run on CPU (cost analysis is backend-independent for flops):
  JAX_PLATFORMS=cpu python scripts/count_flops.py
"""

import sys

import jax
import jax.numpy as jnp

T, H, W = 5, 384, 640


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8,
                      qtrans=True, msda_impl="xla")
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    @jax.jit
    def fwd(variables, **kw):
        return model.apply(variables, **kw)["pred_masks"].sum()

    c = jax.jit(fwd).lower(variables, **inputs).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    print(f"forward useful flops: {c['flops']:.4e}")

    def loss_fn(v, **kw):
        out = model.apply(v, **kw)
        return out["pred_masks"].astype(jnp.float32).sum()

    @jax.jit
    def step(variables, **kw):
        return jax.value_and_grad(loss_fn)(variables, **kw)

    c2 = step.lower(variables, **inputs).compile().cost_analysis()
    if isinstance(c2, list):
        c2 = c2[0]
    print(f"fwd+bwd useful flops: {c2['flops']:.4e}")


if __name__ == "__main__":
    main()
