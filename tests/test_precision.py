"""bf16 inference fast path: boundary param/input cast (utils/precision.py).

Checks that the cast actually sticks (the feature path isn't silently
re-promoted to f32 by pos encodings or constants), that coordinate math
stays f32 by design, and that bf16 outputs track the f32 oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tce_rvos_tpu.config import ModelConfig
from tce_rvos_tpu.models.build import build_model, example_inputs
from tce_rvos_tpu.utils.precision import apply_compute_dtype, cast_floating



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        enc_layers=2, dec_layers=2, dim_feedforward=64, binary=True,
        f_token=4, qtrans=True, with_box_refine=True,
        text_encoder_layers=2, text_encoder_hidden=64,
        text_encoder_heads=4, text_encoder_intermediate=128,
    )
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(64, 96))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    fwd = jax.jit(lambda v, kw: model.apply(v, **kw))
    return cfg, fwd, variables, inputs


def test_cast_floating_leaves_ints():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = cast_floating(tree, "bfloat16")
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def test_bf16_path_tracks_f32_oracle(setup):
    cfg, fwd, variables, inputs = setup
    out32 = fwd(variables, inputs)

    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    v16, i16 = apply_compute_dtype(cfg16, variables, inputs)
    out16 = fwd(v16, i16)

    # the cast sticks: class logits come off a bf16 feature path...
    assert out16["pred_logits"].dtype == jnp.bfloat16
    # ...while box coordinates are pinned to f32 by design
    assert out16["pred_boxes"].dtype == jnp.float32

    m32 = np.asarray(out32["pred_masks"], np.float32).ravel()
    m16 = np.asarray(out16["pred_masks"], np.float32).ravel()
    assert np.isfinite(m16).all()
    corr = np.corrcoef(m32, m16)[0, 1]
    assert corr > 0.98, f"mask-logit correlation {corr}"

    b32 = np.asarray(out32["pred_boxes"], np.float32)
    b16 = np.asarray(out16["pred_boxes"], np.float32)
    np.testing.assert_allclose(b16, b32, atol=0.03)
