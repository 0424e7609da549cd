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


def test_bf16_mask_level_parity():
    """Deployment-dtype evidence at the MASK level (round-3 verdict item 3):
    train a tiny flagship-shaped model until its masks are structured (a
    random-init model emits speckle whose binarization is all decision
    boundary — meaningless for a parity claim), then compare the f32 and
    bf16 forwards on a PADDED input: the deployment-selected query's
    binarized mask must flip <0.5% of pixels and keep IoU(f32,bf16) > 0.99.
    Calibration run (BASELINE.md round 4): flip rate 0.0%, IoU 1.0."""
    from tce_rvos_tpu.config import TrainConfig
    from tce_rvos_tpu.infer import select_query
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = ModelConfig(
        enc_layers=1, dec_layers=2, dim_feedforward=32, binary=True,
        f_token=2, qtrans=True, with_box_refine=True,
        text_encoder_layers=1, text_encoder_hidden=32, text_encoder_heads=2,
        text_encoder_intermediate=64, num_frames=2, dropout=0.0,
    )
    tcfg = TrainConfig(lr=1e-3)
    model = build_model(cfg)
    b, t, h, w = 1, 2, 64, 96
    inputs = example_inputs(cfg, b=b, t=t, hw=(h, w), text_len=8)
    # structured scene: bright box on dark background; GT mask = the box
    video = np.full((b, t, h, w, 3), -1.0, np.float32)
    video[:, :, 16:48, 24:72] = 1.0
    inputs["video"] = jnp.asarray(video)
    gt = np.zeros((b, t, h, w), np.float32)
    gt[:, :, 16:48, 24:72] = 1.0
    batch = dict(inputs)
    batch["targets"] = {
        "labels": np.zeros((b, t), np.int32),
        "boxes": np.asarray([[[0.5, 0.5, 0.5, 0.5]] * t] * b, np.float32),
        "masks": gt,
        "valid": np.ones((b, t), np.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(model.apply, tx, criterion_from_configs(cfg, tcfg)))
    rng = jax.random.PRNGKey(1)
    for _ in range(150):
        rng, r = jax.random.split(rng)
        state, _ = step(state, batch, r)
    variables = {"params": state.params, **state.frozen}

    fwd = jax.jit(lambda v, kw: model.apply(v, **kw))
    # padded inference shape: (60, 92) model size inside the (64, 96) pad
    pad_inputs = dict(inputs)
    mask = np.zeros((b, t, h, w), bool)
    mask[:, :, 60:, :] = True
    mask[:, :, :, 92:] = True
    pad_inputs["video_mask"] = jnp.asarray(mask)
    pad_inputs["sizes"] = jnp.asarray([[60, 92]] * b, np.int32)

    out32 = fwd(variables, pad_inputs)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    v16, i16 = apply_compute_dtype(cfg16, variables, pad_inputs)
    out16 = fwd(v16, i16)

    m32 = np.asarray(out32["pred_masks"], np.float32)
    m16 = np.asarray(out16["pred_masks"], np.float32)
    q = select_query(np.asarray(out32["pred_logits"])[0])
    b32 = m32[0, :, q] > 0
    b16_ = m16[0, :, q] > 0
    area = b32.sum()
    assert area > 0, "trained model emits an empty mask — test is degenerate"
    flip_rate = (b32 != b16_).mean()
    assert flip_rate < 0.005, f"bf16 flips {flip_rate:.2%} of pixels"
    inter = (b32 & b16_).sum()
    union = (b32 | b16_).sum()
    assert inter / union > 0.99, (inter, union)
