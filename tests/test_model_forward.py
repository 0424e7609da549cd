"""End-to-end forward smoke tests for the assembled model in all TCE
configurations (base, FTF, IQT, box refine, flagship)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tce_rvos_tpu.config import ModelConfig, flagship_config
from tce_rvos_tpu.models.build import build_model, example_inputs

SMALL = dict(
    enc_layers=2,
    dec_layers=2,
    dim_feedforward=64,
    binary=True,
    text_encoder_layers=2,
    text_encoder_hidden=64,
    text_encoder_heads=4,
    text_encoder_intermediate=128,
)



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

def _tiny_cfg(**kw):
    base = dict(SMALL)
    base.update(kw)
    return ModelConfig(**base)


def _run(cfg, b=1, t=2, hw=(64, 96)):
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=b, t=t, hw=hw)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    out = jax.jit(lambda v, **i: model.apply(v, **i))(variables, **inputs)
    return out, (b, t, hw)


@pytest.mark.parametrize(
    "cfg_kw",
    [
        dict(),
        dict(with_box_refine=True, f_token=4, qtrans=True),  # flagship shape
        dict(vlblock=False, vis_loss=True, contrastive=True),
        dict(f_token=-1),
        # temporal-trilinear MSDA in encoder/decoder (reference is_3d branch)
        dict(msda_3d=True, with_box_refine=True, qtrans=True),
    ],
)
def test_forward_shapes(cfg_kw):
    cfg = _tiny_cfg(**cfg_kw)
    out, (b, t, (h, w)) = _run(cfg)
    q, k = cfg.num_queries, cfg.num_classes
    assert out["pred_logits"].shape == (b, t, q, k)
    assert out["pred_boxes"].shape == (b, t, q, 4)
    assert out["pred_masks"].shape == (b, t, q, h // 4, w // 4)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()
    if cfg.aux_loss:
        assert len(out["aux_outputs"]) == cfg.dec_layers - 1
    if cfg.vis_loss:
        assert out["pred_visible"].shape == (b, t, q, 1)
    if cfg.contrastive:
        assert out["contrastive"].shape == (b, t)


def test_valid_indices_selects_single_frame():
    cfg = _tiny_cfg(dataset_file="a2d")
    from tce_rvos_tpu.models.build import example_inputs

    model = build_model(cfg)
    inputs = example_inputs(cfg, b=2, t=3, hw=(64, 64))
    inputs["valid_indices"] = jnp.asarray([1, 2], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    out = jax.jit(lambda v, **i: model.apply(v, **i))(variables, **inputs)
    assert out["pred_logits"].shape[1] == 1  # t -> 1


def test_forward_jits_and_is_deterministic():
    cfg = _tiny_cfg(f_token=2, qtrans=True, with_box_refine=True)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    fwd = jax.jit(lambda v, **i: model.apply(v, **i))
    o1 = fwd(variables, **inputs)
    o2 = fwd(variables, **inputs)
    np.testing.assert_array_equal(
        np.asarray(o1["pred_masks"]), np.asarray(o2["pred_masks"])
    )


def test_pallas_impl_numeric_parity_with_xla():
    """Same parameters through BOTH msda_impl paths must produce the same
    model outputs (bf16-tap tolerance): the pallas path's head-major
    projections, raw-encoder pack and in-kernel softmax/coords are layout
    optimizations, not semantic changes."""
    from jax.experimental.pallas import tpu as pltpu

    base = dict(
        enc_layers=1, dec_layers=1, dim_feedforward=32, binary=True,
        text_encoder_layers=1, text_encoder_hidden=32, text_encoder_heads=2,
        text_encoder_intermediate=64, num_frames=2, f_token=2, qtrans=True,
        with_box_refine=True,
    )
    cfg_x = ModelConfig(msda_impl="xla", **base)
    cfg_p = ModelConfig(msda_impl="pallas", **base)
    model_x, model_p = build_model(cfg_x), build_model(cfg_p)
    inputs = example_inputs(cfg_x, b=1, t=2, hw=(32, 32))
    rng = jax.random.PRNGKey(2)
    variables = jax.jit(model_x.init)(rng, **inputs)
    out_x = jax.jit(lambda v, **i: model_x.apply(v, **i))(variables, **inputs)
    with pltpu.force_tpu_interpret_mode():
        out_p = jax.jit(lambda v, **i: model_p.apply(v, **i))(
            variables, **inputs
        )
    for k in ("pred_logits", "pred_boxes", "pred_masks"):
        a, b = np.asarray(out_x[k]), np.asarray(out_p[k])
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 0.03 * scale, (k, np.abs(a - b).max())


def test_pallas_impl_param_tree_matches_xla():
    """The pallas path's head-major value projection must declare the SAME
    parameter tree as the xla path's nn.Dense (checkpoint compatibility:
    value_proj/{kernel,bias} with identical shapes)."""
    import jax
    import numpy as np
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs

    base = dict(
        enc_layers=1, dec_layers=1, dim_feedforward=32, binary=True,
        text_encoder_layers=1, text_encoder_hidden=32, text_encoder_heads=2,
        text_encoder_intermediate=64, num_frames=2, f_token=2, qtrans=True,
    )
    trees = {}
    for impl in ("xla", "pallas"):
        cfg = ModelConfig(msda_impl=impl, **base)
        model = build_model(cfg)
        inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
        if impl == "pallas":
            # init only traces shapes; run the pallas kernels interpreted
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                v = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
        else:
            v = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
        trees[impl] = jax.tree_util.tree_map(lambda x: x.shape, v)
    assert trees["xla"] == trees["pallas"]


def test_group_norm_matches_flax():
    """models/layers.py::GroupNorm computes nn.GroupNorm's statistics with
    layout-native reductions; outputs must agree (f32 exactly, bf16 to one
    ulp — ours normalizes in f32)."""
    from flax import linen as nn

    from tce_rvos_tpu.models.layers import GroupNorm

    key = jax.random.PRNGKey(3)
    for shape, g in [((2, 12, 20, 256), 8), ((3, 7, 9, 64), 32)]:
        x = jax.random.normal(key, shape, jnp.float32) * 3 + 1.7
        ref = nn.GroupNorm(num_groups=g)
        new = GroupNorm(num_groups=g)
        variables = ref.init(key, x)
        variables = jax.tree.map(
            lambda a: a + jax.random.normal(key, a.shape) * 0.3, variables
        )
        np.testing.assert_allclose(
            ref.apply(variables, x), new.apply(variables, x), atol=5e-5
        )
        xb = x.astype(jnp.bfloat16)
        vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
        np.testing.assert_allclose(
            ref.apply(vb, xb).astype(np.float32),
            new.apply(vb, xb).astype(np.float32),
            atol=3e-2,
        )
