"""Checkpoint-ingestion tests: every flax leaf maps to a reference torch key,
and converted weights are *functionally* equivalent (same outputs as the
torch modules they came from)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import traverse_util

from tce_rvos_tpu.config import ModelConfig
from tce_rvos_tpu.models.build import build_model, example_inputs
from tce_rvos_tpu.models.layers import MultiheadAttention
from tce_rvos_tpu.models.text_encoder import RobertaModel
from tce_rvos_tpu.utils.checkpoint import (
    convert_state_dict,
    drop_class_heads,
    flax_to_torch_key,
)


pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

TINY = dict(enc_layers=2, dec_layers=2, dim_feedforward=64, binary=True,
            text_encoder_layers=2, text_encoder_hidden=64,
            text_encoder_heads=4, text_encoder_intermediate=128)


def test_every_param_maps_to_torch_key():
    """Full coverage of the name map for the flagship-shaped config."""
    cfg = ModelConfig(**TINY, with_box_refine=True, f_token=4, qtrans=True)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    flat = traverse_util.flatten_dict(variables, sep="/")
    unmapped = [p for p in flat if flax_to_torch_key(p) is None]
    assert unmapped == [], f"unmapped params: {unmapped[:20]}"


def test_mha_matches_torch_after_conversion():
    torch.manual_seed(0)
    c, h, b, sq, sk = 32, 4, 2, 5, 7
    tmha = torch.nn.MultiheadAttention(c, h, dropout=0.0, batch_first=True)
    q = torch.randn(b, sq, c)
    k = torch.randn(b, sk, c)
    v = torch.randn(b, sk, c)
    kpm = torch.zeros(b, sk, dtype=torch.bool)
    kpm[:, -2:] = True
    with torch.no_grad():
        ref, _ = tmha(q, k, v, key_padding_mask=kpm)

    mha = MultiheadAttention(c, h, 0.0)
    variables = mha.init(
        jax.random.PRNGKey(0), jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
    )
    sd = {f"x.{kk}": vv.detach().numpy() for kk, vv in tmha.state_dict().items()}
    # reuse the _mha mapping through convert: manually overlay
    from tce_rvos_tpu.utils.checkpoint import _mha

    flat = traverse_util.flatten_dict(variables, sep="/")
    new_flat = {}
    for path, leaf in flat.items():
        res = _mha("params", "x", path)
        assert res is not None, path
        tkey, tr = res
        new_flat[path] = jnp.asarray(tr(sd[tkey]))
    variables = traverse_util.unflatten_dict(new_flat, sep="/")
    ours = mha.apply(
        variables, jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()), key_padding_mask=jnp.asarray(kpm.numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_roberta_matches_hf_torch():
    """Our flax RoBERTa == HuggingFace torch RobertaModel with the same
    (random) weights, through the converter's text_encoder mapping."""
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=40,
        type_vocab_size=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,  # the real roberta-base config value
    )
    torch.manual_seed(1)
    hf = HFRoberta(hf_cfg).eval()

    ids = torch.tensor([[0, 9, 17, 23, 2, 1, 1, 1], [0, 40, 50, 60, 70, 80, 2, 1]])
    attn = (ids != 1).long()
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=attn)

    ours_mod = RobertaModel(
        vocab_size=120, hidden=32, layers=2, heads=4, intermediate=64,
        max_positions=40, dropout=0.0,
    )
    variables = jax.jit(ours_mod.init)(
        jax.random.PRNGKey(0), jnp.asarray(ids.numpy()), jnp.asarray(attn.numpy())
    )
    sd = {
        f"text_encoder.{k}": v.detach().numpy() for k, v in hf.state_dict().items()
    }
    # wrap our variables under text_encoder/ so the standard mapping applies
    wrapped = {"params": {"text_encoder": variables["params"]}}
    new_vars, missing, unexpected = convert_state_dict(sd, wrapped, verbose=False)
    assert missing == [], missing[:10]
    variables = {"params": new_vars["params"]["text_encoder"]}
    hidden, pooled = jax.jit(ours_mod.apply)(
        variables, jnp.asarray(ids.numpy()), jnp.asarray(attn.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), rtol=1e-4, atol=1e-4
    )


def _synthetic_torch_sd(variables):
    """Synthetic torch state_dict with exactly the keys/shapes the mapping
    expects (inverse transforms probed per-leaf)."""
    flat = traverse_util.flatten_dict(variables, sep="/")

    rng = np.random.RandomState(0)
    sd = {}
    for path, leaf in flat.items():
        tkey, tr = flax_to_torch_key(path)
        if tkey in sd:
            continue
        # build a torch-side array whose transform has the right shape:
        # invert the known transforms by probing
        shape = np.asarray(leaf).shape
        if tr.__name__ == "_t":
            sd[tkey] = rng.randn(*shape[::-1]).astype(np.float32)
        elif tr.__name__ == "_conv":
            kh, kw, i, o = shape
            sd[tkey] = rng.randn(o, i, kh, kw).astype(np.float32)
        elif tr.__name__ == "_id":
            sd[tkey] = rng.randn(*shape).astype(np.float32)
        else:  # packed MHA slices: allocate 3x rows once
            if "in_proj_weight" in tkey:
                c = shape[0]
                sd[tkey] = rng.randn(3 * c, c).astype(np.float32)
            elif "in_proj_bias" in tkey:
                c = shape[0]
                sd[tkey] = rng.randn(3 * c).astype(np.float32)
            else:
                raise AssertionError((path, tkey))
    return sd


def test_convert_full_model_with_synthetic_checkpoint():
    """Convert a synthetic reference-format state_dict and check strict load."""
    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    sd = _synthetic_torch_sd(variables)
    new_vars, missing, unexpected = convert_state_dict(sd, variables, verbose=False)
    assert missing == []
    assert unexpected == []
    # spot-check a transpose actually happened
    key = "params/transformer/reference_points/kernel"
    got = traverse_util.flatten_dict(new_vars, sep="/")[key]
    np.testing.assert_allclose(
        np.asarray(got), sd["transformer.reference_points.weight"].T
    )


def test_resume_from_torch_pth(tmp_path):
    """--resume accepts a reference-format torch .pth (main.py:180-196):
    load_any_checkpoint sniffs the format, converts the state dict, and
    surfaces the stored epoch so training continues at epoch+1."""
    from tce_rvos_tpu.utils.native_ckpt import load_any_checkpoint

    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    sd = _synthetic_torch_sd(variables)
    pth = tmp_path / "checkpoint0003.pth"
    torch.save(
        {"model": {k: torch.from_numpy(v) for k, v in sd.items()}, "epoch": 3},
        pth,
    )

    new_vars, opt_state, meta = load_any_checkpoint(str(pth), variables)
    assert opt_state is None
    assert meta["epoch"] == 3
    key = "params/transformer/reference_points/kernel"
    got = traverse_util.flatten_dict(new_vars, sep="/")[key]
    np.testing.assert_allclose(
        np.asarray(got), sd["transformer.reference_points.weight"].T
    )


def test_drop_class_heads():
    sd = {"class_embed.0.weight": np.zeros(2), "other": np.ones(1)}
    out = drop_class_heads(sd)
    assert "class_embed.0.weight" not in out and "other" in out


def test_export_roundtrip():
    """flax -> torch state_dict -> flax must be the identity."""
    cfg = ModelConfig(**TINY, with_box_refine=True, f_token=2, qtrans=True)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), **inputs)
    from tce_rvos_tpu.utils.checkpoint import export_state_dict

    sd = export_state_dict(variables)
    back, missing, unexpected = convert_state_dict(sd, variables, verbose=False)
    assert missing == [] and unexpected == []
    flat_a = traverse_util.flatten_dict(variables, sep="/")
    flat_b = traverse_util.flatten_dict(back, sep="/")
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


@pytest.mark.parametrize("family", ["swin", "x3d", "video_swin"])
def test_backbone_param_mapping_coverage(family):
    """Every backbone param leaf maps to a torch key (swin/video-swin/x3d
    families; resnet covered by the full-model test)."""
    if family == "swin":
        from tce_rvos_tpu.models.swin import SwinBackbone, swin_spec

        mod = SwinBackbone(spec=swin_spec("swin_t_p4w7"))
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    elif family == "video_swin":
        from tce_rvos_tpu.models.video_swin import VideoSwinBackbone, video_swin_spec

        mod = VideoSwinBackbone(spec=video_swin_spec("video_swin_t_p4w7"))
        x = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    else:
        from tce_rvos_tpu.models.x3d import X3DBackbone, x3d_spec

        mod = X3DBackbone(spec=x3d_spec("x3d_s"))
        x = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)

    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    # namespace like the full model does (backbone submodule)
    wrapped = {
        col: {"backbone": tree} for col, tree in variables.items()
    }
    flat = traverse_util.flatten_dict(wrapped, sep="/")
    unmapped = [p for p in flat if flax_to_torch_key(p) is None]
    assert unmapped == [], f"unmapped {family} params: {unmapped[:15]}"
