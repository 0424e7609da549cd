"""Training-loop smoke test: collate -> jitted train step -> engine loop.
Verifies losses are finite, params update, LR tiers classify correctly, and
checkpoints round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tce_rvos_tpu.config import ModelConfig, TrainConfig


pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

TINY = dict(
    enc_layers=1, dec_layers=2, dim_feedforward=32, binary=True,
    text_encoder_layers=1, text_encoder_hidden=32, text_encoder_heads=2,
    text_encoder_intermediate=64, num_frames=2, dropout=0.0,
)


def _make_batch(b=1, t=2, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "video": rng.randn(b, t, h, w, 3).astype(np.float32),
        "video_mask": np.zeros((b, t, h, w), bool),
        "text_ids": rng.randint(3, 1000, (b, 8)).astype(np.int32),
        "text_attn_mask": np.ones((b, 8), np.int32),
        "sizes": np.asarray([[h, w]] * b, np.int32),
        "targets": {
            "labels": np.zeros((b, t), np.int32),
            "boxes": rng.rand(b, t, 4).astype(np.float32),
            "masks": (rng.rand(b, t, h, w) > 0.5).astype(np.float32),
            "valid": np.ones((b, t), np.int32),
        },
    }


def test_train_two_steps_updates_params():
    from tce_rvos_tpu.engine import train_one_epoch
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = ModelConfig(**TINY)
    tcfg = TrainConfig()
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(model.apply, tx, criterion_from_configs(cfg, tcfg)))

    batches = [_make_batch(seed=i) for i in range(2)]
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    new_state, stats = train_one_epoch(
        state, step, iter(batches), epoch=0, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(stats["loss"])
    assert stats["grad_norm"] > 0
    for name in ("loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice"):
        assert name in stats
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(new_state.step) == 2


def test_param_group_classification():
    from tce_rvos_tpu.parallel.train_step import param_group

    tcfg = TrainConfig()
    assert param_group("backbone/layer1_0/conv1/kernel", tcfg) == "backbone"
    assert param_group("text_encoder/layer_0/attention_self/query/kernel", tcfg) == "text_encoder"
    assert param_group("transformer/reference_points/kernel", tcfg) == "linear_proj"
    assert param_group(
        "transformer/encoder_layers_0/self_attn/sampling_offsets/kernel", tcfg
    ) == "linear_proj"
    assert param_group("class_embed/kernel", tcfg) == "base"


def test_multistep_schedule_drops():
    from tce_rvos_tpu.parallel.train_step import multistep_schedule

    tcfg = TrainConfig(lr=1.0, lr_drop=(2, 4))
    sched = multistep_schedule(1.0, tcfg, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(25)) == pytest.approx(0.1)
    assert float(sched(45)) == pytest.approx(0.01)


def test_native_checkpoint_roundtrip(tmp_path):
    from tce_rvos_tpu.utils.native_ckpt import load_checkpoint, save_checkpoint

    variables = {"params": {"a": jnp.ones((3,)), "b": {"c": jnp.arange(4.0)}}}
    save_checkpoint(str(tmp_path / "ck"), variables, epoch=3, step=7)
    loaded, _, meta = load_checkpoint(str(tmp_path / "ck"), variables)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["b"]["c"]), np.arange(4.0))
    assert meta["epoch"] == 3 and meta["step"] == 7


def test_cli_roundtrip_flagship_flags():
    from tce_rvos_tpu.cli import get_args_parser, model_config_from_args

    args = get_args_parser().parse_args(
        ["--with_box_refine", "--binary", "--f_token", "8", "--qtrans", "--masks"]
    )
    cfg = model_config_from_args(args)
    assert cfg.with_box_refine and cfg.binary and cfg.f_token == 8 and cfg.qtrans
    assert cfg.vlblock is True  # store_false default ON (reference footgun)
    assert cfg.num_classes == 1
    args2 = get_args_parser().parse_args(["--vlblock"])
    assert model_config_from_args(args2).vlblock is False


def test_train_step_with_remat_policy():
    """use_checkpoint=True remats every transformer layer with the
    save-MSDA-outputs policy (the flagship train shape OOMs 16G HBM without
    remat) — the rematted step must still produce finite losses and update
    the encoder params."""
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = ModelConfig(**TINY, f_token=2, qtrans=True, with_box_refine=True,
                      use_checkpoint=True)
    tcfg = TrainConfig()
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg)
    step = jax.jit(make_train_step(model.apply, tx, criterion_from_configs(cfg, tcfg)))

    new_state, metrics = step(state, _make_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    enc0 = jax.tree_util.tree_leaves(
        state.params["transformer"]["encoder_layers_0"]
    )[0]
    enc1 = jax.tree_util.tree_leaves(
        new_state.params["transformer"]["encoder_layers_0"]
    )[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))


def test_mixed_precision_train_step():
    """compute_dtype="bfloat16" trains with bf16 forward/backward but f32
    master params: one step must keep params f32, update them, and produce
    a loss close to the f32 step's (bf16-scale tolerance)."""
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = ModelConfig(**TINY)
    tcfg = TrainConfig()
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg)
    crit = criterion_from_configs(cfg, tcfg)
    step32 = jax.jit(make_train_step(model.apply, tx, crit))
    step16 = jax.jit(make_train_step(
        model.apply, tx, crit, compute_dtype="bfloat16"
    ))

    batch = _make_batch(seed=0)
    rng = jax.random.PRNGKey(1)
    s32, m32 = step32(state, batch, rng)
    s16, m16 = step16(state, batch, rng)
    assert np.isfinite(m16["loss"]) and m16["grad_norm"] > 0
    # master params stay f32 and actually move
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == np.float32
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(s16.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # bf16 taps: losses agree at bf16 scale
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.05 * max(
        abs(float(m32["loss"])), 1.0
    )

