"""Training-parity flags: --pretrain_enc freeze (reference main.py:57-61)
and keep_fps CyclicLR (main.py:241-249)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tce_rvos_tpu.config import TrainConfig
from tce_rvos_tpu.parallel.train_step import cyclic_schedule, make_optimizer


def _fake_params():
    return {
        "backbone": {"stem": {"kernel": jnp.ones((2, 2))}},
        "text_encoder": {"layer_0": {"query": {"kernel": jnp.ones((2, 2))}}},
        "transformer": {
            "encoder_layers_0": {"ffn": {"kernel": jnp.ones((2, 2))}},
            "memory_bus": jnp.ones((2, 2)),
            "decoder_layers_0": {"self_attn": {"kernel": jnp.ones((2, 2))}},
        },
        "class_embed": {"kernel": jnp.ones((2, 2))},
    }


def _one_update(cfg):
    params = _fake_params()
    tx = make_optimizer(params, cfg, steps_per_epoch=4)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates)


def test_pretrain_enc_freezes_everything_but_encoder():
    new = _one_update(TrainConfig(pretrain_enc=True))
    ref = _fake_params()
    # encoder-owned params move...
    enc = new["transformer"]["encoder_layers_0"]["ffn"]["kernel"]
    bus = new["transformer"]["memory_bus"]
    assert not np.allclose(enc, ref["transformer"]["encoder_layers_0"]["ffn"]["kernel"])
    assert not np.allclose(bus, ref["transformer"]["memory_bus"])
    # ...nothing else does (reference main.py:57-61)
    for path in (
        ("backbone", "stem", "kernel"),
        ("text_encoder", "layer_0", "query", "kernel"),
        ("transformer", "decoder_layers_0", "self_attn", "kernel"),
        ("class_embed", "kernel"),
    ):
        v = new
        r = ref
        for k in path:
            v, r = v[k], r[k]
        assert np.allclose(v, r), path


def test_without_pretrain_enc_everything_moves():
    new = _one_update(TrainConfig())
    ref = _fake_params()
    assert not np.allclose(new["class_embed"]["kernel"], ref["class_embed"]["kernel"])
    assert not np.allclose(
        new["backbone"]["stem"]["kernel"], ref["backbone"]["stem"]["kernel"]
    )


def test_cyclic_schedule_triangular():
    lo, hi, half = 1e-5, 1e-4, 10
    sched = cyclic_schedule(lo, hi, half)
    assert float(sched(0)) == pytest.approx(lo)
    assert float(sched(half)) == pytest.approx(hi)
    assert float(sched(2 * half)) == pytest.approx(lo)  # full period
    assert float(sched(half // 2)) == pytest.approx((lo + hi) / 2)
    assert float(sched(3 * half)) == pytest.approx(hi)  # periodic


def test_cyclic_lr_used_when_enabled():
    cfg = TrainConfig(cyclic_lr=True, cyclic_lr_boundary=(0.0, 1.0))
    params = {"class_embed": {"kernel": jnp.ones((2, 2))}}
    tx = make_optimizer(params, cfg, steps_per_epoch=4)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step 0: cyclic lr == lo == 0.0 -> adamw update is exactly zero
    updates, _ = tx.update(grads, opt_state, params)
    assert np.allclose(updates["class_embed"]["kernel"], 0.0)
