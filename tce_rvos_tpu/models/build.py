"""Model factory — the equivalent of reference models/__init__.py:4 /
models/tce_rvos.py:638-719 ``build()``."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tce_rvos_tpu.config import ModelConfig, TrainConfig
from tce_rvos_tpu.models.referformer import ReferFormer


def build_model(cfg: ModelConfig) -> ReferFormer:
    if cfg.two_stage:
        raise ValueError("two_stage must be False (reference tce_rvos.py:102)")
    return ReferFormer(cfg=cfg)


def example_inputs(
    cfg: ModelConfig,
    b: int = 1,
    t: Optional[int] = None,
    hw: Tuple[int, int] = (64, 64),
    text_len: int = 8,
    seed: int = 0,
):
    """Random-but-valid inputs for init / smoke tests / benches."""
    t = t or cfg.num_frames
    h, w = hw
    rng = np.random.RandomState(seed)
    video = jnp.asarray(rng.randn(b, t, h, w, 3), jnp.float32)
    video_mask = jnp.zeros((b, t, h, w), bool)
    text_ids = jnp.asarray(rng.randint(3, 50000, (b, text_len)), jnp.int32)
    text_attn = jnp.ones((b, text_len), jnp.int32)
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    return dict(
        video=video,
        video_mask=video_mask,
        text_ids=text_ids,
        text_attn_mask=text_attn,
        sizes=sizes,
    )


def init_model(cfg: ModelConfig, seed: int = 0, **inp_kwargs):
    """Build + jit-init. ALWAYS init under jit: eager init dispatches
    thousands of per-op compiles (pathological on remote-compile backends)."""
    model = build_model(cfg)
    inputs = example_inputs(cfg, **inp_kwargs)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), **inputs)
    return model, variables, inputs
