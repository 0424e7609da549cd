"""Sinusoidal position encodings, channel-last.

Behavioural parity with reference models/position_encoding.py:
  * 1D (text): cumsum over valid tokens (position_encoding.py:12-45)
  * 2D (default vision): the DETR sine embedding with the reference's
    ``-0.5`` center shift inside normalize (position_encoding.py:48-84)
  * 3D (unused by the default build but part of the API surface,
    position_encoding.py:88-131)

All take a True-on-pad mask and return embeddings shaped like the input with
a trailing channel axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(pos[..., 0::2]), cos(pos[..., 1::2])) interleaved — matches
    the reference's stack+flatten."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_pos_1d(
    mask: jnp.ndarray,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """mask: [B, T] True=pad -> [B, T, num_pos_feats]."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    x_embed = jnp.cumsum(not_mask, axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    pos = x_embed[..., None] / _dim_t(num_pos_feats, temperature)
    return _interleave_sin_cos(pos)


def sine_pos_2d(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """mask: [B, H, W] True=pad -> [B, H, W, 2*num_pos_feats] (y then x)."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_pos_3d(
    mask: jnp.ndarray,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """mask: [B, T, H, W] True=pad -> [B, T, H, W, 3*num_pos_feats]
    (z, y, x)."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = (~mask).astype(jnp.float32)
    z_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    if normalize:
        eps = 1e-6
        z_embed = z_embed / (z_embed[:, -1:, :, :] + eps) * scale
        y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_z = _interleave_sin_cos(z_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    return jnp.concatenate([pos_z, pos_y, pos_x], axis=-1)
