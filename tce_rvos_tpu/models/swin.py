"""Swin Transformer backbone (T/S/B/L), channel-last flax.

Capability parity with reference models/swin_transformer.py (hierarchical
windowed attention with relative position bias, shifted windows, patch
merging, per-out-stage LayerNorm), rebuilt for XLA:

  * H/W are static under jit, so the shifted-window attention mask is a
    compile-time numpy constant (the reference rebuilds it per forward on
    device, swin_transformer.py:370-390);
  * window partition/reverse are pure reshapes+transposes;
  * stochastic depth (DropPath) is applied per-sample when training;
  * ``use_checkpoint`` maps to jax.checkpoint (remat) over each block.

Torch checkpoint keys (backbone.0.body.patch_embed.*, .layers.{i}.blocks.{j}
.*, .norm{i}.*) map via utils/checkpoint.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _rel_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [wh*ww, wh*ww]


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Static attention bias [nW, ws*ws, ws*ws] with 0 / -100 entries
    (semantics of reference BasicLayer.forward :366-390)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = (
        img.reshape(hp // window, window, wp // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C]"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowAttention(nn.Module):
    dim: int
    window: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, bias_mask=None, deterministic: bool = True):
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        wh, ww = self.window
        table = self.param(
            "relative_position_bias_table",
            trunc02,
            ((2 * wh - 1) * (2 * ww - 1), h),
        )
        idx = _rel_position_index(wh, ww).reshape(-1)
        rel_bias = table[idx].reshape(wh * ww, wh * ww, h).transpose(2, 0, 1)
        attn = attn + rel_bias[None]

        if bias_mask is not None:
            nw = bias_mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + bias_mask[None, :, None]
            attn = attn.reshape(b_, h, n, n)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    deterministic: bool = True  # static field so remat needs no static args

    @nn.compact
    def __call__(self, x):
        deterministic = self.deterministic
        b, h, w, c = x.shape
        ws = self.window
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)

        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            bias_mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, self.shift))
        else:
            bias_mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(
            self.dim, (ws, ws), self.num_heads, self.qkv_bias, self.qk_scale,
            self.attn_drop, self.drop, name="attn",
        )(xw, bias_mask, deterministic)
        x = window_reverse(xw, ws, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        if pad_r or pad_b:
            x = x[:, :h, :w]

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic)

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.Dense(c, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        return x + dp(y, deterministic)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


SWIN_CONFIGS = {
    # parity with reference swin_transformer.py:687-745
    "swin_t_p4w7": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), drop_path_rate=0.2),
    "swin_s_p4w7": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), drop_path_rate=0.2),
    "swin_b_p4w7": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), drop_path_rate=0.3),
    "swin_l_p4w7": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), drop_path_rate=0.3),
}


def swin_spec(name: str) -> dict:
    cfg = SWIN_CONFIGS[name]
    return dict(
        **cfg,
        window_size=7,
        strides=[4, 8, 16, 32],
        channels=[cfg["embed_dim"] * 2**i for i in range(4)],
    )


class SwinBackbone(nn.Module):
    """Image Swin: [N, H, W, 3] -> 4 feature maps (strides 4/8/16/32), each
    LayerNorm'd (reference out_indices=(0,1,2,3))."""

    spec: dict
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        spec = self.spec
        embed_dim = spec["embed_dim"]
        depths = spec["depths"]
        heads = spec["num_heads"]
        window = spec["window_size"]

        # patch embed: pad to multiple of 4, conv 4x4/4, LN
        h, w = x.shape[1], x.shape[2]
        ph, pw = (-h) % 4, (-w) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4), name="patch_embed_proj")(x)
        x = nn.LayerNorm(name="patch_embed_norm")(x)

        dpr = np.linspace(0, spec["drop_path_rate"], sum(depths)).tolist()
        outs = []
        cur = 0
        dim = embed_dim
        block_cls = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock
        for i, depth in enumerate(depths):
            for j in range(depth):
                x = block_cls(
                    dim=dim,
                    num_heads=heads[i],
                    window=window,
                    shift=0 if j % 2 == 0 else window // 2,
                    drop_path=dpr[cur + j],
                    deterministic=deterministic,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            cur += depth
            outs.append(nn.LayerNorm(name=f"out_norm_{i}")(x))
            if i < len(depths) - 1:
                x = PatchMerging(dim, name=f"layers_{i}_downsample")(x)
                dim *= 2
        return tuple(outs)
