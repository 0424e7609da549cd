"""Video Swin Transformer backbone (t/s/b), channel-last flax.

Capability parity with reference models/video_swin_transformer.py:
  * patch_size (1,4,4) — no temporal downsampling, per-frame features
    (reference wrapper :648-650);
  * 3D windows (8,7,7) with the ``get_window_size`` shrink rule (window/shift
    clamp when an axis is smaller than the window, :71-84);
  * per-stage outputs taken *before* spatial downsampling; all 4 stages
    (wrapper :688-695);
  * 3D relative position bias + shifted-window mask, computed statically.

Checkpoint keys (Kinetics-400 surgery — temporal sum of patch-embed weights
— happens in the converter, matching reference :656-659).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tce_rvos_tpu.models.swin import DropPath, trunc02


def get_window_size(x_size, window_size, shift_size=None):
    """reference video_swin_transformer.py:71-84."""
    use_w = list(window_size)
    use_s = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_w[i] = x_size[i]
            if use_s is not None:
                use_s[i] = 0
    if use_s is None:
        return tuple(use_w)
    return tuple(use_w), tuple(use_s)


def _rel_position_index_3d(wd: int, wh: int, ww: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


def _shift_attn_mask_3d(dp, hp, wp, window, shift) -> Optional[np.ndarray]:
    img = np.zeros((dp, hp, wp), np.int32)
    cnt = 0

    def slices(size, w, s):
        if s == 0:
            return [slice(None)]
        return [slice(0, -w), slice(-w, -s), slice(-s, None)]

    for ds in slices(dp, window[0], shift[0]):
        for hs in slices(hp, window[1], shift[1]):
            for ws_ in slices(wp, window[2], shift[2]):
                img[ds, hs, ws_] = cnt
                cnt += 1
    win = (
        img.reshape(dp // window[0], window[0], hp // window[1], window[1],
                    wp // window[2], window[2])
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, window[0] * window[1] * window[2])
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition_3d(x, ws):
    b, d, h, w, c = x.shape
    x = x.reshape(
        b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c
    ).transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], c)


def window_reverse_3d(xw, ws, b, d, h, w):
    x = xw.reshape(
        b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1
    ).transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


class WindowAttention3D(nn.Module):
    dim: int
    window: Tuple[int, int, int]  # full (table) window; runtime window may shrink
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, runtime_window, bias_mask=None, deterministic=True):
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        wd, wh, ww = self.window
        table = self.param(
            "relative_position_bias_table",
            trunc02,
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h),
        )
        # the reference indexes the FULL-window table sliced [:N, :N]
        # (video_swin_transformer.py:156) when the runtime window shrank
        full_idx = _rel_position_index_3d(wd, wh, ww)
        idx = full_idx[:n, :n].reshape(-1)
        rel_bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + rel_bias[None]

        if bias_mask is not None:
            nw = bias_mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + bias_mask[None, :, None]
            attn = attn.reshape(b_, h, n, n)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(b_, n, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (8, 7, 7)
    shift: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        det = self.deterministic
        b, d, h, w, c = x.shape
        window, shift = get_window_size((d, h, w), self.window, self.shift)

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        pd = (-d) % window[0]
        pb = (-h) % window[1]
        pr = (-w) % window[2]
        if pd or pb or pr:
            x = jnp.pad(x, ((0, 0), (0, pd), (0, pb), (0, pr), (0, 0)))
        dp, hp, wp = d + pd, h + pb, w + pr

        if any(s > 0 for s in shift):
            x = jnp.roll(x, tuple(-s for s in shift), axis=(1, 2, 3))
            bias_mask = jnp.asarray(_shift_attn_mask_3d(dp, hp, wp, window, shift))
        else:
            bias_mask = None

        xw = window_partition_3d(x, window)
        xw = WindowAttention3D(
            self.dim, self.window, self.num_heads, self.qkv_bias, self.qk_scale,
            self.attn_drop, self.drop, name="attn",
        )(xw, window, bias_mask, det)
        x = window_reverse_3d(xw, window, b, dp, hp, wp)

        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift, axis=(1, 2, 3))
        if pd or pb or pr:
            x = x[:, :d, :h, :w]

        dp_mod = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp_mod(x, det)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=det)
        y = nn.Dense(c, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop)(y, deterministic=det)
        return x + dp_mod(y, det)


class PatchMergingSpatial(nn.Module):
    """Spatial-only patch merging on [B, T, H, W, C] (reference wrapper
    applies the 2D merging per frame, video_swin_transformer.py:690-693)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


VIDEO_SWIN_CONFIGS = {
    # parity with reference video_swin_transformer.py:733-779
    "video_swin_t_p4w7": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), drop_path_rate=0.2),
    "video_swin_s_p4w7": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), drop_path_rate=0.2),
    "video_swin_b_p4w7": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), drop_path_rate=0.2),
}


def video_swin_spec(name: str) -> dict:
    cfg = VIDEO_SWIN_CONFIGS[name]
    return dict(
        **cfg,
        window_size=(8, 7, 7),
        strides=[4, 8, 16, 32],
        channels=[cfg["embed_dim"] * 2**i for i in range(4)],
    )


class VideoSwinBackbone(nn.Module):
    """[B, T, H, W, 3] -> 4 per-frame feature maps [(B*T), h, w, C_i]
    (strides 4/8/16/32), outputs taken before each downsample."""

    spec: dict
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        spec = self.spec
        embed_dim = spec["embed_dim"]
        depths = spec["depths"]
        heads = spec["num_heads"]
        window = spec["window_size"]
        b, t = x.shape[0], x.shape[1]

        # patch embed (1,4,4): pad H/W to multiple of 4, 3D conv
        h, w = x.shape[2], x.shape[3]
        ph, pw = (-h) % 4, (-w) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(
            embed_dim, (1, 4, 4), strides=(1, 4, 4), name="patch_embed_proj"
        )(x)
        x = nn.LayerNorm(name="patch_embed_norm")(x)

        dpr = np.linspace(0, spec["drop_path_rate"], sum(depths)).tolist()
        shift = tuple(s // 2 for s in window)
        block_cls = nn.remat(SwinBlock3D) if self.use_checkpoint else SwinBlock3D

        outs = []
        cur = 0
        dim = embed_dim
        for i, depth in enumerate(depths):
            for j in range(depth):
                x = block_cls(
                    dim=dim,
                    num_heads=heads[i],
                    window=window,
                    shift=(0, 0, 0) if j % 2 == 0 else shift,
                    drop_path=dpr[cur + j],
                    deterministic=deterministic,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            cur += depth
            # per-frame output: [(b t), h, w, c]
            oh, ow = x.shape[2], x.shape[3]
            outs.append(x.reshape(b * t, oh, ow, dim))
            if i < len(depths) - 1:
                # named to mirror the reference wrapper's HOISTED layout:
                # VideoSwinTransformerBackbone moves each stage's downsample
                # into a separate `downsamples` ModuleList (reference
                # video_swin_transformer.py:666-670), so released checkpoints
                # spell these `backbone.0.body.downsamples.{i}.*` — unlike 2D
                # swin's `layers.{i}.downsample.*`
                x = PatchMergingSpatial(dim, name=f"downsamples_{i}")(x)
                dim *= 2
        return tuple(outs)
