"""Cross-modal segmentation head (parity with reference models/segmentation.py).

  * ``VisionLanguageFusionModule`` — single cross-attention with
    multiplicative gating (tgt * attn_out), applied per feature level before
    the encoder (reference :447-464).
  * ``VisionLanguageBlock`` — FPN-level block: spatially-reduced self-attn
    over the whole clip (seq = t*h*w!), cross-attn to text, FFN
    (reference :299-443).
  * ``CrossModalFPNDecoder`` — lateral/output convs over
    [res2, enc-memory 8x/16x/32x] + top-down nearest upsample producing the
    stride-4 mask feature map (reference :94-296).

Everything channel-last: features [N, H, W, C] with N = b*t.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tce_rvos_tpu.models.layers import (
    GroupNorm,
    MultiheadAttention,
    get_activation,
    with_pos,
)
from tce_rvos_tpu.utils.interpolate import resize_bilinear, resize_nearest

xavier = nn.initializers.xavier_uniform()


class VisionLanguageFusionModule(nn.Module):
    """Early V-L fusion: vision queries attend to text, output gates the
    vision features multiplicatively (reference :447-464)."""

    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,        # [b, S_vis, C]
        memory: jnp.ndarray,     # [b, S_txt, C]
        memory_key_padding_mask: Optional[jnp.ndarray] = None,  # [b, S_txt]
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        attn_out = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(
            with_pos(tgt, query_pos),
            with_pos(memory, pos),
            memory,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic,
        )
        return tgt * attn_out


class VisionLanguageBlock(nn.Module):
    """FPN-level cross-modal block with spatial-reduction self-attention
    (reference :299-443, forward_post path)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    sr_ratio: int = 1

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,        # [b, t, h, w, C]
        memory: jnp.ndarray,     # [b, S_txt, C]
        tgt_key_padding_mask: jnp.ndarray,   # [b, t, h, w] True=pad
        memory_key_padding_mask: jnp.ndarray,  # [b, S_txt]
        pos: Optional[jnp.ndarray],          # [b, S_txt, C]
        query_pos: jnp.ndarray,              # [b, t, h, w, C]
        deterministic: bool = True,
    ):
        b, t, h, w, c = tgt.shape
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        q = k = with_pos(tgt, query_pos)
        v = tgt
        if self.sr_ratio > 1:
            nh, nw = int(h / self.sr_ratio), int(w / self.sr_ratio)
            q = resize_nearest(q, (nh, nw))
            k = resize_nearest(k, (nh, nw))
            v = resize_nearest(v, (nh, nw))
            kpm = resize_nearest(
                tgt_key_padding_mask[..., None].astype(jnp.float32), (nh, nw)
            )[..., 0].astype(bool)
        else:
            nh, nw = h, w
            kpm = tgt_key_padding_mask

        sq = t * nh * nw
        tgt2 = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(
            q.reshape(b, sq, c),
            k.reshape(b, sq, c),
            v.reshape(b, sq, c),
            key_padding_mask=kpm.reshape(b, sq),
            deterministic=deterministic,
        )
        if self.sr_ratio > 1:
            tgt2 = resize_bilinear(
                tgt2.reshape(b, t, nh, nw, c), (h, w), align_corners=False
            )
        else:
            tgt2 = tgt2.reshape(b, t, h, w, c)
        tgt = tgt + drop(tgt2)
        tgt = nn.LayerNorm(name="norm1")(tgt)

        # cross-attn to text over the flattened clip
        s = t * h * w
        tgt2 = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(
            with_pos(tgt, query_pos).reshape(b, s, c),
            with_pos(memory, pos),
            memory,
            key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic,
        ).reshape(b, t, h, w, c)
        tgt = nn.LayerNorm(name="norm2")(tgt + drop(tgt2))

        y = nn.Dense(self.dim_feedforward, kernel_init=xavier, name="linear1")(tgt)
        y = get_activation(self.activation)(y)
        y = drop(y)
        y = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(y)
        tgt = nn.LayerNorm(name="norm3")(tgt + drop(y))
        return tgt


class ConvGN(nn.Module):
    """Conv + optional GroupNorm(8) + optional relu (reference Conv2d wrapper
    :48-91 with get_norm 'GN' :43)."""

    features: int
    kernel: int = 3
    norm: bool = True
    act: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.norm,
            kernel_init=xavier,
            name="conv",
        )(x)
        if self.norm:
            x = GroupNorm(num_groups=8, name="norm")(x)
        if self.act:
            x = nn.relu(x)
        return x


class CrossModalFPNDecoder(nn.Module):
    """Top-down FPN over [res2, memory_8x, memory_16x, memory_32x] with
    optional per-level V-L blocks; outputs the stride-4 mask feature map
    (reference :94-296). Stage numbering matches the reference: adapter/layer
    /cross_attn _1.._4 from 4x to 32x; sr_ratios (8, 4, 2, 1)."""

    conv_dim: int
    mask_dim: int
    dim_feedforward: int = 2048
    vlblock: bool = True

    @nn.compact
    def __call__(
        self,
        features: Sequence,          # 4 x ([N,H,W,C_i], mask [N,H,W]) res2..res5
        text_features: Optional[jnp.ndarray],   # [b, S_txt, C]
        text_pad_mask: Optional[jnp.ndarray],   # [b, S_txt]
        text_pos: Optional[jnp.ndarray],        # [b, S_txt, C]
        poses: Sequence[jnp.ndarray],           # 4 x [N,H,W,C]
        memory: Sequence[jnp.ndarray],          # 3 x [N,h,w,C] 8x->32x
        nf: int,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        sr_ratios = [8, 4, 2, 1]  # stage 1..4 (4x..32x)
        y = None
        # 32x -> 8x: memory levels with stages 4, 3, 2
        items = list(zip(memory[::-1], features[1:][::-1], poses[1:][::-1]))
        for idx, (mem, feat, pos) in enumerate(items):
            stage = 4 - idx
            x_mask = feat[1]
            n, h, w, _ = pos.shape
            b, t = n // nf, nf
            vis = ConvGN(self.conv_dim, 1, name=f"adapter_{stage}")(mem)
            if self.vlblock:
                vis = VisionLanguageBlock(
                    self.conv_dim, 8, self.dim_feedforward,
                    sr_ratio=sr_ratios[stage - 1], name=f"cross_attn_{stage}",
                )(
                    vis.reshape(b, t, h, w, self.conv_dim),
                    text_features,
                    x_mask.reshape(b, t, h, w),
                    text_pad_mask,
                    text_pos,
                    pos.reshape(b, t, h, w, self.conv_dim),
                    deterministic,
                ).reshape(n, h, w, self.conv_dim)
            if idx == 0:
                y = ConvGN(self.conv_dim, 3, act=True, name=f"layer_{stage}")(vis)
            else:
                y = vis + resize_nearest(y, (h, w))
                y = ConvGN(self.conv_dim, 3, act=True, name=f"layer_{stage}")(y)

        # 4x level from raw res2
        x, x_mask = features[0]
        pos = poses[0]
        n, h, w, _ = pos.shape
        b, t = n // nf, nf
        vis = ConvGN(self.conv_dim, 1, name="adapter_1")(x)
        if self.vlblock:
            vis = VisionLanguageBlock(
                self.conv_dim, 8, self.dim_feedforward, sr_ratio=sr_ratios[0],
                name="cross_attn_1",
            )(
                vis.reshape(b, t, h, w, self.conv_dim),
                text_features,
                x_mask.reshape(b, t, h, w),
                text_pad_mask,
                text_pos,
                pos.reshape(b, t, h, w, self.conv_dim),
                deterministic,
            ).reshape(n, h, w, self.conv_dim)
        y = vis + resize_nearest(y, (h, w))
        y = ConvGN(self.conv_dim, 3, act=True, name="layer_1")(y)

        # final mask features conv (no norm)
        return ConvGN(self.mask_dim, 3, norm=False, name="mask_features")(y)


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_boxes: float):
    """reference models/segmentation.py:467-482; inputs are logits
    [N, ...] flattened per-instance."""
    probs = nn.sigmoid(inputs).reshape(inputs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2.0 * (probs * targets).sum(axis=1)
    denominator = probs.sum(axis=-1) + targets.sum(axis=-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    return loss.sum() / num_boxes


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """reference models/segmentation.py:485-510 (mean over last axis, sum over
    instances, / num_boxes)."""
    prob = nn.sigmoid(inputs)
    ce = optax_sigmoid_ce(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_boxes


def optax_sigmoid_ce(logits, labels):
    """binary_cross_entropy_with_logits, numerically stable."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
