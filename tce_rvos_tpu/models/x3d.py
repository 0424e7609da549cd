"""X3D video backbone (xs/s/m/l/self), channel-last flax.

Capability parity with reference models/x3d.py (pytorchvideo-style X3D):
stem = spatial 3x3 conv + depthwise temporal 5x1x1 conv + BN + ReLU; four
res stages of SE-bottleneck blocks (depthwise 3x3x3 inner conv, Swish inner
activation, SE on odd blocks); width/depth multipliers with the exact
round_width/round_repeats arithmetic (x3d.py:57-86).

The reference wrapper keeps time inside the 3D convs and returns per-frame
maps for stages 1..4 (strides 4/8/16/32, channels [24,48,96,192] at
width_factor=2), dropping the stem output (x3d.py:1515-1537).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def round_width(width, multiplier, min_width=8, divisor=8, ceil=False):
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    if ceil:
        width_out = max(min_width, int(math.ceil(width / divisor)) * divisor)
    else:
        width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def round_repeats(repeats, multiplier):
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


def swish(x):
    return x * nn.sigmoid(x)


class BN(nn.Module):
    """BatchNorm3d equivalent on [..., C] (normalizes over all non-channel
    axes), eps=1e-5."""

    features: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.BatchNorm(
            use_running_average=deterministic, epsilon=1e-5, momentum=0.9,
            name="bn",
        )(x)


class SqueezeExcitation(nn.Module):
    """fvcore-style SE over (T, H, W) with 1x1x1 convs."""

    channels: int
    reduced: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class X3DBottleneckBlock(nn.Module):
    dim_in: int
    dim_inner: int
    dim_out: int
    stride: Tuple[int, int, int] = (1, 2, 2)
    kernel: Tuple[int, int, int] = (3, 3, 3)
    use_se: bool = True
    se_ratio: float = 0.0625

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        need_proj = (
            self.dim_in != self.dim_out or self.stride[0] * self.stride[1] * self.stride[2] > 1
        )
        if need_proj:
            shortcut = nn.Conv(
                self.dim_out, (1, 1, 1), strides=self.stride, use_bias=False,
                name="branch1_conv",
            )(x)
            if self.dim_in != self.dim_out:
                shortcut = BN(self.dim_out, name="branch1_norm")(shortcut, deterministic)

        y = nn.Conv(self.dim_inner, (1, 1, 1), use_bias=False, name="conv_a")(x)
        y = BN(self.dim_inner, name="norm_a")(y, deterministic)
        y = nn.relu(y)
        pad = [(k // 2, k // 2) for k in self.kernel]
        y = nn.Conv(
            self.dim_inner, self.kernel, strides=self.stride, padding=pad,
            feature_group_count=self.dim_inner, use_bias=False, name="conv_b",
        )(y)
        y = BN(self.dim_inner, name="norm_b")(y, deterministic)
        if self.use_se:
            y = SqueezeExcitation(
                self.dim_inner, round_width(self.dim_inner, self.se_ratio),
                name="se",
            )(y)
        y = swish(y)
        y = nn.Conv(self.dim_out, (1, 1, 1), use_bias=False, name="conv_c")(y)
        y = BN(self.dim_out, name="norm_c")(y, deterministic)
        return nn.relu(shortcut + y)


X3D_CONFIGS = {
    # parity with reference x3d.py:1447-1474
    "x3d_xs": dict(width_factor=1.5, depth_factor=2.2),
    "x3d_s": dict(width_factor=2.0, depth_factor=2.2),
    "x3d_m": dict(width_factor=2.0, depth_factor=2.2),
    "x3d_l": dict(width_factor=2.0, depth_factor=5.0),
    "x3d_self": dict(width_factor=2.0, depth_factor=2.2),
}


def x3d_spec(name: str) -> dict:
    cfg = X3D_CONFIGS[name]
    return dict(
        **cfg,
        strides=[4, 8, 16, 32],
        # actual stage output widths: round_width of the base stage dims
        # [12, 24, 48, 96] by the variant's width_factor (x3d.py stage
        # construction below) — [24, 48, 96, 192] for wf=2.0 variants,
        # [16, 48, 96, 144]-style for x3d_xs (wf=1.5); a hardcoded wf=2.0
        # list would misreport x3d_xs
        channels=[round_width(d, cfg["width_factor"]) for d in (12, 24, 48, 96)],
    )


class X3DBackbone(nn.Module):
    """[B, T, H, W, 3] -> 4 per-frame maps [(B*T), h, w, C] for stages 1..4
    (stem output dropped, matching the reference Joiner x3d.py:1528-1531)."""

    spec: dict

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        wf = self.spec["width_factor"]
        df = self.spec["depth_factor"]
        b, t = x.shape[0], x.shape[1]

        stem_dim_in = 12
        stem_dim = round_width(stem_dim_in, wf)
        # stem: spatial conv then depthwise temporal conv (x3d.py:700-721)
        y = nn.Conv(
            stem_dim, (1, 3, 3), strides=(1, 2, 2), padding=[(0, 0), (1, 1), (1, 1)],
            use_bias=False, name="stem_conv_xy",
        )(x)
        y = nn.Conv(
            stem_dim, (5, 1, 1), strides=(1, 1, 1), padding=[(2, 2), (0, 0), (0, 0)],
            feature_group_count=stem_dim, use_bias=False, name="stem_conv_t",
        )(y)
        y = BN(stem_dim, name="stem_norm")(y, deterministic)
        y = nn.relu(y)

        stage_depths = [1, 2, 5, 3]
        exp_stage = 2.0
        d1 = stem_dim_in
        d2 = round_width(d1, exp_stage, divisor=8)
        d3 = round_width(d2, exp_stage, divisor=8)
        d4 = round_width(d3, exp_stage, divisor=8)
        stage_dims = [d1, d2, d3, d4]

        outs = []
        dim_in = stem_dim
        for s in range(4):
            dim_out = round_width(stage_dims[s], wf)
            dim_inner = int(2.25 * dim_out)
            depth = round_repeats(stage_depths[s], df)
            for i in range(depth):
                y = X3DBottleneckBlock(
                    dim_in=dim_in if i == 0 else dim_out,
                    dim_inner=dim_inner,
                    dim_out=dim_out,
                    stride=(1, 2, 2) if i == 0 else (1, 1, 1),
                    use_se=bool((i + 1) % 2),  # SE on even-indexed blocks
                    name=f"stage{s + 1}_block{i}",
                )(y, deterministic)
            dim_in = dim_out
            oh, ow = y.shape[2], y.shape[3]
            outs.append(y.reshape(b * t, oh, ow, dim_out))
        return tuple(outs)
