"""ResNet-50/101 backbone with frozen BatchNorm, NHWC, flax.

Capability parity with reference models/backbone.py:20-143 (torchvision
resnet + FrozenBatchNorm2d + IntermediateLayerGetter over layer1..layer4),
rebuilt TPU-first:

  * channel-last convs (XLA's native TPU layout);
  * FrozenBatchNorm folded to a per-channel scale/bias at call time with the
    reference's eps=1e-5 *added before rsqrt* (backbone.py:53-56) — these are
    flax variables in a 'batch_stats'-style collection so torchvision
    checkpoints load losslessly;
  * DC5 (dilation in layer4) supported via dilated 3x3 convs.

Returns the four stage outputs res2..res5 (strides 4/8/16/32) as a list of
NHWC arrays; mask/pos handling lives in the Joiner (build.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Per-channel affine from frozen statistics; never updates."""

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.variable(
            "frozen", "weight", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        running_mean = self.variable(
            "frozen", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        running_var = self.variable(
            "frozen", "running_var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        eps = 1e-5
        scale = weight * (running_var + eps) ** -0.5
        shift = bias - running_mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1(x4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns (res2, res3, res4, res5) with channels (256, 512, 1024, 2048)."""

    layers: Sequence[int]           # (3,4,6,3) for R50; (3,4,23,3) for R101
    dilation: bool = False          # DC5: layer4 stride->1, dilation->2

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool k=3 s=2 p=1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = (64, 128, 256, 512)
        for stage, (p, n_blocks) in enumerate(zip(planes, self.layers)):
            first_stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.dilation:
                first_stride, dilation = 1, 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=p,
                    stride=first_stride if b == 0 else 1,
                    dilation=dilation,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x)
            outs.append(x)
        return tuple(outs)


RESNET_SPECS = {
    "resnet50": dict(layers=(3, 4, 6, 3)),
    "resnet101": dict(layers=(3, 4, 23, 3)),
}


def resnet_strides_channels(name: str, dilation: bool):
    strides = [4, 8, 16, 32]
    if dilation:
        strides[-1] //= 2
    return strides, [256, 512, 1024, 2048]
