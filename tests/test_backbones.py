"""Backbone shape/stride contracts: every backbone must emit 4 levels at
strides 4/8/16/32 with its declared channel counts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

def _check_pyramid(feats, n, h, w, channels):
    assert len(feats) == 4
    for i, (f, c) in enumerate(zip(feats, channels)):
        stride = 4 * 2**i
        assert f.shape == (n, h // stride, w // stride, c), (i, f.shape)
        assert np.isfinite(np.asarray(f)).all()


def test_resnet50_pyramid():
    from tce_rvos_tpu.models.backbone_resnet import RESNET_SPECS, ResNet

    m = ResNet(layers=RESNET_SPECS["resnet50"]["layers"])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(variables, x)
    _check_pyramid(feats, 2, 64, 64, [256, 512, 1024, 2048])


def test_swin_tiny_pyramid():
    from tce_rvos_tpu.models.swin import SwinBackbone, swin_spec

    spec = swin_spec("swin_t_p4w7")
    m = SwinBackbone(spec=spec)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3), jnp.float32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(variables, x)
    _check_pyramid(feats, 2, 64, 96, spec["channels"])


def test_video_swin_tiny_pyramid():
    from tce_rvos_tpu.models.video_swin import VideoSwinBackbone, video_swin_spec

    spec = video_swin_spec("video_swin_t_p4w7")
    m = VideoSwinBackbone(spec=spec)
    # 3 frames < temporal window 8 -> exercises the window-shrink rule
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64, 3), jnp.float32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(variables, x)
    _check_pyramid(feats, 3, 64, 64, spec["channels"])  # (b*t) leading axis


def test_x3d_s_pyramid():
    from tce_rvos_tpu.models.x3d import X3DBackbone, x3d_spec

    spec = x3d_spec("x3d_s")
    m = X3DBackbone(spec=spec)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 64, 64, 3), jnp.float32)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(variables, x)
    _check_pyramid(feats, 2, 64, 64, spec["channels"])


def test_x3d_round_arithmetic():
    from tce_rvos_tpu.models.x3d import round_repeats, round_width

    assert round_width(12, 2.0) == 24
    assert round_width(96, 2.0) == 192
    assert [round_repeats(r, 2.2) for r in (1, 2, 5, 3)] == [3, 5, 11, 7]
    assert [round_repeats(r, 5.0) for r in (1, 2, 5, 3)] == [5, 10, 25, 15]
