"""Bit-parity of resize primitives vs torch.nn.functional — mask quality
(J&F within 0.1 of reference) depends on these matching exactly."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tce_rvos_tpu.utils.interpolate import (
    aligned_bilinear,
    resize_bilinear,
    resize_nearest,
)


def _rand(n, c, h, w, seed=0):
    return np.random.RandomState(seed).randn(n, c, h, w).astype(np.float32)


def _to_nhwc(x):
    return jnp.array(np.transpose(x, (0, 2, 3, 1)))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_nearest_matches_torch():
    for (h, w), (oh, ow) in [((7, 9), (13, 21)), ((16, 16), (5, 3)), ((10, 10), (10, 10))]:
        x = _rand(2, 3, h, w)
        ref = F.interpolate(torch.from_numpy(x), size=(oh, ow), mode="nearest").numpy()
        ours = _from_nhwc(resize_nearest(_to_nhwc(x), (oh, ow)))
        np.testing.assert_array_equal(ours, ref)


def test_bilinear_matches_torch():
    for align in (False, True):
        for (h, w), (oh, ow) in [((7, 9), (13, 21)), ((16, 16), (5, 3))]:
            x = _rand(2, 3, h, w, seed=1)
            ref = F.interpolate(
                torch.from_numpy(x), size=(oh, ow), mode="bilinear", align_corners=align
            ).numpy()
            ours = _from_nhwc(resize_bilinear(_to_nhwc(x), (oh, ow), align_corners=align))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def torch_aligned_bilinear(tensor, factor):
    """Torch reimplementation of the AdelaiDet aligned upsample for testing
    (matches semantics of reference models/tce_rvos.py:561-583)."""
    h, w = tensor.shape[2:]
    tensor = F.pad(tensor, pad=(0, 1, 0, 1), mode="replicate")
    oh, ow = factor * h + 1, factor * w + 1
    tensor = F.interpolate(tensor, size=(oh, ow), mode="bilinear", align_corners=True)
    tensor = F.pad(tensor, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
    return tensor[:, :, : oh - 1, : ow - 1]


def test_aligned_bilinear_matches_reference_semantics():
    for factor in (1, 2, 4):
        x = _rand(2, 1, 6, 5, seed=2)
        ref = torch_aligned_bilinear(torch.from_numpy(x), factor).numpy()
        ours = _from_nhwc(aligned_bilinear(_to_nhwc(x), factor))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
