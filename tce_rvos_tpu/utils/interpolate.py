"""Resize primitives with exact PyTorch semantics, channel-last layout.

The reference pipeline leans on ``F.interpolate`` in three flavours whose
coordinate conventions differ; mask parity (J&F within 0.1) requires matching
them bit-for-bit, so we implement each as an explicit gather/weighted-gather
instead of using ``jax.image.resize`` (whose ``nearest`` rounds differently).

  * ``resize_nearest``  — torch ``mode='nearest'`` (legacy asymmetric):
      src = floor(dst * in/out). Used for FPN top-down upsampling
      (reference models/segmentation.py:212,241), mask downsampling, and
      backbone mask rescaling (models/backbone.py:83).
  * ``resize_bilinear`` — torch ``mode='bilinear', align_corners=False``:
      src = (dst + 0.5) * in/out - 0.5, clamped, no zero padding.
      Used for mask upsampling in postprocessing
      (models/postprocessors.py:39,144) and VL-block upsample
      (models/segmentation.py:360).
  * ``aligned_bilinear`` — the AdelaiDet-style aligned upsample used by the
      dynamic mask head (reference models/tce_rvos.py:561-583): replicate-pad,
      align_corners=True resize to (f*h+1, f*w+1), replicate-pad by f//2,
      crop.

All functions take/return channel-last arrays ``[..., H, W, C]`` and are
shape-polymorphic in the leading batch dims. Sizes are static Python ints so
everything jits to static gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nearest_index(out_size: int, in_size: int) -> jnp.ndarray:
    # torch legacy 'nearest': floor(dst * in/out)
    idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size))
    return jnp.clip(idx.astype(jnp.int32), 0, in_size - 1)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on [..., H, W, C].

    Integer-ratio fast paths (bit-identical index sets, no gathers — XLA
    lowers gathers along non-minor axes into transposed layouts that ripple
    copies through the FPN/VL blocks):
      * integer upsample: floor(dst*in/out) repeats each source pixel
        ``factor`` times -> broadcast+reshape;
      * integer downsample: indices are exactly ``0, f, 2f, ...`` -> a
        strided slice."""
    h_out, w_out = size
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x

    def axis_resize(x, out_size, in_size, axis):
        if out_size % in_size == 0:
            # floor(k*in/out) = floor(k/f): consecutive f-fold repeats
            return jnp.repeat(x, out_size // in_size, axis=axis)
        if in_size % out_size == 0:
            # floor(k*in/out) = k*f: a strided slice
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, in_size, in_size // out_size)
            return x[tuple(sl)]
        return jnp.take(x, _nearest_index(out_size, in_size), axis=axis)

    x = axis_resize(x, h_out, h_in, x.ndim - 3)
    x = axis_resize(x, w_out, w_in, x.ndim - 2)
    return x


def _linear_matrix(out_size: int, in_size: int, align_corners: bool):
    """Dense [out, in] interpolation matrix (2 nonzeros per row) equivalent
    to the gather+lerp formulation — static, built host-side once per
    (shape, mode) and closed over as a constant."""
    import numpy as np

    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (
            (in_size - 1) / (out_size - 1)
        )
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (
            in_size / out_size
        ) - 0.5
    src = np.clip(src, 0.0, float(in_size - 1))
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - w1)
    np.add.at(mat, (rows, i1), w1)
    return jnp.asarray(mat)


def resize_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') on [..., H, W, C].

    Implemented as two static weight-matrix contractions (one per axis,
    HIGHEST precision so the MXU path is f32-accurate) instead of four
    gathers: each output row is a 2-nonzero convex combination of input
    rows, so the matrix product is mathematically identical to the
    gather+lerp form, and XLA keeps clean layouts (gathers along non-minor
    axes force transposed layouts that ripple copies into the surrounding
    FPN/VL-block ops)."""
    h_out, w_out = size
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if h_out != h_in:
        my = _linear_matrix(h_out, h_in, align_corners)
        xf = jnp.einsum("...hwc,oh->...owc", xf, my, precision=hi)
    if w_out != w_in:
        mx = _linear_matrix(w_out, w_in, align_corners)
        xf = jnp.einsum("...hwc,ow->...hoc", xf, mx, precision=hi)
    return xf.astype(dtype)


def replicate_pad(x: jnp.ndarray, pad: tuple[int, int, int, int]) -> jnp.ndarray:
    """torch F.pad(mode='replicate') with pad=(left, right, top, bottom) on
    [..., H, W, C]."""
    left, right, top, bottom = pad
    cfg = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return jnp.pad(x, cfg, mode="edge")


@functools.partial(jax.jit, static_argnums=(1,))
def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """AdelaiDet aligned bilinear upsample on [..., H, W, C]
    (semantics of reference models/tce_rvos.py:561-583)."""
    assert factor >= 1
    if factor == 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    x = replicate_pad(x, (0, 1, 0, 1))
    oh, ow = factor * h + 1, factor * w + 1
    x = resize_bilinear(x, (oh, ow), align_corners=True)
    x = replicate_pad(x, (factor // 2, 0, factor // 2, 0))
    return x[..., : oh - 1, : ow - 1, :]


def resize_mask_nearest(mask: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize a boolean mask [..., H, W] (no channel dim), matching
    torch's interpolate-on-float-then-cast used throughout the reference."""
    return resize_nearest(mask[..., None].astype(jnp.float32), size)[..., 0].astype(jnp.bool_)
