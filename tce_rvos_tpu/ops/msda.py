"""Multi-scale deformable attention — the TPU-native core op.

This replaces the reference's CUDA extension
(``MultiScaleDeformableAttention_update``, /root/reference/models/ops/src/**)
with a pure-XLA gather formulation. Semantics match the CUDA forward
(``ms_deformable_im2col_gpu_kernel``, ms_deform_im2col_cuda.cuh:320-455) and
its PyTorch oracle (``ms_deform_attn_core_pytorch``,
models/ops/functions/ms_deform_attn_func.py:67-87):

  * sampling locations are normalized to [0, 1] per level; the bilinear tap
    uses grid_sample conventions (align_corners=False): pixel coordinate
    ``p = loc * size - 0.5``; out-of-bounds corners contribute zero
    (zero padding).
  * output[n, q, :] = concat over heads m of
      sum_l sum_p attn[n,q,m,l,p] * bilinear(value_l[n,:,m,:], loc[n,q,m,l,p])

Differences from the reference (TPU-first design):
  * ``spatial_shapes`` is a *static* Python tuple of (H, W) pairs so every
    reshape/gather is shape-static under jit (no device-side shape tensors,
    no level_start_index bookkeeping).
  * no im2col_step batch chunking (that was a CUDA grid-size workaround that
    forced the reference to cap clips at 32 frames —
    inference_davis.py:201-209); any batch size works here.
  * gradients come from JAX AD through the gather — no hand-written col2im.

The ``_3d`` variant implements the reference CUDA kernel's ``is_3d`` branch
(ms_deform_im2col_cuda.cuh:366-420): each sampling point carries a fractional
frame coordinate; the tap linearly interpolates between the two nearest
frames (the batch axis doubles as time).

A Pallas kernel for the hot configuration lives in
``tce_rvos_tpu.ops.pallas_msda``; this file is the always-correct fallback
and the test oracle.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

SpatialShapes = Tuple[Tuple[int, int], ...]


def level_splits(spatial_shapes: SpatialShapes) -> Tuple[int, ...]:
    """Flattened start offset of each level (static python ints)."""
    starts = [0]
    for h, w in spatial_shapes:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _bilinear_corner_terms(x: jnp.ndarray, y: jnp.ndarray, h: int, w: int):
    """Four (flat_index, weight) pairs of the zero-padded bilinear tap at
    pixel coords (x, y) on an (h, w) grid. Shapes preserved; weight is zero
    for out-of-bounds corners."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    terms = []
    for cy, cx, wgt in (
        (0, 0, (1.0 - dy) * (1.0 - dx)),
        (0, 1, (1.0 - dy) * dx),
        (1, 0, dy * (1.0 - dx)),
        (1, 1, dy * dx),
    ):
        xi = x0i + cx
        yi = y0i + cy
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        terms.append((yi * w + xi, jnp.where(inb, wgt, 0.0)))
    return terms


def _gather_heads(value_l: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """value_l: [N, S, M, D], flat_idx: [N, Q, M, P] -> [N, Q, M, P, D]."""
    n, q, m, p = flat_idx.shape
    idx = flat_idx.transpose(0, 1, 3, 2).reshape(n, q * p, m)
    out = jnp.take_along_axis(value_l, idx[..., None], axis=1)  # [N, Q*P, M, D]
    return out.reshape(n, q, p, m, -1).transpose(0, 1, 3, 2, 4)


def _msda_single_level(value_l, h, w, loc, attn):
    """One level's contribution. value_l [N, HW, M, D]; loc [N, Q, M, P, 2]
    (x, y in [0,1]); attn [N, Q, M, P] -> [N, Q, M, D]."""
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    acc = None
    for flat_idx, wgt in _bilinear_corner_terms(x, y, h, w):
        tap = _gather_heads(value_l, flat_idx)  # [N, Q, M, P, D]
        term = jnp.einsum(
            "nqmpd,nqmp->nqmd", tap, (wgt * attn).astype(tap.dtype)
        )
        acc = term if acc is None else acc + term
    return acc


@functools.partial(jax.jit, static_argnums=(1, 4))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    query_chunk: int | None = None,
) -> jnp.ndarray:
    """Multi-scale deformable attention core.

    Args:
      value: [N, S, M, D] where S = sum_l H_l*W_l.
      spatial_shapes: static ((H0, W0), ...) per level.
      sampling_locations: [N, Q, M, L, P, 2], normalized (x, y) in [0, 1].
      attention_weights: [N, Q, M, L, P] (softmax-normalized over L*P).
      query_chunk: process queries in chunks of this size to bound the
        gathered-tap working set (None = all at once).

    Returns: [N, Q, M*D].
    """
    n, _, m, d = value.shape
    q = sampling_locations.shape[1]
    starts = level_splits(spatial_shapes)

    def run(loc, attn):
        out = jnp.zeros((loc.shape[0], loc.shape[1], m, d), dtype=value.dtype)
        for lvl, (h, w) in enumerate(spatial_shapes):
            value_l = value[:, starts[lvl] : starts[lvl + 1]]
            out = out + _msda_single_level(
                value_l, h, w, loc[:, :, :, lvl], attn[:, :, :, lvl]
            )
        return out

    if query_chunk is None or q <= query_chunk:
        out = run(sampling_locations, attention_weights)
    else:
        pad = (-q) % query_chunk
        loc = jnp.pad(sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        attn = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        nchunk = (q + pad) // query_chunk
        loc = loc.reshape(n, nchunk, query_chunk, *loc.shape[2:]).transpose(1, 0, 2, 3, 4, 5, 6)
        attn = attn.reshape(n, nchunk, query_chunk, *attn.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
        out = jax.lax.map(lambda la: run(*la), (loc, attn))
        out = out.transpose(1, 0, 2, 3, 4).reshape(n, q + pad, m, d)[:, :q]

    return out.reshape(n, q, m * d)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_3d(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Temporal-trilinear deformable attention: the CUDA ``is_3d`` branch
    (ms_deform_im2col_cuda.cuh:366-420).

    sampling_locations: [N, Q, M, L, P, 3] — (x, y, f); the fractional frame
    index is ``f_im = f * N - 0.5`` where N is the batch(=time) axis; the tap
    bilinearly samples the two neighbouring frames and lerps. Frames outside
    [0, N-1] contribute zero, matching the CUDA kernel's bounds check.
    """
    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    starts = level_splits(spatial_shapes)

    f = sampling_locations[..., 2] * n - 0.5  # [N, Q, M, L, P]
    f0 = jnp.floor(f)
    df = f - f0
    f0i = f0.astype(jnp.int32)

    out = jnp.zeros((n, q, m, d), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = value[:, starts[lvl] : starts[lvl + 1]]  # [N, HW, M, D]
        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        fl = f0i[:, :, :, lvl]
        dfl = df[:, :, :, lvl]
        hw = h * w
        # flatten the (frame, pixel) axes so one gather indexes both
        value_flat = jnp.broadcast_to(
            value_l.reshape(1, n * hw, m, d), (n, n * hw, m, d)
        )
        for foff, fwgt in ((0, 1.0 - dfl), (1, dfl)):
            fi = fl + foff
            fin = (fi >= 0) & (fi < n)
            fi_c = jnp.clip(fi, 0, n - 1)
            for flat_idx, wgt in _bilinear_corner_terms(x, y, h, w):
                comb = fi_c * hw + flat_idx  # [N, Q, M, P] into N*HW
                tap = _gather_heads(value_flat, comb)
                weight = jnp.where(fin, fwgt, 0.0) * wgt * attn
                out = out + jnp.einsum(
                    "nqmpd,nqmp->nqmd", tap, weight.astype(tap.dtype)
                )
    return out.reshape(n, q, m * d)
