"""Pallas TPU kernel for multi-scale deformable attention.

TPU-first design — NOT a port of the CUDA im2col kernel
(reference models/ops/src/cuda/ms_deform_im2col_cuda.cuh): the TPU has no
fast arbitrary gather, but it has a 128x128 systolic array. We therefore
express the zero-padded bilinear tap as two *dense separable interpolation
contractions*:

    tap(q) = sum_y sum_x  Wy[q, y] * Wx[q, x] * V[y, x, :]
    Wx[q, x] = relu(1 - |x - px(q)|),   Wy[q, y] = relu(1 - |y - py(q)|)

(each row of Wx/Wy has at most 2 non-zeros, and the relu form reproduces
grid_sample's zero padding exactly — taps sliding off the border lose
weight). The x-contraction becomes an MXU matmul

    S1[BQ*P, H*D] = Wx[BQ*P, W] @ V_t[W, H*D]

with the level's value tile pre-transposed to [W, H*D] (one cheap XLA
transpose per call), and the y-contraction is a small VPU weighted
reduction. Per grid cell (batch n, head m, query block) everything lives in
VMEM; no HBM gather traffic at all.

Two variants, dispatched by level size:
  * separable (large levels): x-contraction on the MXU, y-contraction as a
    tiled-repeat elementwise + binary fold matmul (d-major lane layout —
    Mosaic cannot reshape lanes, and pltpu.repeat tiles);
  * flat (H*W <= 1024): the full 2D interpolation row is built from iota
    arithmetic and taps taken by one [P*BQ, H*W] @ [H*W, D] matmul — tiny
    lane vectors relayout poorly under the separable form.
All query-side pads/transposes are hoisted to one pass per op call.

Measured on v5e (Q=5120, 4 levels of a 384x640 frame, N=5, M=8):
13 ms/call vs 144 ms for the XLA gather path; whole flagship model
1.8 -> 10.7 clips/s.

Forward-only; the backward pass uses the XLA fallback (ops/msda.py) through
``jax.custom_vjp`` — inference is the hot path (BASELINE.md north star).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits, ms_deform_attn

DEFAULT_BQ = 256  # queries per block


def _msda_level_kernel(
    loc_ref,   # [1, 1, P*2, BQ]  (Q-minor: sublane index = pi*2 + {x,y})
    attn_ref,  # [1, 1, P, BQ]
    v_ref,     # [1, 1, W, D*H]  (rows = x, lanes = d-major (d*H + y))
    out_ref,   # [1, 1, BQ, D]
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
):
    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (bq, h), 1).astype(jnp.float32)
    # binary fold matrix G[c*H + y, c'] = (c == c'): the y-reduction of a
    # d-major lane vector becomes one matmul (no lane reshapes, which Mosaic
    # does not support). d-major because pltpu.repeat TILES its input:
    # repeat(wy[H], d) = [wy, wy, ...] -> lane index c*H + y.
    rows = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 1)
    fold = (rows // h == cols).astype(jnp.bfloat16)     # [D*H, D] exact 0/1

    v_t = v_ref[0, 0]      # [W, D*H]

    # ONE transpose per ref (vs one per point): [P*2, BQ] -> [BQ, P*2]
    loc_t = jnp.transpose(loc_ref[0, 0])
    attn_t = jnp.transpose(attn_ref[0, 0])

    def col(which, row):
        src = loc_t if which == "loc" else attn_t
        return src[:, row : row + 1]

    # stack the P points along sublanes -> ONE MXU matmul
    wx_all = jnp.concatenate(
        [
            jnp.maximum(
                0.0, 1.0 - jnp.abs(xs - (col("loc", 2 * pi) * w - 0.5))
            )
            for pi in range(p)
        ],
        axis=0,
    )  # [P*BQ, W]
    s1 = jnp.dot(
        wx_all.astype(jnp.bfloat16), v_t.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # f32 accum (Mosaic requirement), bf16 elementwise
    wy_all = jnp.concatenate(
        [
            jnp.maximum(
                0.0, 1.0 - jnp.abs(ys - (col("loc", 2 * pi + 1) * h - 0.5))
            )
            for pi in range(p)
        ],
        axis=0,
    )  # [P*BQ, H]
    wyf = pltpu.repeat(wy_all.astype(jnp.bfloat16), d, axis=1)  # [P*BQ, D*H]
    s2 = s1 * wyf
    s3 = jnp.dot(s2, fold, preferred_element_type=jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    for pi in range(p):
        acc = acc + col("attn", pi) * s3[pi * bq : (pi + 1) * bq]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _msda_level_kernel_flat(
    loc_ref,   # [1, 1, P*2, BQ]  (Q-minor)
    attn_ref,  # [1, 1, P, BQ]
    v_ref,     # [1, 1, HW, D]  (flat row-major pixels)
    out_ref,   # [1, 1, BQ, D]
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
):
    """Small-level variant: build the full 2D interpolation matrix
    W2d[r, y*W+x] = relu(1-|y-py|)*relu(1-|x-px|) directly from iota
    arithmetic (no fold matmul, no repeat — those relayout poorly at tiny
    lane counts) and take the taps with one [P*BQ, H*W] @ [H*W, D] matmul."""
    v = v_ref[0, 0].astype(jnp.bfloat16)  # [HW, D]

    loc_t = jnp.transpose(loc_ref[0, 0])
    attn_t = jnp.transpose(attn_ref[0, 0])

    def col(which, row):
        src = loc_t if which == "loc" else attn_t
        return src[:, row : row + 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, h * w), 1)
    lane_y = (lane // w).astype(jnp.float32)
    lane_x = (lane % w).astype(jnp.float32)

    w2d = jnp.concatenate(
        [
            (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(lane_x - (col("loc", 2 * pi) * w - 0.5))
                )
                * jnp.maximum(
                    0.0, 1.0 - jnp.abs(lane_y - (col("loc", 2 * pi + 1) * h - 0.5))
                )
                * col("attn", pi)
            )
            for pi in range(p)
        ],
        axis=0,
    ).astype(jnp.bfloat16)  # [P*BQ, HW] (attention folded in)

    taps = jnp.dot(w2d, v, preferred_element_type=jnp.float32)  # [P*BQ, D]
    acc = taps[0 * bq : 1 * bq]
    for pi in range(1, p):
        acc = acc + taps[pi * bq : (pi + 1) * bq]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


FLAT_LEVEL_MAX_PIXELS = 1024  # levels at or below use the flat kernel


def _msda_level_pallas(
    value_t: jnp.ndarray,   # [N, M, W, D*H] (separable) or [N, M, HW, D] (flat)
    loc_t: jnp.ndarray,     # [N, M, P*2, Qp] (Q-minor)
    attn_t: jnp.ndarray,    # [N, M, P, Qp]
    h: int,
    w: int,
    block_q: int = DEFAULT_BQ,
    flat: bool = False,
) -> jnp.ndarray:
    n, m, p2, qp = loc_t.shape
    p = p2 // 2
    d = value_t.shape[-1] if flat else value_t.shape[-1] // h
    grid = (n, m, qp // block_q)

    loc_spec = pl.BlockSpec(
        (1, 1, p2, block_q),
        lambda ni, mi, qi: (ni, mi, 0, qi),
        memory_space=pltpu.VMEM,
    )
    attn_spec = pl.BlockSpec(
        (1, 1, p, block_q),
        lambda ni, mi, qi: (ni, mi, 0, qi),
        memory_space=pltpu.VMEM,
    )
    kernel = _msda_level_kernel_flat if flat else _msda_level_kernel
    v_block = (1, 1, h * w, d) if flat else (1, 1, w, d * h)
    out = pl.pallas_call(
        functools.partial(kernel, h=h, w=w, d=d, p=p, bq=block_q),
        grid=grid,
        in_specs=[
            loc_spec,
            attn_spec,
            pl.BlockSpec(
                v_block,
                lambda ni, mi, qi: (ni, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda ni, mi, qi: (ni, mi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, m, qp, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * qp * p * w * h * d,
            bytes_accessed=n * m * w * h * d * 4 + n * qp * m * p * 3 * 4,
            transcendentals=0,
        ),
    )(loc_t, attn_t, value_t)
    return out  # [N, M, Qp, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in replacement for ops.msda.ms_deform_attn (same signature,
    same semantics), forward on the Pallas kernel."""
    return _forward(value, spatial_shapes, sampling_locations, attention_weights)


def _forward(value, spatial_shapes, loc, attn):
    n, s, m, d = value.shape
    q = loc.shape[1]
    starts = level_splits(spatial_shapes)
    # ONE head-major transpose + bf16 cast for the whole pyramid; per-level
    # slices of it are then free (contiguous S ranges). Only levels on the
    # separable path need their own (W, D*H) relayout.
    value_hm = value.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [N, M, S, D]
    # ONE pad + clean 2D transpose to Q-minor layouts (strided 6D permutes
    # are ~10x off bandwidth on TPU); per-level slices are then free
    nlvl = len(spatial_shapes)
    p = loc.shape[4]
    # pad base 512 = lcm of the separable (256) and flat (512) block sizes
    pad = (-q) % 512
    qp = q + pad
    loc_flat = jnp.pad(
        loc.reshape(n, q, -1), ((0, 0), (0, pad), (0, 0))
    ).transpose(0, 2, 1)                                      # [N, M*L*P*2, Qp]
    loc_qmin = loc_flat.reshape(n, m, nlvl, p * 2, qp)
    attn_flat = jnp.pad(
        attn.reshape(n, q, -1), ((0, 0), (0, pad), (0, 0))
    ).transpose(0, 2, 1)                                      # [N, M*L*P, Qp]
    attn_qmin = attn_flat.reshape(n, m, nlvl, p, qp)
    out = jnp.zeros((n, m, qp, d), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        flat = h * w <= FLAT_LEVEL_MAX_PIXELS
        if flat:
            v_t = value_hm[:, :, starts[lvl] : starts[lvl + 1]]  # [N, M, HW, D]
        else:
            v_t = (
                value_hm[:, :, starts[lvl] : starts[lvl + 1]]
                .reshape(n, m, h, w, d)
                .transpose(0, 1, 3, 4, 2)                     # [N, M, W, D, H]
                .reshape(n, m, w, d * h)                      # d-major lanes
            )
        out = out + _msda_level_pallas(
            v_t, loc_qmin[:, :, lvl], attn_qmin[:, :, lvl], h, w,
            block_q=512 if flat else DEFAULT_BQ, flat=flat,
        )
    out = out.transpose(0, 2, 1, 3)[:, :q]                    # [N, Q, M, D]
    return out.reshape(n, q, m * d).astype(value.dtype)


def _fwd(value, spatial_shapes, loc, attn):
    return _forward(value, spatial_shapes, loc, attn), (value, loc, attn)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn(v, spatial_shapes, l, a), value, loc, attn
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
