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

FLOP cost is Q*W*H*D per (head, point) — dense — but at TCE-RVOS sizes
(stride-8 level of a 360p frame: H*W=45x80, D=32) this is ~0.2 ms/frame on
a v5e MXU, which beats a gather-bound formulation by an order of magnitude.

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

DEFAULT_BQ = 128  # queries per block


def _msda_level_kernel(
    loc_ref,   # [1, BQ, 1, P, 2]
    attn_ref,  # [1, BQ, 1, P]
    v_ref,     # [1, 1, W, H*D]
    out_ref,   # [1, BQ, 1, D]
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
):
    loc = loc_ref[0, :, 0]        # [BQ, P, 2]
    attn = attn_ref[0, :, 0]      # [BQ, P]
    v_t = v_ref[0, 0]             # [W, H*D]

    px = (loc[:, :, 0] * w - 0.5).reshape(bq * p, 1)   # [BQ*P, 1]
    py = (loc[:, :, 1] * h - 0.5).reshape(bq * p, 1)

    xs = jax.lax.broadcasted_iota(jnp.float32, (bq * p, w), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - px))       # [BQ*P, W]

    s1 = jnp.dot(wx, v_t, preferred_element_type=jnp.float32)  # [BQ*P, H*D]

    ys = jax.lax.broadcasted_iota(jnp.float32, (bq * p, h), 1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - py))       # [BQ*P, H]

    s1 = s1.reshape(bq * p, h, d)
    s2 = jnp.sum(s1 * wy[:, :, None], axis=1)           # [BQ*P, D]
    s2 = s2.reshape(bq, p, d)
    out = jnp.sum(s2 * attn[:, :, None], axis=1)        # [BQ, D]
    out_ref[0, :, 0, :] = out.astype(out_ref.dtype)


def _msda_level_pallas(
    value_t: jnp.ndarray,   # [N, M, W, H*D] (pre-transposed level tile)
    loc: jnp.ndarray,       # [N, Q, M, P, 2]
    attn: jnp.ndarray,      # [N, Q, M, P]
    h: int,
    w: int,
    block_q: int = DEFAULT_BQ,
) -> jnp.ndarray:
    n, q, m, p, _ = loc.shape
    d = value_t.shape[-1] // h
    pad = (-q) % block_q
    if pad:
        loc = jnp.pad(loc, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qp = q + pad
    grid = (n, m, qp // block_q)

    out = pl.pallas_call(
        functools.partial(
            _msda_level_kernel, h=h, w=w, d=d, p=p, bq=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 1, p, 2),
                lambda ni, mi, qi: (ni, qi, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, 1, p),
                lambda ni, mi, qi: (ni, qi, mi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, h * d),
                lambda ni, mi, qi: (ni, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 1, d),
            lambda ni, mi, qi: (ni, qi, mi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, qp, m, d), value_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * qp * p * w * h * d,
            bytes_accessed=n * m * w * h * d * 4 + n * qp * m * p * 3 * 4,
            transcendentals=0,
        ),
    )(loc, attn, value_t)
    return out[:, :q]


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
    out = jnp.zeros((n, q, m, d), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lvl] : starts[lvl + 1]]          # [N, H*W, M, D]
        v_t = (
            v.reshape(n, h, w, m, d)
            .transpose(0, 3, 2, 1, 4)                         # [N, M, W, H, D]
            .reshape(n, m, w, h * d)
        )
        out = out + _msda_level_pallas(
            v_t, loc[:, :, :, lvl], attn[:, :, :, lvl], h, w
        )
    return out.reshape(n, q, m * d)


def _fwd(value, spatial_shapes, loc, attn):
    return _forward(value, spatial_shapes, loc, attn), (value, loc, attn)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn(v, spatial_shapes, l, a), value, loc, attn
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
