"""Pallas TPU kernel for multi-scale deformable attention.

TPU-first design — NOT a port of the CUDA im2col kernel
(reference models/ops/src/cuda/ms_deform_im2col_cuda.cuh): the TPU has no
fast arbitrary gather, but it has a 128x128 systolic array. We therefore
express the zero-padded bilinear tap as dense *separable interpolation
contractions*:

    tap(q) = sum_y sum_x  Wy[q, y] * Wx[q, x] * V[y, x, :]
    Wx[q, x] = relu(1 - |x - px(q)|),   Wy[q, y] = relu(1 - |y - py(q)|)

(each row of Wx/Wy has at most 2 non-zeros, and the relu form reproduces
grid_sample's zero padding exactly — taps sliding off the border lose
weight). The x-contraction becomes an MXU matmul

    S1[P*BQ, D*H] = Wx[P*BQ, W] @ V_t[W, D*H]

with the level's value tile pre-transposed to [W, D*H] (d-major lanes), the
wide y-factor built from iota arithmetic (lane % H), and the y-reduction a
fold matmul against an exact 0/1 matrix. Per grid cell (batch n, head m,
query block) everything lives in VMEM; no HBM gather traffic at all.

Two variants, dispatched by level size:
  * separable (levels above FLAT_LEVEL_MAX_PIXELS pixels): as above;
  * flat (all small levels MERGED into one kernel): each level's full 2D
    interpolation rows from iota arithmetic, concatenated along lanes, one
    [BQ, sum HW] @ [sum HW, D] matmul (each grid cell costs ~2 us fixed —
    merging matters for tiny levels).

Round-2 device-profile-driven choices (full anatomy + measured dead ends in
BASELINE.md):
  * ATTN-WEIGHTED POINT PRE-SUM: the final matmuls are linear in the
    interpolation weights, so the P sampling points are summed BEFORE the
    matmul — the N=D=32-lane MXU passes stop paying 4x for pad lanes;
  * loc/attn arrive as ONE Q-MAJOR pack [N, M, Qp, L*P*3] (queries in
    sublanes end to end; no Q-minor relayout, no in-kernel transposes);
  * tiny query sets (decoder Q=5, FTF tokens Q=8) use 128-query blocks.

The backward is the ANALYTIC Pallas equivalent of the CUDA col2im kernels
(ops/pallas_msda_bwd.py): same dense-separable matmul shapes, 11x over
autodiff-through-the-gather-fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits

DEFAULT_BQ = 1024   # queries per block (separable)
FLAT_BQ = 512      # queries per block (flat)
FLAT_LEVEL_MAX_PIXELS = 1024  # levels at or below use the flat kernel


def _msda_level_kernel(
    qa_ref,    # [1, 1, BQ, L*P*3]  (Q-MAJOR: loc rows then attn rows)
    v_ref,     # [1, 1, W, D*H]  (rows = x, lanes = d-major (d*H + y))
    out_ref,   # [1, 1, BQ, D]
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
    lvl: int,
    nlvl: int,
):
    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)
    # binary fold matrix G[c*H + y, c'] = (c == c'): the y-reduction of a
    # d-major lane vector becomes one matmul (no lane reshapes, which Mosaic
    # does not support). d-major because pltpu.repeat TILES its input:
    # repeat(wy[H], d) = [wy, wy, ...] -> lane index c*H + y.
    rows = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 1)
    fold = (rows // h == cols).astype(jnp.bfloat16)     # [D*H, D] exact 0/1

    v_t = v_ref[0, 0]      # [W, D*H]

    # loc/attn arrive Q-MAJOR (queries in sublanes) — column extraction is a
    # static lane slice; the former Q-minor layout cost an in-kernel
    # [rows, BQ] transpose measured at ~2 ms/call at this level's size
    qa_t = qa_ref[0, 0]    # [BQ, L*P*3]

    def col(which, row):
        if which == "loc":
            r = lvl * p * 2 + row
        else:
            r = nlvl * p * 2 + lvl * p + row
        return qa_t[:, r : r + 1]

    # stack the P points along sublanes -> ONE MXU matmul; attn is folded
    # into the narrow x-factor (everything downstream is linear in it)
    wx_all = jnp.concatenate(
        [
            jnp.maximum(
                0.0, 1.0 - jnp.abs(xs - (col("loc", 2 * pi) * w - 0.5))
            )
            * col("attn", pi)
            for pi in range(p)
        ],
        axis=0,
    )  # [P*BQ, W]
    s1 = jnp.dot(
        wx_all.astype(jnp.bfloat16), v_t.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # f32 accum (Mosaic requirement), bf16 elementwise
    # wide d-major y-factor built directly from iota (lane % H -> y);
    # pltpu.repeat of the narrow [*, H] factor is slower here — tiling a
    # non-128-multiple lane width is all lane rotations
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) % h
    ).astype(jnp.float32)
    wy_all = jnp.concatenate(
        [
            jnp.maximum(
                0.0, 1.0 - jnp.abs(ys_wide - (col("loc", 2 * pi + 1) * h - 0.5))
            )
            for pi in range(p)
        ],
        axis=0,
    ).astype(jnp.bfloat16)  # [P*BQ, D*H]
    s2 = s1 * wy_all
    # the fold is LINEAR: sum the attn-weighted points FIRST, shrinking the
    # N=D-narrow fold matmul's rows P-fold (device profile: the [P*BQ, D*H]
    # fold was ~40% of this kernel)
    s2w = s2[:bq]
    for pi in range(1, p):
        s2w = s2w + s2[pi * bq : (pi + 1) * bq]
    out_ref[0, 0] = jnp.dot(
        s2w, fold, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _msda_multilevel_kernel_flat(
    qa_ref,    # [1, 1, BQ, L*P*3]  (Q-MAJOR: loc rows then attn rows)
    v_ref,     # [1, 1, sum HW_l, D]  (flat row-major pixels, levels stacked)
    out_ref,   # [1, 1, BQ, D]
    *,
    shapes: SpatialShapes,       # the flat levels' (H, W)
    lvl_idx: Tuple[int, ...],    # their level indices into loc/attn rows
    nlvl: int,
    d: int,
    p: int,
    bq: int,
):
    """All small levels in ONE kernel: build each level's 2D interpolation
    rows W2d[q, y*W+x] = relu(1-|y-py|)*relu(1-|x-px|)*attn from iota
    arithmetic (pltpu.repeat-tiled narrow factors were tried and are 3x
    SLOWER — tiling a non-128-multiple lane width is all lane rotations),
    concat along lanes, and take every level's taps with ONE
    [BQ, sum HW] @ [sum HW, D] matmul, P points pre-summed (linearity).
    Merging levels matters because each grid cell costs ~2 us fixed
    (device-profiled: the 60-pixel level measured 0.82 ms for ~0.1 ms of
    work across 400 cells)."""
    v = v_ref[0, 0].astype(jnp.bfloat16)  # [sum HW, D]
    qa_t = qa_ref[0, 0]                   # [BQ, L*P*3] Q-major

    def col(row):
        return qa_t[:, row : row + 1]

    segs = []
    for (h, w), lvl in zip(shapes, lvl_idx):
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, h * w), 1)
        lane_y = (lane // w).astype(jnp.float32)
        lane_x = (lane % w).astype(jnp.float32)

        seg = sum(
            jnp.maximum(
                0.0,
                1.0
                - jnp.abs(
                    lane_x - (col(lvl * p * 2 + 2 * pi) * w - 0.5)
                ),
            )
            * jnp.maximum(
                0.0,
                1.0
                - jnp.abs(
                    lane_y - (col(lvl * p * 2 + 2 * pi + 1) * h - 0.5)
                ),
            )
            * col(nlvl * p * 2 + lvl * p + pi)
            for pi in range(p)
        )
        segs.append(seg)
    w2d = jnp.concatenate(segs, axis=1).astype(jnp.bfloat16)  # [BQ, sum HW]

    out_ref[0, 0] = jnp.dot(
        w2d, v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _msda_sep_level_pallas(
    value_t: jnp.ndarray,   # [N, M, W, D*H] (d-major lanes)
    qa: jnp.ndarray,        # [N, M, Qp, L*P*3] (Q-major loc+attn)
    lvl: int,
    nlvl: int,
    h: int,
    w: int,
    p: int,
    block_q: int = DEFAULT_BQ,
) -> jnp.ndarray:
    n, m, qp, _ = qa.shape
    d = value_t.shape[-1] // h
    grid = (n, m, qp // block_q)

    out = pl.pallas_call(
        functools.partial(
            _msda_level_kernel, h=h, w=w, d=d, p=p, bq=block_q, lvl=lvl,
            nlvl=nlvl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, qa.shape[3]),
                lambda ni, mi, qi: (ni, mi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, d * h),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * qp * p * w * h * d,
            bytes_accessed=n * m * w * h * d * 4 + n * qp * m * p * 3 * 4,
            transcendentals=0,
        ),
    )(qa, value_t)
    return out  # [N, M, Qp, D]


def _msda_flat_levels_pallas(
    value_t: jnp.ndarray,   # [N, M, sum HW, D] (flat levels stacked)
    qa: jnp.ndarray,        # [N, M, Qp, L*P*3] (Q-major loc+attn)
    shapes: SpatialShapes,  # the flat levels' (H, W)
    lvl_idx: Tuple[int, ...],
    nlvl: int,
    p: int,
    block_q: int = FLAT_BQ,
) -> jnp.ndarray:
    n, m, qp, _ = qa.shape
    d = value_t.shape[-1]
    sum_hw = value_t.shape[2]
    grid = (n, m, qp // block_q)

    out = pl.pallas_call(
        functools.partial(
            _msda_multilevel_kernel_flat,
            shapes=shapes, lvl_idx=lvl_idx, nlvl=nlvl, d=d, p=p, bq=block_q,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, qa.shape[3]),
                lambda ni, mi, qi: (ni, mi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sum_hw, d),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * qp * p * sum_hw * d,
            bytes_accessed=n * m * sum_hw * d * 4 + n * qp * m * p * 3 * 4,
            transcendentals=0,
        ),
    )(qa, value_t)
    return out  # [N, M, Qp, D]


def _forward_from_hm(value_hm, spatial_shapes, loc, attn, out_dtype):
    """Shared forward given head-major value [N, M, S, D] (bf16)."""
    n, m, s, d = value_hm.shape
    q = loc.shape[1]
    starts = level_splits(spatial_shapes)
    nlvl = len(spatial_shapes)
    p = loc.shape[4]
    # ONE Q-MAJOR loc+attn pack [N, M, Qp, L*P*3]: the kernels slice columns
    # directly (queries stay in sublanes end to end) — both the old XLA-side
    # Q-minor relayout and the in-kernel [rows, BQ] transposes (~2 ms/call
    # at encoder size, device-ablated) disappear. The (0,2,1,3) transpose
    # moves only the small head axis with 48-float contiguous runs.
    # Tiny query sets (decoder cross-attn Q=5, FTF tokens Q=8) use a 128
    # block so they don't burn 4x their work interpolating pad queries.
    if q <= 128:
        sep_bq = flat_bq = 128
    else:
        sep_bq, flat_bq = DEFAULT_BQ, FLAT_BQ
    pad = (-q) % max(sep_bq, flat_bq)
    qp = q + pad
    qa = jnp.concatenate(
        [loc.reshape(n, q, m, nlvl * p * 2), attn.reshape(n, q, m, nlvl * p)],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > FLAT_LEVEL_MAX_PIXELS
    ]
    flat_lvls = [
        lvl for lvl in range(nlvl) if lvl not in sep_lvls
    ]
    out = jnp.zeros((n, m, qp, d), dtype=jnp.float32)
    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        v_t = (
            value_hm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(0, 1, 3, 4, 2)                     # [N, M, W, D, H]
            .reshape(n, m, w, d * h)                      # d-major lanes
        )
        out = out + _msda_sep_level_pallas(
            v_t, qa, lvl, nlvl, h, w, p, block_q=sep_bq
        )
    if flat_lvls:
        # flat levels are always a contiguous tail (levels shrink 2x each)
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        v_t = value_hm[:, :, starts[flat_lvls[0]] : starts[nlvl]]
        out = out + _msda_flat_levels_pallas(
            v_t, qa,
            tuple(spatial_shapes[lvl] for lvl in flat_lvls),
            tuple(flat_lvls), nlvl, p, block_q=flat_bq,
        )
    out = out.transpose(0, 2, 1, 3)[:, :q]                    # [N, Q, M, D]
    return out.reshape(n, q, m * d).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in replacement for ops.msda.ms_deform_attn (same signature,
    same semantics), forward on the Pallas kernel. value: [N, S, M, D]."""
    return _forward(value, spatial_shapes, sampling_locations, attention_weights)


def _forward(value, spatial_shapes, loc, attn):
    # ONE head-major transpose + bf16 cast for the whole pyramid (profiled
    # at well under 1 ms — round-1's "6 ms relayout" anatomy was wrong)
    value_hm = value.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [N, M, S, D]
    return _forward_from_hm(value_hm, spatial_shapes, loc, attn, value.dtype)


def _bwd_block_sizes(q: int):
    if q <= 128:
        return 128, 128
    return DEFAULT_BQ, FLAT_BQ


def _fwd(value, spatial_shapes, loc, attn):
    return _forward(value, spatial_shapes, loc, attn), (value, loc, attn)


def _bwd(spatial_shapes, res, g):
    from tce_rvos_tpu.ops.pallas_msda_bwd import msda_backward_hm

    value, loc, attn = res
    sep_bq, flat_bq = _bwd_block_sizes(loc.shape[1])
    dv_hm, dloc, dattn = msda_backward_hm(
        value.transpose(0, 2, 1, 3), spatial_shapes, loc, attn, g,
        sep_bq, flat_bq, FLAT_LEVEL_MAX_PIXELS,
    )
    return dv_hm.transpose(0, 2, 1, 3).astype(value.dtype), dloc, dattn


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_hm(
    value_hm: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Head-major variant: ``value_hm`` is [M, N, S, D] (as produced by a
    per-head batched projection, e.g. einsum('nsc,mcd->mnsd')). Semantics
    identical to ``ms_deform_attn_pallas(value_hm.transpose(1,2,0,3), ...)``
    without the [N,S,M,D] -> [N,M,S,D] transpose."""
    return _forward_hm(value_hm, spatial_shapes, sampling_locations, attention_weights)


def _forward_hm(value_hm, spatial_shapes, loc, attn):
    out_dtype = value_hm.dtype
    value_nm = value_hm.transpose(1, 0, 2, 3).astype(jnp.bfloat16)  # [N, M, S, D]
    return _forward_from_hm(value_nm, spatial_shapes, loc, attn, out_dtype)


def _fwd_hm(value_hm, spatial_shapes, loc, attn):
    return _forward_hm(value_hm, spatial_shapes, loc, attn), (value_hm, loc, attn)


def _bwd_hm(spatial_shapes, res, g):
    from tce_rvos_tpu.ops.pallas_msda_bwd import msda_backward_hm

    value_hm, loc, attn = res
    sep_bq, flat_bq = _bwd_block_sizes(loc.shape[1])
    dv, dloc, dattn = msda_backward_hm(
        value_hm.transpose(1, 0, 2, 3), spatial_shapes, loc, attn, g,
        sep_bq, flat_bq, FLAT_LEVEL_MAX_PIXELS,
    )
    return dv.transpose(1, 0, 2, 3).astype(value_hm.dtype), dloc, dattn


ms_deform_attn_pallas_hm.defvjp(_fwd_hm, _bwd_hm)
