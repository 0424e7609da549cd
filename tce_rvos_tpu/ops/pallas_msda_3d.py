"""Pallas TPU kernel for the temporal (``is_3d``) MSDA branch.

The reference CUDA kernel's ``is_3d`` branch
(models/ops/src/cuda/ms_deform_im2col_cuda.cuh:366-420) adds a third
sampling coordinate: a fractional frame index; each tap bilinearly samples
the two neighbouring frames and lerps between them (frames outside
[0, N-1] contribute zero).

TPU-first observation: the temporal lerp is the SAME hat function as the
spatial bilinear factors —

    w_f(frame) = relu(1 - |frame - f_im|),  f_im = f * N - 0.5

is (1-df) at floor(f_im), df at floor(f_im)+1 and zero elsewhere, and the
out-of-range frames simply have no column. So the dense-separable
formulation of :mod:`tce_rvos_tpu.ops.pallas_msda` extends to 3D by
multiplying the x-factor with a per-frame scalar weight and accumulating
the x-contraction over the (static) frame loop:

    S1 = sum_f  (Wx * w_f)[P*BQ, W] @ V_f[W, H*D]

The y-factor and the binary fold matmul are frame-independent and linear,
so they apply once to the frame-summed S1 — the 3D kernel costs N_frames
x-contractions instead of one, with no gather traffic and no extra
epilogues.

Forward-only by design: no production reference config enables ``is_3d``
(SURVEY.md §2.1), so training 3D stays on the autodiff'd XLA path
(:func:`tce_rvos_tpu.ops.msda.ms_deform_attn_3d`); this kernel makes the
mode fast where it would be used (inference experiments).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits
from tce_rvos_tpu.ops.pallas_msda import (
    DEFAULT_BQ,
    FLAT_LEVEL_MAX_PIXELS,
    TINY_BQ,
    _LIMIT,
)


def _sep_kernel_3d(qa_ref, v_ref, out_ref, *, h, w, d, m, p, bq, lvl, nlvl,
                   nfrm):
    """Separable-level 3D kernel, all heads per cell.

    qa_ref  [1, M, BQ, L*P*4]   Q-major: loc xyz rows then attn rows
    v_ref   [NFRM, M, W, H*D]   the FULL frame axis (every cell reads all
                                frames; the temporal tap crosses batches)
    out_ref [1, BQ, M*D]
    """
    lane_y = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) // d
    ).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 1)
    fold = (rows % d == cols).astype(jnp.bfloat16)
    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)

    for mi in range(m):
        qa_t = qa_ref[0, mi]  # [BQ, L*P*4]

        def col(which, row):
            if which == "loc":
                r = lvl * p * 3 + row
            else:
                r = nlvl * p * 3 + lvl * p + row
            return qa_t[:, r : r + 1]

        # spatial x-factor with attn folded in (downstream is linear),
        # one [BQ, W] block per point (Mosaic cannot concat [BQ, 1]
        # slivers along sublanes, so the frame weight multiplies each
        # point's WIDE block before the concat)
        wx_p = [
            jnp.maximum(
                0.0, 1.0 - jnp.abs(xs - (col("loc", 3 * pi) * w - 0.5))
            )
            * col("attn", pi)
            for pi in range(p)
        ]
        fim_p = [col("loc", 3 * pi + 2) * nfrm - 0.5 for pi in range(p)]
        s1 = jnp.zeros((p * bq, h * d), jnp.float32)
        for fi in range(nfrm):
            wxf = jnp.concatenate(
                [
                    wx_p[pi]
                    * jnp.maximum(0.0, 1.0 - jnp.abs(fim_p[pi] - fi))
                    for pi in range(p)
                ],
                axis=0,
            )  # [P*BQ, W]
            s1 = s1 + jnp.dot(
                wxf.astype(jnp.bfloat16),
                v_ref[fi, mi].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        wy_all = jnp.concatenate(
            [
                jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(lane_y - (col("loc", 3 * pi + 1) * h - 0.5)),
                )
                for pi in range(p)
            ],
            axis=0,
        ).astype(jnp.bfloat16)
        s2 = s1.astype(jnp.bfloat16) * wy_all
        s2w = s2[:bq]
        for pi in range(1, p):
            s2w = s2w + s2[pi * bq : (pi + 1) * bq]
        out_ref[0, :, mi * d : (mi + 1) * d] = jnp.dot(
            s2w, fold, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _flat_kernel_3d(qa_ref, v_ref, out_ref, *, shapes, lvl_idx, nlvl, d, m,
                    p, bq, nfrm):
    """All small levels in one 3D kernel: per frame, build each level's 2D
    interpolation rows weighted by that frame's temporal hat weight, concat
    along lanes, one [BQ, sum HW] @ [sum HW, D] matmul; accumulate over the
    static frame loop.

    v_ref [NFRM, M, sum HW, D]
    """
    for mi in range(m):
        qa_t = qa_ref[0, mi]

        def col(row):
            return qa_t[:, row : row + 1]

        acc = jnp.zeros((bq, d), jnp.float32)
        for fi in range(nfrm):
            segs = []
            for (h, w), lvl in zip(shapes, lvl_idx):
                lane = jax.lax.broadcasted_iota(jnp.int32, (bq, h * w), 1)
                lane_yf = (lane // w).astype(jnp.float32)
                lane_xf = (lane % w).astype(jnp.float32)
                seg = sum(
                    jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(
                            lane_xf - (col(lvl * p * 3 + 3 * pi) * w - 0.5)
                        ),
                    )
                    * jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(
                            lane_yf
                            - (col(lvl * p * 3 + 3 * pi + 1) * h - 0.5)
                        ),
                    )
                    * jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(
                            (col(lvl * p * 3 + 3 * pi + 2) * nfrm - 0.5) - fi
                        ),
                    )
                    * col(nlvl * p * 3 + lvl * p + pi)
                    for pi in range(p)
                )
                segs.append(seg)
            w2d = jnp.concatenate(segs, axis=1).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                w2d, v_ref[fi, mi].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, mi * d : (mi + 1) * d] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_3d(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pallas forward of :func:`tce_rvos_tpu.ops.msda.ms_deform_attn_3d`
    (same signature/semantics — the batch axis doubles as time), with the
    analytic Pallas backward (ops/pallas_msda_3d_bwd.py — the TPU
    counterpart of the reference's dedicated 3D col2im CUDA kernel,
    ms_deform_im2col_cuda.cuh:566-714,1461-1507).

    value: [N, S, M, D]; sampling_locations: [N, Q, M, L, P, 3] with
    normalized (x, y, f); attention_weights: [N, Q, M, L, P].
    Returns [N, Q, M*D].
    """
    n, s, m, d = value.shape
    q = sampling_locations.shape[1]
    nlvl = len(spatial_shapes)
    p = sampling_locations.shape[4]
    starts = level_splits(spatial_shapes)

    value_nm = value.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [N,M,S,D]

    bq = TINY_BQ if q <= TINY_BQ else DEFAULT_BQ
    pad = (-q) % bq
    qp = q + pad
    nblk = qp // bq
    qa = jnp.concatenate(
        [
            sampling_locations.reshape(n, q, m, nlvl * p * 3),
            attention_weights.reshape(n, q, m, nlvl * p),
        ],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    k = qa.shape[-1]

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > FLAT_LEVEL_MAX_PIXELS
    ]
    flat_lvls = [lvl for lvl in range(nlvl) if lvl not in sep_lvls]

    qa_spec = pl.BlockSpec(
        (1, m, bq, k), lambda ni, qi: (ni, 0, qi, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, bq, m * d), lambda ni, qi: (ni, qi, 0), memory_space=pltpu.VMEM
    )
    # partials in f32: the cross-level sum must not round each level's
    # contribution to the caller's (possibly bf16) dtype first — same
    # invariant as the 2D forward; ONE cast at the end
    out_shape = jax.ShapeDtypeStruct((n, nblk * bq, m * d), jnp.float32)

    out = None
    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        v_y = (
            value_nm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, m, w, h * d)
        )
        kern = functools.partial(
            _sep_kernel_3d, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl,
            nlvl=nlvl, nfrm=n,
        )
        v_spec = pl.BlockSpec(
            (n, m, w, h * d), lambda ni, qi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        part = pl.pallas_call(
            kern, grid=(n, nblk), in_specs=[qa_spec, v_spec],
            out_specs=out_spec, out_shape=out_shape, compiler_params=_LIMIT,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * nblk * bq * p * n * w * h * d,
                bytes_accessed=n * m * w * h * d * 2 + n * nblk * bq * m * k * 4,
                transcendentals=0,
            ),
        )(qa, v_y)
        out = part if out is None else out + part

    if flat_lvls:
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        v_f = value_nm[:, :, starts[flat_lvls[0]] : starts[nlvl]]
        shapes_f = tuple(spatial_shapes[lvl] for lvl in flat_lvls)
        sum_hw = v_f.shape[2]
        kern = functools.partial(
            _flat_kernel_3d, shapes=shapes_f, lvl_idx=tuple(flat_lvls),
            nlvl=nlvl, d=d, m=m, p=p, bq=bq, nfrm=n,
        )
        v_spec = pl.BlockSpec(
            (n, m, sum_hw, d), lambda ni, qi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        part = pl.pallas_call(
            kern, grid=(n, nblk), in_specs=[qa_spec, v_spec],
            out_specs=out_spec, out_shape=out_shape, compiler_params=_LIMIT,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * nblk * bq * p * n * sum_hw * d,
                bytes_accessed=n * m * sum_hw * d * 2
                + n * nblk * bq * m * k * 4,
                transcendentals=0,
            ),
        )(qa, v_f)
        out = part if out is None else out + part

    return out[:, :q].astype(value.dtype)


def _fwd_3d(value, spatial_shapes, loc, attn):
    return (
        ms_deform_attn_pallas_3d(value, spatial_shapes, loc, attn),
        (value, loc, attn),
    )


def _bwd_3d(spatial_shapes, res, g):
    from tce_rvos_tpu.ops.pallas_msda_3d_bwd import msda_backward_3d

    value, loc, attn = res
    dv, dloc, dattn = msda_backward_3d(value, spatial_shapes, loc, attn, g)
    return dv.astype(value.dtype), dloc, dattn


ms_deform_attn_pallas_3d.defvjp(_fwd_3d, _bwd_3d)
