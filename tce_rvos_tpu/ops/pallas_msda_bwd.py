"""Analytic Pallas backward for multi-scale deformable attention.

The round-1 build routed the VJP through the XLA gather fallback, which
re-runs the (144 ms-class) gather forward AND its scatter transpose per
backward — the training hot path paid ~20x the Pallas forward per MSDA
call. The reference ships six tuned CUDA col2im kernels for the same
reason (ms_deform_im2col_cuda.cuh:457-1290).

The TPU-native backward reuses the forward's dense-separable formulation
(see ops/pallas_msda.py). With

    out[q, d] = sum_l sum_p attn * sum_xy wx(px) wy(py) V[y, x, d]

all three gradients are the same matmul shapes as the forward:

  * d_attn[q, l, p]  = <g[q, :], tap_{l,p}[q, :]>           (tap recompute)
  * d_px[q, l, p]    = attn * <g, fold((wx' @ V_t) * wy)> * W
    d_py[q, l, p]    = attn * <g, fold((wx @ V_t) * wy')> * H
    where wx' / wy' are the sign-derivative weights
    d/dp relu(1 - |x - p|) = sign(x - p) * 1_{|x - p| < 1}
  * d_V_t[x, (y,d)]  = sum_p wx_p^T @ (attn_p * g_wide * wy_p)  — the
    transposed x-contraction, accumulated over query blocks by revisiting
    the output block along the grid's q axis.

Round-3 structure, mirroring the forward (device-profile-driven):
ALL-HEADS-PER-CELL grids, Y-MAJOR value/dv lanes (lane = y*D + d), and
BANDED VALUE WINDOWS for the encoder's pixel-query prefix blocks —
per-(batch, block) band starts from the actual sampling locations via
scalar prefetch, `lax.cond` full-height fallback when any tap escapes
(exactness for arbitrary offsets). The banded dv kernel accumulates into
a dynamic lane slice of its output block.

Two kernel families mirror the forward dispatch: separable per large
level, one merged kernel for all small (flat) levels.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits

_VMEM = dict(memory_space=pltpu.VMEM)
_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _lin_weight(coord, centers):
    """relu(1 - |coord - centers|) and its derivative wrt `centers`.

    The derivative uses the RIGHT-derivative convention of the oracle /
    grid_sample (whose autodiff flows through floor-constant corners):
    at centers exactly on a grid point x the gradient is -V[x] + V[x+1],
    i.e. delta = 0 contributes -1 and delta = +1 contributes +1. Exact
    integer hits are NOT measure-zero here — normalized locations quantized
    in f32 times small level sizes land on integers routinely."""
    delta = coord - centers
    w = jnp.maximum(0.0, 1.0 - jnp.abs(delta))
    dw = jnp.where(delta > 0.0, 1.0, -1.0) * (
        (delta > -1.0) & (delta <= 1.0)
    ).astype(coord.dtype)
    return w, dw


def _bwd_q_kernel_sep(
    *refs,
    h: int,
    w: int,
    d: int,
    m: int,
    p: int,
    bq: int,
    lvl: int,
    nlvl: int,
    hb: int,
    banded: bool,
):
    """dloc/dattn for one separable level, all heads per cell.

    refs: (band_ref?, qa_ref, g_ref, v_ref, dloc_ref, dattn_ref)
      qa_ref   [1, M, BQ, L*P*3]
      g_ref    [1, M, BQ, D]
      v_ref    [1, M, W, H*D]   y-major lanes
      dloc_ref [1, M, BQ, P*2], dattn_ref [1, M, BQ, P]
    """
    if banded:
        band_ref, qa_ref, g_ref, v_ref, dloc_ref, dattn_ref = refs
        band = band_ref[pl.program_id(0), pl.program_id(1)]
        band_f = band.astype(jnp.float32)
    else:
        qa_ref, g_ref, v_ref, dloc_ref, dattn_ref = refs
        band_f = jnp.float32(0.0)

    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, hb * d), 1) // d
    ).astype(jnp.float32) + band_f
    # g expanded to y-major lanes (g_wide[q, y*D + c] = g[q, c]) via a 0/1
    # matmul, as in the dv kernel. With it, every <g, fold(.)> contraction
    # collapses: <g, fold(s1 * wy)> = rowsum_l(s1 * wy * g_wide)
    #   = rowsum_x(wx * ((wy * g_wide) @ v_t^T)),
    # so the per-point fold matmuls ([BQ, HB*D] @ [HB*D, D], 3 per point)
    # and the bf16-rounded s1/ds1 intermediates disappear; the two
    # remaining matmuls per point contract over the WIDE axis (K = HB*D)
    # and emit narrow [BQ, W] tiles whose rowsums are cheap.
    erows = jax.lax.broadcasted_iota(jnp.int32, (d, hb * d), 0)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (d, hb * d), 1)
    expand = (erows == ecols % d).astype(jnp.bfloat16)      # [D, HB*D]
    dn_t = (((1,), (1,)), ((), ()))  # contract lanes with lanes (rhs^T)

    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 2]
        attn_t = qa_t[:, nlvl * p * 2 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)       # [BQ, D]
        g_wide = jnp.dot(
            g, expand, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)                      # [BQ, HB*D]
        if banded:
            off = pl.multiple_of(band * d, 128)
            v_t = v_ref[0, mi, :, pl.ds(off, hb * d)].astype(jnp.bfloat16)
        else:
            v_t = v_ref[0, mi].astype(jnp.bfloat16)

        dloc_cols = []
        dattn_cols = []
        for pi in range(p):
            px = loc_t[:, lvl * p * 2 + 2 * pi : lvl * p * 2 + 2 * pi + 1] * w - 0.5
            py = loc_t[:, lvl * p * 2 + 2 * pi + 1 : lvl * p * 2 + 2 * pi + 2] * h - 0.5
            a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

            wx, dwx = _lin_weight(xs, px)           # [BQ, W]
            wy, dwy = _lin_weight(ys_wide, py)      # [BQ, HB*D]

            u = wy.astype(jnp.bfloat16) * g_wide    # [BQ, HB*D]
            du = dwy.astype(jnp.bfloat16) * g_wide
            t = jax.lax.dot_general(
                u, v_t, dn_t, preferred_element_type=jnp.float32
            )                                       # [BQ, W]
            t_dy = jax.lax.dot_general(
                du, v_t, dn_t, preferred_element_type=jnp.float32
            )

            dattn_cols.append(jnp.sum(wx * t, axis=1, keepdims=True))
            dloc_cols.append(a * jnp.sum(dwx * t, axis=1, keepdims=True) * w)
            dloc_cols.append(a * jnp.sum(wx * t_dy, axis=1, keepdims=True) * h)

        dloc_ref[0, mi] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
        dattn_ref[0, mi] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _bwd_v_kernel_sep(
    *refs,
    h: int,
    w: int,
    d: int,
    m: int,
    p: int,
    bq: int,
    lvl: int,
    nlvl: int,
    hb: int,
    banded: bool,
):
    """d_value for one separable level, all heads per cell; the dv output
    block is revisited (accumulated) along the grid's q axis. Banded cells
    accumulate into a dynamic lane slice.

    refs: (band_ref?, qa_ref, lqm_ref, g_ref, dv_ref)
      lqm_ref [1, M, L*P*2, BQ]  Q-minor loc (x rows needed in lane form)
      dv_ref  [1, M, W, H*D] y-major (f32)
    """
    if banded:
        band_ref, qa_ref, lqm_ref, g_ref, dv_ref = refs
        band = band_ref[pl.program_id(0), pl.program_id(1)]
        band_f = band.astype(jnp.float32)
    else:
        qa_ref, lqm_ref, g_ref, dv_ref = refs
        band_f = jnp.float32(0.0)

    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _zero():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    xs_t = jax.lax.broadcasted_iota(jnp.int32, (w, bq), 0).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, hb * d), 1) // d
    ).astype(jnp.float32) + band_f
    # g expanded to y-major lanes: g_wide[q, y*D + c] = g[q, c], via a 0/1
    # matmul (no lane gathers on TPU)
    erows = jax.lax.broadcasted_iota(jnp.int32, (d, hb * d), 0)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (d, hb * d), 1)
    expand = (erows == ecols % d).astype(jnp.bfloat16)      # [D, HB*D]

    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 2]
        attn_t = qa_t[:, nlvl * p * 2 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)
        g_wide = jnp.dot(
            g, expand, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)                              # [BQ, HB*D]

        acc = jnp.zeros((w, hb * d), jnp.float32)
        for pi in range(p):
            r = lvl * p * 2 + 2 * pi
            px_row = lqm_ref[0, mi, r : r + 1, :] * w - 0.5  # [1, BQ]
            py = loc_t[:, r + 1 : r + 2] * h - 0.5
            a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

            wx_t = jnp.maximum(0.0, 1.0 - jnp.abs(xs_t - px_row))  # [W, BQ]
            wy, _ = _lin_weight(ys_wide, py)                       # [BQ, HB*D]
            z = (a * wy).astype(jnp.bfloat16) * g_wide             # [BQ, HB*D]
            acc = acc + jnp.dot(
                wx_t.astype(jnp.bfloat16), z, preferred_element_type=jnp.float32
            )
        if banded:
            off = pl.multiple_of(band * d, 128)
            cur = dv_ref[0, mi, :, pl.ds(off, hb * d)]
            dv_ref[0, mi, :, pl.ds(off, hb * d)] = cur + acc.astype(dv_ref.dtype)
        else:
            dv_ref[0, mi] = dv_ref[0, mi] + acc.astype(dv_ref.dtype)


def _bwd_q_kernel_flat(
    *refs,
    shapes: SpatialShapes,
    lvl_idx: Tuple[int, ...],
    nlvl: int,
    d: int,
    m: int,
    p: int,
    bq: int,
    hb1: int,
    banded: bool,
):
    """dloc/dattn for all flat levels merged, all heads per cell. When
    ``banded`` the FIRST flat level's value rows are windowed.

    refs: (band_ref?, qa_ref, g_ref, v_ref, dloc_ref, dattn_ref)
      v_ref [1, M, sum HW, D]
      dloc_ref [1, M, BQ, n_flat*P*2], dattn_ref [1, M, BQ, n_flat*P]
    """
    if banded:
        band_ref, qa_ref, g_ref, v_ref, dloc_ref, dattn_ref = refs
        band1 = band_ref[pl.program_id(0), pl.program_id(1)]
    else:
        qa_ref, g_ref, v_ref, dloc_ref, dattn_ref = refs

    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + hh * ww)

    # vg[q, s] = <g[q, :], V[s, :]> — ONE rhs-transposed matmul per
    # (head, level) replaces the THREE tap matmuls per (head, level, point):
    # <g, (wx*wy) @ V> = rowsum_s(wx * wy * vg), etc.
    dn_t = (((1,), (1,)), ((), ()))

    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 2]
        attn_t = qa_t[:, nlvl * p * 2 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)

        dloc_cols = []
        dattn_cols = []
        for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
            if banded and li == 0:
                nrow = hb1
                y_base = band1.astype(jnp.float32)
                vi = v_ref[0, mi, pl.ds(band1 * w, hb1 * w), :].astype(
                    jnp.bfloat16
                )
            else:
                nrow = h
                y_base = jnp.float32(0.0)
                vi = v_ref[0, mi, starts[li] : starts[li + 1], :].astype(
                    jnp.bfloat16
                )
            vg = jax.lax.dot_general(
                g, vi, dn_t, preferred_element_type=jnp.float32
            )                                               # [BQ, nrow*w]
            lane = jax.lax.broadcasted_iota(jnp.int32, (bq, nrow * w), 1)
            lane_y = (lane // w).astype(jnp.float32) + y_base
            lane_x = (lane % w).astype(jnp.float32)
            for pi in range(p):
                px = loc_t[:, lvl * p * 2 + 2 * pi : lvl * p * 2 + 2 * pi + 1] * w - 0.5
                py = loc_t[:, lvl * p * 2 + 2 * pi + 1 : lvl * p * 2 + 2 * pi + 2] * h - 0.5
                a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]
                wx, dwx = _lin_weight(lane_x, px)
                wy, dwy = _lin_weight(lane_y, py)
                wyvg = wy * vg
                dattn_cols.append(
                    jnp.sum(wx * wyvg, axis=1, keepdims=True))
                dloc_cols.append(
                    a * jnp.sum(dwx * wyvg, axis=1, keepdims=True) * w)
                dloc_cols.append(
                    a * jnp.sum((wx * vg) * dwy, axis=1, keepdims=True) * h)

        dloc_ref[0, mi] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
        dattn_ref[0, mi] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _bwd_v_kernel_flat(
    *refs,
    shapes: SpatialShapes,
    lvl_idx: Tuple[int, ...],
    d: int,
    m: int,
    p: int,
    bq: int,
    nlvl: int,
    hb1: int,
    banded: bool,
):
    """d_value for the merged flat levels, all heads per cell, accumulated
    along the grid's q axis. The banded first level accumulates into a
    dynamic sublane slice.

    refs: (band_ref?, lqm_ref, aqm_ref, g_ref, dv_ref)
      lqm_ref [1, M, L*P*2, BQ] / aqm_ref [1, M, L*P, BQ]  Q-minor loc/attn
      dv_ref  [1, M, sum HW, D] f32
    """
    if banded:
        band_ref, lqm_ref, aqm_ref, g_ref, dv_ref = refs
        band1 = band_ref[pl.program_id(0), pl.program_id(1)]
    else:
        lqm_ref, aqm_ref, g_ref, dv_ref = refs

    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _zero():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + hh * ww)

    for mi in range(m):
        g = g_ref[0, mi].astype(jnp.bfloat16)               # [BQ, D]

        for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
            if banded and li == 0:
                nrow = hb1
                y_base = band1.astype(jnp.float32)
            else:
                nrow = h
                y_base = jnp.float32(0.0)
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nrow * w, bq), 0)
            ry = (rows_i // w).astype(jnp.float32) + y_base
            rx = (rows_i % w).astype(jnp.float32)
            seg = None
            for pi in range(p):
                r = lvl * p * 2 + 2 * pi
                px_row = lqm_ref[0, mi, r : r + 1, :] * w - 0.5
                py_row = lqm_ref[0, mi, r + 1 : r + 2, :] * h - 0.5
                a_row = aqm_ref[0, mi, lvl * p + pi : lvl * p + pi + 1, :]
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - px_row))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - py_row))
                term = wx * wy * a_row
                seg = term if seg is None else seg + term
            contrib = jnp.dot(
                seg.astype(jnp.bfloat16), g, preferred_element_type=jnp.float32
            ).astype(dv_ref.dtype)                          # [nrow*w, D]
            if banded and li == 0:
                sl = pl.ds(band1 * w, hb1 * w)
                dv_ref[0, mi, sl, :] = dv_ref[0, mi, sl, :] + contrib
            else:
                lo = starts[li]
                hi = starts[li + 1]
                dv_ref[0, mi, lo:hi, :] = dv_ref[0, mi, lo:hi, :] + contrib


def _pallas(kernel, grid, in_specs, out_specs, out_shape, band=None):
    if band is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs,
        )
        return functools.partial(
            pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=_LIMIT,
            ),
            band,
        )
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, compiler_params=_LIMIT,
    )


def msda_backward_nmq(
    value_hm: jnp.ndarray,     # [N, M, S, D] head-major value (as forward)
    spatial_shapes: SpatialShapes,
    loc: jnp.ndarray,          # [N, M, Q, L, P, 2] (nmq — head-major)
    attn: jnp.ndarray,         # [N, M, Q, L, P]
    g: jnp.ndarray,            # [N, Q, M*D] upstream cotangent
    bq: int,                   # shared Q-block size for sep + flat kernels
    flat_max_pixels: int,
    pixel_queries: bool = False,
):
    """Returns (d_value_hm [N, M, S, D] f32, d_loc, d_attn) — loc/attn
    gradients in the same nmq layout as the inputs."""
    from tce_rvos_tpu.ops.pallas_msda import (
        _banded_parts,
        _flat_band_rows,
        _query_groups,
        _sep_band_rows,
        _span_rows,
    )

    n, m, s, d = value_hm.shape
    q = loc.shape[2]
    nlvl = len(spatial_shapes)
    p = loc.shape[4]
    starts = level_splits(spatial_shapes)
    value_hm = value_hm.astype(jnp.bfloat16)

    pad = (-q) % bq
    qp = q + pad
    nblk = qp // bq
    # Q-major pack (same layout as the forward): head-major inputs make it
    # a minor-axis concat + pad, no transposes
    qa = jnp.concatenate(
        [loc.reshape(n, m, q, nlvl * p * 2), attn.reshape(n, m, q, nlvl * p)],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, 0), (0, pad), (0, 0)))
    g_nm = jnp.pad(
        g.reshape(n, q, m, d), ((0, 0), (0, pad), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)                                 # [N, M, Qp, D]
    # Q-minor layouts for the value-grad kernels (their transposed builds
    # want queries in lanes): per-head last-two-axes transposes
    loc_qmin = jnp.pad(
        loc.reshape(n, m, q, -1), ((0, 0), (0, 0), (0, pad), (0, 0))
    ).transpose(0, 1, 3, 2)                  # [N, M, L*P*2, Qp]
    attn_qmin = jnp.pad(
        attn.reshape(n, m, q, -1), ((0, 0), (0, 0), (0, pad), (0, 0))
    ).transpose(0, 1, 3, 2)                  # [N, M, L*P, Qp]

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > flat_max_pixels
    ]
    flat_lvls = [lvl for lvl in range(nlvl) if lvl not in sep_lvls]

    # same data-driven banded groups as the forward (see _query_groups)
    groups = _query_groups(spatial_shapes, q, qp, bq, pixel_queries)

    k = qa.shape[3]

    def qa_spec(blk_off):
        return pl.BlockSpec(
            (1, m, bq, k), lambda ni, qi, *_: (ni, 0, qi + blk_off, 0), **_VMEM
        )

    def g_spec(blk_off):
        return pl.BlockSpec(
            (1, m, bq, d), lambda ni, qi, *_: (ni, 0, qi + blk_off, 0), **_VMEM
        )

    def lqm_spec(blk_off):
        return pl.BlockSpec(
            (1, m, nlvl * p * 2, bq),
            lambda ni, qi, *_: (ni, 0, 0, qi + blk_off), **_VMEM,
        )

    def aqm_spec(blk_off):
        return pl.BlockSpec(
            (1, m, nlvl * p, bq),
            lambda ni, qi, *_: (ni, 0, 0, qi + blk_off), **_VMEM,
        )

    dloc_lvl = [None] * nlvl    # each [N, M, Qp(assembled), P*2]
    dattn_lvl = [None] * nlvl
    dvalue_rows = [None] * nlvl  # each [N, M, HW_l, D] natural layout (f32)

    # ---- separable levels ----
    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        v_y = (
            value_hm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, m, w, h * d)
        )
        def run_sep(band, hb, blk_off, cnt):
            kq = functools.partial(
                _bwd_q_kernel_sep, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl,
                nlvl=nlvl, hb=hb, banded=band is not None,
            )
            v_spec = pl.BlockSpec(
                (1, m, w, h * d), lambda ni, qi, *_: (ni, 0, 0, 0), **_VMEM
            )
            dq = _pallas(
                kq, (n, cnt),
                [qa_spec(blk_off), g_spec(blk_off), v_spec],
                [
                    pl.BlockSpec(
                        (1, m, bq, p * 2),
                        lambda ni, qi, *_: (ni, 0, qi, 0), **_VMEM,
                    ),
                    pl.BlockSpec(
                        (1, m, bq, p),
                        lambda ni, qi, *_: (ni, 0, qi, 0), **_VMEM,
                    ),
                ],
                [
                    jax.ShapeDtypeStruct((n, m, cnt * bq, p * 2), jnp.float32),
                    jax.ShapeDtypeStruct((n, m, cnt * bq, p), jnp.float32),
                ],
                band=band,
            )(qa, g_nm, v_y)

            kv = functools.partial(
                _bwd_v_kernel_sep, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl,
                nlvl=nlvl, hb=hb, banded=band is not None,
            )
            dv = _pallas(
                kv, (n, cnt),
                [qa_spec(blk_off), lqm_spec(blk_off), g_spec(blk_off)],
                pl.BlockSpec(
                    (1, m, w, h * d), lambda ni, qi, *_: (ni, 0, 0, 0), **_VMEM
                ),
                jax.ShapeDtypeStruct((n, m, w, h * d), jnp.float32),
                band=band,
            )(qa, loc_qmin, g_nm)
            return dq[0], dq[1], dv

        parts = _banded_parts(
            groups, loc, lvl, h, bq, quant=max(128 // d, 1), full_hb=h,
            rows_fn=lambda j: _sep_band_rows(
                h, d, _span_rows(bq, spatial_shapes[j], h)),
            run=run_sep,
        )
        dloc_lvl[lvl] = jnp.concatenate([x[0] for x in parts], axis=2)
        dattn_lvl[lvl] = jnp.concatenate([x[1] for x in parts], axis=2)
        dv_t = parts[0][2]
        for x in parts[1:]:
            dv_t = dv_t + x[2]
        dvalue_rows[lvl] = (
            dv_t.reshape(n, m, w, h, d)
            .transpose(0, 1, 3, 2, 4)                 # [N, M, H, W, D]
            .reshape(n, m, h * w, d)
        )

    # ---- flat levels (merged) ----
    if flat_lvls:
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        f_shapes = tuple(spatial_shapes[lvl] for lvl in flat_lvls)
        sum_hw = sum(hh * ww for hh, ww in f_shapes)
        v_flat = value_hm[:, :, starts[flat_lvls[0]] : starts[nlvl]]
        nfl = len(flat_lvls)
        h1, w1 = f_shapes[0]
        flat_bandable = h1 * w1 > flat_max_pixels // 2 and w1 % 8 == 0

        def run_flat(band, hb, blk_off, cnt):
            kq = functools.partial(
                _bwd_q_kernel_flat, shapes=f_shapes, lvl_idx=tuple(flat_lvls),
                nlvl=nlvl, d=d, m=m, p=p, bq=bq, hb1=hb,
                banded=band is not None,
            )
            v_spec = pl.BlockSpec(
                (1, m, sum_hw, d), lambda ni, qi, *_: (ni, 0, 0, 0), **_VMEM
            )
            dq = _pallas(
                kq, (n, cnt),
                [qa_spec(blk_off), g_spec(blk_off), v_spec],
                [
                    pl.BlockSpec(
                        (1, m, bq, nfl * p * 2),
                        lambda ni, qi, *_: (ni, 0, qi, 0), **_VMEM,
                    ),
                    pl.BlockSpec(
                        (1, m, bq, nfl * p),
                        lambda ni, qi, *_: (ni, 0, qi, 0), **_VMEM,
                    ),
                ],
                [
                    jax.ShapeDtypeStruct(
                        (n, m, cnt * bq, nfl * p * 2), jnp.float32
                    ),
                    jax.ShapeDtypeStruct((n, m, cnt * bq, nfl * p), jnp.float32),
                ],
                band=band,
            )(qa, g_nm, v_flat)

            kv = functools.partial(
                _bwd_v_kernel_flat, shapes=f_shapes, lvl_idx=tuple(flat_lvls),
                d=d, m=m, p=p, bq=bq, nlvl=nlvl, hb1=hb,
                banded=band is not None,
            )
            dv = _pallas(
                kv, (n, cnt),
                [lqm_spec(blk_off), aqm_spec(blk_off), g_spec(blk_off)],
                pl.BlockSpec(
                    (1, m, sum_hw, d), lambda ni, qi, *_: (ni, 0, 0, 0), **_VMEM
                ),
                jax.ShapeDtypeStruct((n, m, sum_hw, d), jnp.float32),
                band=band,
            )(loc_qmin, attn_qmin, g_nm)
            return dq[0], dq[1], dv

        parts = _banded_parts(
            groups, loc, flat_lvls[0], h1, bq, quant=1, full_hb=0,
            rows_fn=lambda j: (
                _flat_band_rows(h1, _span_rows(bq, spatial_shapes[j], h1))
                if flat_bandable else 0),
            run=run_flat,
        )
        dloc_f = jnp.concatenate([x[0] for x in parts], axis=2)
        dattn_f = jnp.concatenate([x[1] for x in parts], axis=2)
        dv_flat = parts[0][2]
        for x in parts[1:]:
            dv_flat = dv_flat + x[2]
        for li, lvl in enumerate(flat_lvls):
            dloc_lvl[lvl] = dloc_f[..., li * p * 2 : (li + 1) * p * 2]
            dattn_lvl[lvl] = dattn_f[..., li * p : (li + 1) * p]
        off2 = 0
        for li, lvl in enumerate(flat_lvls):
            hh, ww = f_shapes[li]
            dvalue_rows[lvl] = dv_flat[:, :, off2 : off2 + hh * ww]
            off2 += hh * ww

    d_value_hm = jnp.concatenate(dvalue_rows, axis=2)       # [N, M, S, D] f32

    # ---- q-side reassembly: [N, M, Qp, *] -> nmq loc/attn shapes (a stack
    # along a NEW axis 3 — no transposes in the head-major layout) ----
    d_loc = jnp.stack(
        [x[:, :, :q] for x in dloc_lvl], axis=3
    ).reshape(n, m, q, nlvl, p, 2)                          # [N, M, Q, L, P, 2]
    d_attn = jnp.stack(
        [x[:, :, :q] for x in dattn_lvl], axis=3
    )                                                       # [N, M, Q, L, P]
    return d_value_hm, d_loc.astype(loc.dtype), d_attn.astype(attn.dtype)
