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
  * d_V_t[x, (d,y)]  = sum_p wx_p^T @ (attn_p * g_wide * wy_p)  — the
    transposed x-contraction, accumulated over query blocks by revisiting
    the output block along the grid's q axis.

Two kernel families mirror the forward dispatch: separable per large
level, one merged kernel for all small (flat) levels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits

_VMEM = dict(memory_space=pltpu.VMEM)
_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


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


def _msda_bwd_q_kernel_sep(
    qa_ref,     # [1, 1, BQ, L*P*3]  (Q-MAJOR loc+attn, as the forward)
    g_ref,      # [1, 1, BQ, D]
    v_ref,      # [1, 1, W, D*H]  (d-major)
    dloc_ref,   # [1, 1, BQ, P*2]  (this level's rows only)
    dattn_ref,  # [1, 1, BQ, P]
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
    lvl: int,
    nlvl: int,
):
    v_t = v_ref[0, 0].astype(jnp.bfloat16)
    g = g_ref[0, 0].astype(jnp.bfloat16)            # [BQ, D]
    qa_t = qa_ref[0, 0]
    loc_t = qa_t[:, : nlvl * p * 2]
    attn_t = qa_t[:, nlvl * p * 2 :]

    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) % h
    ).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * d, d), 1)
    fold = (rows // h == cols).astype(jnp.bfloat16)

    dloc_cols = []
    dattn_cols = []
    for pi in range(p):
        px = loc_t[:, lvl * p * 2 + 2 * pi : lvl * p * 2 + 2 * pi + 1] * w - 0.5
        py = loc_t[:, lvl * p * 2 + 2 * pi + 1 : lvl * p * 2 + 2 * pi + 2] * h - 0.5
        a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

        wx, dwx = _lin_weight(xs, px)               # [BQ, W]
        wy, dwy = _lin_weight(ys_wide, py)          # [BQ, D*H]
        wy = wy.astype(jnp.bfloat16)

        s1 = jnp.dot(
            wx.astype(jnp.bfloat16), v_t, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)                      # [BQ, D*H]
        ds1 = jnp.dot(
            dwx.astype(jnp.bfloat16), v_t, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

        tap = jnp.dot(s1 * wy, fold, preferred_element_type=jnp.float32)
        tap_dx = jnp.dot(ds1 * wy, fold, preferred_element_type=jnp.float32)
        tap_dy = jnp.dot(
            s1 * dwy.astype(jnp.bfloat16), fold, preferred_element_type=jnp.float32
        )

        gf = g.astype(jnp.float32)
        dattn_cols.append(jnp.sum(gf * tap, axis=1, keepdims=True))
        dloc_cols.append(a * jnp.sum(gf * tap_dx, axis=1, keepdims=True) * w)
        dloc_cols.append(a * jnp.sum(gf * tap_dy, axis=1, keepdims=True) * h)

    dloc_ref[0, 0] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
    dattn_ref[0, 0] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _msda_bwd_v_kernel_sep(
    loc_ref,    # [1, 1, L*P*2, BQ]
    attn_ref,   # [1, 1, L*P, BQ]
    g_ref,      # [1, 1, BQ, D]
    dv_ref,     # [1, 1, W, D*H]  (accumulated across the q grid axis)
    *,
    h: int,
    w: int,
    d: int,
    p: int,
    bq: int,
    lvl: int,
):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _zero():
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    loc_t = jnp.transpose(loc_ref[0, 0])
    attn_t = jnp.transpose(attn_ref[0, 0])
    g = g_ref[0, 0].astype(jnp.bfloat16)            # [BQ, D]

    # g expanded to d-major lanes: g_wide[q, d*H + y] = g[q, d], via a 0/1
    # matmul (no lane gathers on TPU)
    erows = jax.lax.broadcasted_iota(jnp.int32, (d, d * h), 0)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (d, d * h), 1)
    expand = (erows == ecols // h).astype(jnp.bfloat16)   # [D, D*H]
    g_wide = jnp.dot(g, expand, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )                                                # [BQ, D*H]

    xs_t = jax.lax.broadcasted_iota(jnp.int32, (w, bq), 0).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) % h
    ).astype(jnp.float32)

    acc = jnp.zeros((w, d * h), jnp.float32)
    for pi in range(p):
        r = lvl * p * 2 + 2 * pi
        px_row = loc_ref[0, 0, r : r + 1, :] * w - 0.5               # [1, BQ]
        py = loc_t[:, r + 1 : r + 2] * h - 0.5
        a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

        wx_t = jnp.maximum(0.0, 1.0 - jnp.abs(xs_t - px_row))        # [W, BQ]
        wy, _ = _lin_weight(ys_wide, py)                               # [BQ, D*H]
        z = (a * wy).astype(jnp.bfloat16) * g_wide                     # [BQ, D*H]
        acc = acc + jnp.dot(
            wx_t.astype(jnp.bfloat16), z, preferred_element_type=jnp.float32
        )
    dv_ref[0, 0] = dv_ref[0, 0] + acc.astype(dv_ref.dtype)


def _msda_bwd_q_kernel_flat(
    qa_ref,     # [1, 1, BQ, L*P*3]  (Q-MAJOR loc+attn, as the forward)
    g_ref,      # [1, 1, BQ, D]
    v_ref,      # [1, 1, sum HW, D]
    dloc_ref,   # [1, 1, BQ, n_lvls*P*2]
    dattn_ref,  # [1, 1, BQ, n_lvls*P]
    *,
    shapes: SpatialShapes,
    lvl_idx: Tuple[int, ...],
    nlvl: int,
    d: int,
    p: int,
    bq: int,
):
    v = v_ref[0, 0].astype(jnp.bfloat16)
    g = g_ref[0, 0].astype(jnp.float32)
    qa_t = qa_ref[0, 0]
    loc_t = qa_t[:, : nlvl * p * 2]
    attn_t = qa_t[:, nlvl * p * 2 :]

    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + hh * ww)

    dloc_cols = []
    dattn_cols = []
    for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
        vi = v[starts[li] : starts[li + 1]]          # [HW, D]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, h * w), 1)
        lane_y = (lane // w).astype(jnp.float32)
        lane_x = (lane % w).astype(jnp.float32)
        for pi in range(p):
            px = loc_t[:, lvl * p * 2 + 2 * pi : lvl * p * 2 + 2 * pi + 1] * w - 0.5
            py = loc_t[:, lvl * p * 2 + 2 * pi + 1 : lvl * p * 2 + 2 * pi + 2] * h - 0.5
            a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]
            wx, dwx = _lin_weight(lane_x, px)
            wy, dwy = _lin_weight(lane_y, py)
            tap = jnp.dot(
                (wx * wy).astype(jnp.bfloat16), vi,
                preferred_element_type=jnp.float32,
            )                                        # [BQ, D]
            tap_dx = jnp.dot(
                (dwx * wy).astype(jnp.bfloat16), vi,
                preferred_element_type=jnp.float32,
            )
            tap_dy = jnp.dot(
                (wx * dwy).astype(jnp.bfloat16), vi,
                preferred_element_type=jnp.float32,
            )
            dattn_cols.append(jnp.sum(g * tap, axis=1, keepdims=True))
            dloc_cols.append(a * jnp.sum(g * tap_dx, axis=1, keepdims=True) * w)
            dloc_cols.append(a * jnp.sum(g * tap_dy, axis=1, keepdims=True) * h)

    dloc_ref[0, 0] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
    dattn_ref[0, 0] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _msda_bwd_v_kernel_flat(
    loc_ref,    # [1, 1, L*P*2, BQ]
    attn_ref,   # [1, 1, L*P, BQ]
    g_ref,      # [1, 1, BQ, D]
    dv_ref,     # [1, 1, sum HW, D]  (accumulated across the q grid axis)
    *,
    shapes: SpatialShapes,
    lvl_idx: Tuple[int, ...],
    d: int,
    p: int,
    bq: int,
):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _zero():
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    loc_t = jnp.transpose(loc_ref[0, 0])
    g = g_ref[0, 0].astype(jnp.bfloat16)

    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + hh * ww)
    sum_hw = starts[-1]

    # transposed interpolation rows: [sum HW, BQ], attn folded in, all
    # points and levels pre-summed (d_V is linear in each)
    segs = []
    for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (h * w, bq), 0)
        ry = (rows_i // w).astype(jnp.float32)
        rx = (rows_i % w).astype(jnp.float32)
        seg = None
        for pi in range(p):
            r = lvl * p * 2 + 2 * pi
            px_row = loc_ref[0, 0, r : r + 1, :] * w - 0.5           # [1, BQ]
            py_row = loc_ref[0, 0, r + 1 : r + 2, :] * h - 0.5
            a_row = attn_ref[0, 0, lvl * p + pi : lvl * p + pi + 1, :]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - px_row))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - py_row))
            term = wx * wy * a_row
            seg = term if seg is None else seg + term
        segs.append(seg)
    w2d_t = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)  # [sum HW, BQ]
    dv_ref[0, 0] = dv_ref[0, 0] + jnp.dot(
        w2d_t, g, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def msda_backward_hm(
    value_hm: jnp.ndarray,     # [N, M, S, D] head-major value (as forward)
    spatial_shapes: SpatialShapes,
    loc: jnp.ndarray,          # [N, Q, M, L, P, 2]
    attn: jnp.ndarray,         # [N, Q, M, L, P]
    g: jnp.ndarray,            # [N, Q, M*D] upstream cotangent
    sep_bq: int,
    flat_bq: int,
    flat_max_pixels: int,
):
    """Returns (d_value_hm [N, M, S, D] f32, d_loc, d_attn)."""
    n, m, s, d = value_hm.shape
    q = loc.shape[1]
    nlvl = len(spatial_shapes)
    p = loc.shape[4]
    starts = level_splits(spatial_shapes)
    value_hm = value_hm.astype(jnp.bfloat16)

    pad = (-q) % max(sep_bq, flat_bq)
    qp = q + pad
    # Q-major pack for the q-grad kernels (same layout as the forward)
    qa = jnp.concatenate(
        [loc.reshape(n, q, m, nlvl * p * 2), attn.reshape(n, q, m, nlvl * p)],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    # Q-minor layouts for the value-grad kernels (their transposed builds
    # want queries in lanes)
    loc_qmin = jnp.pad(
        loc.reshape(n, q, -1), ((0, 0), (0, pad), (0, 0))
    ).transpose(0, 2, 1).reshape(n, m, nlvl * p * 2, qp)
    attn_qmin = jnp.pad(
        attn.reshape(n, q, -1), ((0, 0), (0, pad), (0, 0))
    ).transpose(0, 2, 1).reshape(n, m, nlvl * p, qp)
    g_nm = jnp.pad(
        g.reshape(n, q, m, d), ((0, 0), (0, pad), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)                                 # [N, M, Qp, D]

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > flat_max_pixels
    ]
    flat_lvls = [lvl for lvl in range(nlvl) if lvl not in sep_lvls]

    def qspec(rows, bq):
        return pl.BlockSpec(
            (1, 1, rows, bq), lambda ni, mi, qi: (ni, mi, 0, qi), **_VMEM
        )

    def gspec(bq):
        return pl.BlockSpec(
            (1, 1, bq, d), lambda ni, mi, qi: (ni, mi, qi, 0), **_VMEM
        )

    def ospec(bq, cols):
        return pl.BlockSpec(
            (1, 1, bq, cols), lambda ni, mi, qi: (ni, mi, qi, 0), **_VMEM
        )

    dloc_lvl = [None] * nlvl    # each [N, M, Qp, P*2]
    dattn_lvl = [None] * nlvl   # each [N, M, Qp, P]
    dvalue_rows = [None] * nlvl  # each [N, M, HW_l, D] natural layout (f32)

    # ---- separable levels ----
    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        v_t = (
            value_hm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(0, 1, 3, 4, 2)
            .reshape(n, m, w, d * h)
        )
        grid = (n, m, qp // sep_bq)
        dloc, dattn = pl.pallas_call(
            functools.partial(
                _msda_bwd_q_kernel_sep, h=h, w=w, d=d, p=p, bq=sep_bq,
                lvl=lvl, nlvl=nlvl,
            ),
            grid=grid,
            in_specs=[
                ospec(sep_bq, qa.shape[3]),
                gspec(sep_bq),
                pl.BlockSpec(
                    (1, 1, w, d * h), lambda ni, mi, qi: (ni, mi, 0, 0), **_VMEM
                ),
            ],
            out_specs=[ospec(sep_bq, p * 2), ospec(sep_bq, p)],
            out_shape=[
                jax.ShapeDtypeStruct((n, m, qp, p * 2), jnp.float32),
                jax.ShapeDtypeStruct((n, m, qp, p), jnp.float32),
            ],
            compiler_params=_LIMIT,
        )(qa, g_nm, v_t)
        dloc_lvl[lvl], dattn_lvl[lvl] = dloc, dattn

        dv_t = pl.pallas_call(
            functools.partial(
                _msda_bwd_v_kernel_sep, h=h, w=w, d=d, p=p, bq=sep_bq, lvl=lvl
            ),
            grid=grid,
            in_specs=[
                qspec(nlvl * p * 2, sep_bq), qspec(nlvl * p, sep_bq),
                gspec(sep_bq),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, w, d * h), lambda ni, mi, qi: (ni, mi, 0, 0), **_VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, m, w, d * h), jnp.float32),
            compiler_params=_LIMIT,
        )(loc_qmin, attn_qmin, g_nm)
        dvalue_rows[lvl] = (
            dv_t.reshape(n, m, w, d, h)
            .transpose(0, 1, 4, 2, 3)                 # [N, M, H, W, D]
            .reshape(n, m, h * w, d)
        )

    # ---- flat levels (merged) ----
    if flat_lvls:
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        f_shapes = tuple(spatial_shapes[lvl] for lvl in flat_lvls)
        sum_hw = sum(h * w for h, w in f_shapes)
        v_flat = value_hm[:, :, starts[flat_lvls[0]] : starts[nlvl]]
        nfl = len(flat_lvls)
        grid = (n, m, qp // flat_bq)
        dloc_f, dattn_f = pl.pallas_call(
            functools.partial(
                _msda_bwd_q_kernel_flat,
                shapes=f_shapes, lvl_idx=tuple(flat_lvls), nlvl=nlvl,
                d=d, p=p, bq=flat_bq,
            ),
            grid=grid,
            in_specs=[
                ospec(flat_bq, qa.shape[3]),
                gspec(flat_bq),
                pl.BlockSpec(
                    (1, 1, sum_hw, d), lambda ni, mi, qi: (ni, mi, 0, 0), **_VMEM
                ),
            ],
            out_specs=[ospec(flat_bq, nfl * p * 2), ospec(flat_bq, nfl * p)],
            out_shape=[
                jax.ShapeDtypeStruct((n, m, qp, nfl * p * 2), jnp.float32),
                jax.ShapeDtypeStruct((n, m, qp, nfl * p), jnp.float32),
            ],
            compiler_params=_LIMIT,
        )(qa, g_nm, v_flat)
        for li, lvl in enumerate(flat_lvls):
            dloc_lvl[lvl] = dloc_f[..., li * p * 2 : (li + 1) * p * 2]
            dattn_lvl[lvl] = dattn_f[..., li * p : (li + 1) * p]

        dv_flat = pl.pallas_call(
            functools.partial(
                _msda_bwd_v_kernel_flat,
                shapes=f_shapes, lvl_idx=tuple(flat_lvls), d=d, p=p, bq=flat_bq,
            ),
            grid=grid,
            in_specs=[
                qspec(nlvl * p * 2, flat_bq), qspec(nlvl * p, flat_bq),
                gspec(flat_bq),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, sum_hw, d), lambda ni, mi, qi: (ni, mi, 0, 0), **_VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, m, sum_hw, d), jnp.float32),
            compiler_params=_LIMIT,
        )(loc_qmin, attn_qmin, g_nm)
        off = 0
        for li, lvl in enumerate(flat_lvls):
            h, w = f_shapes[li]
            dvalue_rows[lvl] = dv_flat[:, :, off : off + h * w]
            off += h * w

    d_value_hm = jnp.concatenate(dvalue_rows, axis=2)       # [N, M, S, D] f32

    # ---- q-side reassembly: [N, M, Qp, *] -> loc/attn shapes ----
    dloc_stack = jnp.stack(
        [x[:, :, :q] for x in dloc_lvl], axis=2
    )                                                       # [N, M, L, Q, P*2]
    d_loc = dloc_stack.transpose(0, 3, 1, 2, 4).reshape(n, q, m, nlvl, p, 2)
    dattn_stack = jnp.stack(
        [x[:, :, :q] for x in dattn_lvl], axis=2
    )                                                       # [N, M, L, Q, P]
    d_attn = dattn_stack.transpose(0, 3, 1, 2, 4)
    return d_value_hm, d_loc.astype(loc.dtype), d_attn.astype(attn.dtype)
