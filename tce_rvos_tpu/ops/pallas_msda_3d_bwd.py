"""Analytic Pallas backward for the temporal (``is_3d``) MSDA branch.

The reference ships a dedicated 3D col2im CUDA backward
(models/ops/src/cuda/ms_deform_im2col_cuda.cuh:566-714, dispatched for
channels==32 at :1461-1507). This is its TPU-native counterpart: the 2D
analytic backward's g-first contraction (ops/pallas_msda_bwd.py) extends
with ONE extra hat factor — the temporal lerp weight

    w_f(frame) = relu(1 - |f_im - frame|),   f_im = loc_f * N - 0.5

whose derivative is the same sign-derivative as the spatial factors, so

  * d_attn[q,l,p]   = sum_f w_f · <g, bilinear_tap_f>
  * d_px / d_py     = as in 2D, each frame's contribution scaled by w_f
  * d_pf[q,l,p]     = attn · sum_f w'_f · <g, bilinear_tap_f> · N
  * d_V_f[x,(y,d)]  = sum_p (w_f · wx_p)^T @ (attn_p · wy_p · g_wide)

Kernel structure mirrors the 3D forward (ops/pallas_msda_3d.py):
all-heads-per-cell grids, y-major value lanes, a static frame loop;
no banding (the 3D mode is an experimental branch — no production
reference config enables it, SURVEY.md §2.1 — so the simple full-height
kernels are the right complexity). The d_value kernels put the frame axis
on the grid's outermost dimension and accumulate each frame's output
block over all (batch, query-block) cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits
from tce_rvos_tpu.ops.pallas_msda import (
    FLAT_LEVEL_MAX_PIXELS,
    TINY_BQ,
)
from tce_rvos_tpu.ops.pallas_msda_bwd import _lin_weight

_VMEM = dict(memory_space=pltpu.VMEM)
_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_dn_t = (((1,), (1,)), ((), ()))  # contract lanes with lanes (rhs^T)


def _bwd3d_q_sep(
    qa_ref, g_ref, v_ref, dloc_ref, dattn_ref,
    *, h, w, d, m, p, bq, lvl, nlvl, nfrm,
):
    """dloc (x, y, f) + dattn for one separable level, all heads per cell.

    The frame axis is folded into the value's SUBLANE dimension
    (lane index = frame*W + x), so the per-frame loop disappears: ONE pair
    of matmuls per (head, point) emits [BQ, NFRM*W] tiles and the spatial
    AND temporal hat weights are both built from the same iota — this keeps
    the Mosaic program small (the naive per-frame unroll compiled 320
    matmuls and wedged the compiler).

    qa_ref   [1, M, BQ, L*P*3 + L*P]  Q-major loc-xyz rows then attn rows
    g_ref    [1, M, BQ, D]
    v_ref    [M, NFRM*W, H*D]         frame-major sublanes, y-major lanes
    dloc_ref [1, M, BQ, P*3], dattn_ref [1, M, BQ, P]
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, nfrm * w), 1)
    lane_x = (lane % w).astype(jnp.float32)
    lane_f = (lane // w).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) // d
    ).astype(jnp.float32)
    erows = jax.lax.broadcasted_iota(jnp.int32, (d, h * d), 0)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (d, h * d), 1)
    expand = (erows == ecols % d).astype(jnp.bfloat16)      # [D, H*D]

    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 3]
        attn_t = qa_t[:, nlvl * p * 3 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)
        g_wide = jnp.dot(
            g, expand, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)                              # [BQ, H*D]
        v_t = v_ref[mi].astype(jnp.bfloat16)                # [NFRM*W, H*D]

        dloc_cols = []
        dattn_cols = []
        for pi in range(p):
            r = lvl * p * 3 + 3 * pi
            px = loc_t[:, r : r + 1] * w - 0.5
            py = loc_t[:, r + 1 : r + 2] * h - 0.5
            fim = loc_t[:, r + 2 : r + 3] * nfrm - 0.5
            a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

            wx, dwx = _lin_weight(lane_x, px)               # [BQ, NFRM*W]
            wf, dwf = _lin_weight(lane_f, fim)
            wy, dwy = _lin_weight(ys_wide, py)              # [BQ, H*D]
            u = wy.astype(jnp.bfloat16) * g_wide
            du = dwy.astype(jnp.bfloat16) * g_wide

            t_all = jax.lax.dot_general(
                u, v_t, _dn_t, preferred_element_type=jnp.float32
            )                                               # [BQ, NFRM*W]
            t_dy = jax.lax.dot_general(
                du, v_t, _dn_t, preferred_element_type=jnp.float32
            )
            wxf = wx * wf
            dattn_cols.append(jnp.sum(wxf * t_all, axis=1, keepdims=True))
            dloc_cols.append(
                a * jnp.sum((dwx * wf) * t_all, axis=1, keepdims=True) * w)
            dloc_cols.append(
                a * jnp.sum(wxf * t_dy, axis=1, keepdims=True) * h)
            dloc_cols.append(
                a * jnp.sum((wx * dwf) * t_all, axis=1, keepdims=True) * nfrm)

        dloc_ref[0, mi] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
        dattn_ref[0, mi] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _bwd3d_v_sep(
    qa_ref, lqm_ref, g_ref, dv_ref,
    *, h, w, d, m, p, bq, lvl, nlvl, nfrm,
):
    """d_value for one separable level. Grid (NFRM, N, NBLK): each cell adds
    the (batch ni, block qi) queries' contribution to frame ``fi``'s value
    gradient; the [1, M, W, H*D] output block is revisited along (ni, qi).

    lqm_ref [1, M, L*P*3, BQ]  Q-minor loc (x and f rows needed in lanes)
    """
    fi = pl.program_id(0)
    ni = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when((ni == 0) & (qi == 0))
    def _zero():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    xs_t = jax.lax.broadcasted_iota(jnp.int32, (w, bq), 0).astype(jnp.float32)
    ys_wide = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, h * d), 1) // d
    ).astype(jnp.float32)
    erows = jax.lax.broadcasted_iota(jnp.int32, (d, h * d), 0)
    ecols = jax.lax.broadcasted_iota(jnp.int32, (d, h * d), 1)
    expand = (erows == ecols % d).astype(jnp.bfloat16)

    fi_f = fi.astype(jnp.float32)
    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 3]
        attn_t = qa_t[:, nlvl * p * 3 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)
        g_wide = jnp.dot(
            g, expand, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

        acc = jnp.zeros((w, h * d), jnp.float32)
        for pi in range(p):
            r = lvl * p * 3 + 3 * pi
            px_row = lqm_ref[0, mi, r : r + 1, :] * w - 0.5      # [1, BQ]
            fim_row = lqm_ref[0, mi, r + 2 : r + 3, :] * nfrm - 0.5
            py = loc_t[:, r + 1 : r + 2] * h - 0.5
            a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]

            wf_row = jnp.maximum(0.0, 1.0 - jnp.abs(fi_f - fim_row))
            wx_t = jnp.maximum(0.0, 1.0 - jnp.abs(xs_t - px_row))  # [W, BQ]
            wy, _ = _lin_weight(ys_wide, py)                       # [BQ, H*D]
            z = (a * wy).astype(jnp.bfloat16) * g_wide
            acc = acc + jnp.dot(
                (wx_t * wf_row).astype(jnp.bfloat16), z,
                preferred_element_type=jnp.float32,
            )
        dv_ref[0, mi] = dv_ref[0, mi] + acc.astype(dv_ref.dtype)


def _bwd3d_q_flat(
    qa_ref, g_ref, v_ref, dloc_ref, dattn_ref,
    *, shapes, lvl_idx, nlvl, d, m, p, bq, nfrm,
):
    """dloc/dattn for all flat levels merged, all heads per cell.

    The value is LEVEL-MAJOR with the frame axis folded into sublanes
    (per level: NFRM consecutive [h*w] segments); per (head, level) one
    rhs-transposed matmul over the level's SUBLANE slice emits the
    [BQ, NFRM*h*w] tap tile and the per-point work is pure iota-built
    elementwise + rowsums — no frame loop (see _bwd3d_q_sep). (Slicing a
    single whole-array vg on the LANE axis instead hits unaligned lane
    offsets, which sent Mosaic's compile time to ~10 min.)

    v_ref [M, NFRM*sum HW, D]
    dloc_ref [1, M, BQ, n_flat*P*3], dattn_ref [1, M, BQ, n_flat*P]
    """
    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + nfrm * hh * ww)

    # lane coordinate decode built ONCE per level (the div/mod chains by
    # non-pow2 constants are the expensive Mosaic lowering — inside the
    # head loop they get re-emitted m times)
    lanes = []
    for (h, w) in shapes:
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, nfrm * h * w), 1)
        fy = lane // w
        lane_x = (lane % w).astype(jnp.float32)
        lane_y = (fy % h).astype(jnp.float32)
        lane_f = (fy // h).astype(jnp.float32)
        lanes.append((lane_x, lane_y, lane_f))

    for mi in range(m):
        qa_t = qa_ref[0, mi]
        loc_t = qa_t[:, : nlvl * p * 3]
        attn_t = qa_t[:, nlvl * p * 3 :]
        g = g_ref[0, mi].astype(jnp.bfloat16)

        dloc_cols = []
        dattn_cols = []
        for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
            vi = v_ref[mi, starts[li] : starts[li + 1], :].astype(jnp.bfloat16)
            vg = jax.lax.dot_general(
                g, vi, _dn_t, preferred_element_type=jnp.float32,
            )                                            # [BQ, NFRM*h*w]
            lane_x, lane_y, lane_f = lanes[li]
            for pi in range(p):
                r = lvl * p * 3 + 3 * pi
                px = loc_t[:, r : r + 1] * w - 0.5
                py = loc_t[:, r + 1 : r + 2] * h - 0.5
                fim = loc_t[:, r + 2 : r + 3] * nfrm - 0.5
                a = attn_t[:, lvl * p + pi : lvl * p + pi + 1]
                wx, dwx = _lin_weight(lane_x, px)
                wy, dwy = _lin_weight(lane_y, py)
                wf, dwf = _lin_weight(lane_f, fim)
                wxyf = wx * wy * wf
                vgw = wxyf * vg
                dattn_cols.append(jnp.sum(vgw, axis=1, keepdims=True))
                dloc_cols.append(
                    a * jnp.sum((dwx * wy * wf) * vg, axis=1, keepdims=True)
                    * w)
                dloc_cols.append(
                    a * jnp.sum((wx * dwy * wf) * vg, axis=1, keepdims=True)
                    * h)
                dloc_cols.append(
                    a * jnp.sum((wx * wy * dwf) * vg, axis=1, keepdims=True)
                    * nfrm)
        dloc_ref[0, mi] = jnp.concatenate(dloc_cols, axis=1).astype(dloc_ref.dtype)
        dattn_ref[0, mi] = jnp.concatenate(dattn_cols, axis=1).astype(dattn_ref.dtype)


def _bwd3d_v_flat(
    lqm_ref, aqm_ref, g_ref, dv_ref,
    *, shapes, lvl_idx, d, m, p, bq, nlvl, nfrm,
):
    """d_value for the merged flat levels. Grid (NFRM, N, NBLK); the
    [1, M, sum HW, D] frame block accumulates over (ni, qi).

    lqm_ref [1, M, L*P*3, BQ] / aqm_ref [1, M, L*P, BQ]  Q-minor
    """
    fi = pl.program_id(0)
    ni = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when((ni == 0) & (qi == 0))
    def _zero():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    starts = [0]
    for hh, ww in shapes:
        starts.append(starts[-1] + hh * ww)

    fi_f = fi.astype(jnp.float32)
    for mi in range(m):
        g = g_ref[0, mi].astype(jnp.bfloat16)               # [BQ, D]
        for li, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (h * w, bq), 0)
            ry = (rows_i // w).astype(jnp.float32)
            rx = (rows_i % w).astype(jnp.float32)
            seg = None
            for pi in range(p):
                r = lvl * p * 3 + 3 * pi
                px_row = lqm_ref[0, mi, r : r + 1, :] * w - 0.5
                py_row = lqm_ref[0, mi, r + 1 : r + 2, :] * h - 0.5
                fim_row = lqm_ref[0, mi, r + 2 : r + 3, :] * nfrm - 0.5
                a_row = aqm_ref[0, mi, lvl * p + pi : lvl * p + pi + 1, :]
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - px_row))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - py_row))
                wf = jnp.maximum(0.0, 1.0 - jnp.abs(fi_f - fim_row))
                term = wx * wy * (wf * a_row)
                seg = term if seg is None else seg + term
            contrib = jnp.dot(
                seg.astype(jnp.bfloat16), g, preferred_element_type=jnp.float32
            ).astype(dv_ref.dtype)
            lo, hi = starts[li], starts[li + 1]
            dv_ref[0, mi, lo:hi, :] = dv_ref[0, mi, lo:hi, :] + contrib


def msda_backward_3d(
    value: jnp.ndarray,        # [N, S, M, D] (N doubles as time)
    spatial_shapes: SpatialShapes,
    loc: jnp.ndarray,          # [N, Q, M, L, P, 3]
    attn: jnp.ndarray,         # [N, Q, M, L, P]
    g: jnp.ndarray,            # [N, Q, M*D]
):
    """Returns (d_value [N, S, M, D] f32, d_loc, d_attn) in the forward's
    reference layouts."""
    n, s, m, d = value.shape
    q = loc.shape[1]
    nlvl = len(spatial_shapes)
    p = loc.shape[4]
    starts = level_splits(spatial_shapes)
    value_nm = value.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [N,M,S,D]

    # the Q-minor (lqm/aqm) blocks put queries in LANES, so the backward's
    # block size must be 128-divisible for native Mosaic lowering (the
    # forward's 320 is fine there — queries stay in sublanes). 256 (not the
    # 2D backward's 512): Mosaic compile time for these kernels scales with
    # the vreg-unrolled program size (measured ~620 s at bq=512 for the
    # merged flat q kernel); the 3D branch is an experimental mode where a
    # fast compile matters more than the last 20% of kernel throughput.
    bq = TINY_BQ if q <= TINY_BQ else 256
    pad = (-q) % bq
    qp = q + pad
    nblk = qp // bq

    qa = jnp.concatenate(
        [loc.reshape(n, q, m, nlvl * p * 3), attn.reshape(n, q, m, nlvl * p)],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    k = qa.shape[-1]
    g_nm = jnp.pad(
        g.reshape(n, q, m, d), ((0, 0), (0, pad), (0, 0), (0, 0))
    ).transpose(0, 2, 1, 3)                                  # [N, M, Qp, D]
    lqm = jnp.pad(
        loc.reshape(n, q, m, nlvl * p * 3), ((0, 0), (0, pad), (0, 0), (0, 0))
    ).transpose(0, 2, 3, 1)                                  # [N,M,L*P*3,Qp]
    aqm = jnp.pad(
        attn.reshape(n, q, m, nlvl * p), ((0, 0), (0, pad), (0, 0), (0, 0))
    ).transpose(0, 2, 3, 1)

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > FLAT_LEVEL_MAX_PIXELS
    ]
    flat_lvls = [lvl for lvl in range(nlvl) if lvl not in sep_lvls]

    qa_spec2 = pl.BlockSpec(
        (1, m, bq, k), lambda ni, qi: (ni, 0, qi, 0), **_VMEM)
    g_spec2 = pl.BlockSpec(
        (1, m, bq, d), lambda ni, qi: (ni, 0, qi, 0), **_VMEM)
    qa_spec3 = pl.BlockSpec(
        (1, m, bq, k), lambda fi, ni, qi: (ni, 0, qi, 0), **_VMEM)
    g_spec3 = pl.BlockSpec(
        (1, m, bq, d), lambda fi, ni, qi: (ni, 0, qi, 0), **_VMEM)
    lqm_spec3 = pl.BlockSpec(
        (1, m, nlvl * p * 3, bq), lambda fi, ni, qi: (ni, 0, 0, qi), **_VMEM)
    aqm_spec3 = pl.BlockSpec(
        (1, m, nlvl * p, bq), lambda fi, ni, qi: (ni, 0, 0, qi), **_VMEM)

    dloc_lvl = [None] * nlvl
    dattn_lvl = [None] * nlvl
    dvalue_rows = [None] * nlvl

    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        # frame-major sublanes for the q kernel (lane = frame*W + x);
        # the dv kernels need no value input (d_value is value-independent)
        v_y_cat = (
            value_nm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(1, 0, 3, 2, 4)
            .reshape(m, n * w, h * d)
        )
        kq = functools.partial(
            _bwd3d_q_sep, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl,
            nlvl=nlvl, nfrm=n,
        )
        dq = pl.pallas_call(
            kq, grid=(n, nblk),
            in_specs=[
                qa_spec2, g_spec2,
                pl.BlockSpec((m, n * w, h * d), lambda ni, qi: (0, 0, 0),
                             **_VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, m, bq, p * 3),
                             lambda ni, qi: (ni, 0, qi, 0), **_VMEM),
                pl.BlockSpec((1, m, bq, p),
                             lambda ni, qi: (ni, 0, qi, 0), **_VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, m, qp, p * 3), jnp.float32),
                jax.ShapeDtypeStruct((n, m, qp, p), jnp.float32),
            ],
            compiler_params=_LIMIT,
        )(qa, g_nm, v_y_cat)
        dloc_lvl[lvl], dattn_lvl[lvl] = dq

        kv = functools.partial(
            _bwd3d_v_sep, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl,
            nlvl=nlvl, nfrm=n,
        )
        dv_y = pl.pallas_call(
            kv, grid=(n, n, nblk),
            in_specs=[qa_spec3, lqm_spec3, g_spec3],
            out_specs=pl.BlockSpec(
                (1, m, w, h * d), lambda fi, ni, qi: (fi, 0, 0, 0), **_VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m, w, h * d), jnp.float32),
            compiler_params=_LIMIT,
        )(qa, lqm, g_nm)
        dvalue_rows[lvl] = (
            dv_y.reshape(n, m, w, h, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, m, h * w, d)
        )

    if flat_lvls:
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        f_shapes = tuple(spatial_shapes[lvl] for lvl in flat_lvls)
        sum_hw = sum(hh * ww for hh, ww in f_shapes)
        nfl = len(flat_lvls)
        # level-major, frame folded into sublanes (per level: NFRM
        # consecutive [h*w] segments) for the q kernel
        v_lm = jnp.concatenate(
            [
                value_nm[:, :, starts[lvl] : starts[lvl + 1]]
                .transpose(1, 0, 2, 3)
                .reshape(m, -1, d)
                for lvl in flat_lvls
            ],
            axis=1,
        )                                          # [M, NFRM*sum HW, D]

        kq = functools.partial(
            _bwd3d_q_flat, shapes=f_shapes, lvl_idx=tuple(flat_lvls),
            nlvl=nlvl, d=d, m=m, p=p, bq=bq, nfrm=n,
        )
        dq = pl.pallas_call(
            kq, grid=(n, nblk),
            in_specs=[
                qa_spec2, g_spec2,
                pl.BlockSpec((m, n * sum_hw, d), lambda ni, qi: (0, 0, 0),
                             **_VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, m, bq, nfl * p * 3),
                             lambda ni, qi: (ni, 0, qi, 0), **_VMEM),
                pl.BlockSpec((1, m, bq, nfl * p),
                             lambda ni, qi: (ni, 0, qi, 0), **_VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, m, qp, nfl * p * 3), jnp.float32),
                jax.ShapeDtypeStruct((n, m, qp, nfl * p), jnp.float32),
            ],
            compiler_params=_LIMIT,
        )(qa, g_nm, v_lm)
        for li, lvl in enumerate(flat_lvls):
            dloc_lvl[lvl] = dq[0][..., li * p * 3 : (li + 1) * p * 3]
            dattn_lvl[lvl] = dq[1][..., li * p : (li + 1) * p]

        kv = functools.partial(
            _bwd3d_v_flat, shapes=f_shapes, lvl_idx=tuple(flat_lvls),
            d=d, m=m, p=p, bq=bq, nlvl=nlvl, nfrm=n,
        )
        dv_flat = pl.pallas_call(
            kv, grid=(n, n, nblk),
            in_specs=[lqm_spec3, aqm_spec3, g_spec3],
            out_specs=pl.BlockSpec(
                (1, m, sum_hw, d), lambda fi, ni, qi: (fi, 0, 0, 0), **_VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m, sum_hw, d), jnp.float32),
            compiler_params=_LIMIT,
        )(lqm, aqm, g_nm)
        off = 0
        for li, lvl in enumerate(flat_lvls):
            hh, ww = f_shapes[li]
            dvalue_rows[lvl] = dv_flat[:, :, off : off + hh * ww]
            off += hh * ww

    d_value_nm = jnp.concatenate(dvalue_rows, axis=2)        # [N, M, S, D]
    d_value = d_value_nm.transpose(0, 2, 1, 3)               # [N, S, M, D]

    d_loc = jnp.stack(
        [x[:, :, :q] for x in dloc_lvl], axis=3
    ).reshape(n, m, q, nlvl, p, 3).transpose(0, 2, 1, 3, 4, 5)
    d_attn = jnp.stack(
        [x[:, :, :q] for x in dattn_lvl], axis=3
    ).transpose(0, 2, 1, 3, 4)
    return d_value, d_loc.astype(loc.dtype), d_attn.astype(attn.dtype)
