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

    S1[P*BQ, H*D] = Wx[P*BQ, W] @ V_t[W, H*D]

with the level's value tile pre-transposed to [W, H*D] (y-major lanes:
lane = y*D + d), the wide y-factor built from iota arithmetic
(lane // D -> y, a shift since D is a power of two), and the y-reduction a
fold matmul against an exact 0/1 matrix. Per grid cell everything lives in
VMEM; no HBM gather traffic at all.

Two variants, dispatched by level size:
  * separable (levels above FLAT_LEVEL_MAX_PIXELS pixels): as above;
  * flat (all small levels MERGED into one kernel): each level's full 2D
    interpolation rows from iota arithmetic, concatenated along lanes, one
    [BQ, sum HW] @ [sum HW, D] matmul.

Round-3 structure (device-profile-driven; anatomy in BASELINE.md):

  * ALL HEADS PER GRID CELL: each cell is (batch n, query block); the M
    heads loop inside the kernel and write static lane slices of one
    [BQ, M*D] output block. The former per-head grids paid ~2 us fixed
    per cell 8x over, and their [N, M, Qp, D] outputs needed a
    0.28 ms/call transpose+combine epilogue — the output is now directly
    the [N, Q, M*D] layout the model consumes.
  * BANDED VALUE WINDOWS: encoder self-attention queries are the level's
    pixels in row-major order, so a query block spans few value rows and
    its taps live in a narrow y-band unless learned offsets are extreme.
    Per (batch, block) band starts are computed from the actual sampling
    locations (data-driven min/max) and passed via scalar prefetch; the
    kernel dynamically slices the value window (_sep_band_rows for a
    separable level, _flat_band_rows for the largest flat level), shrinking
    both the S1 matmul and the wide y-factor build. Exactness is preserved
    by a `lax.cond` fallback: if ANY block's taps escape its band, the
    whole call runs the full-height kernel instead (the oracle-parity
    contract holds for arbitrary offsets). Banding applies to the query
    blocks fully inside the level-0 pixel prefix (``pixel_queries=True``,
    set by the encoder); decoder/FTF calls (tiny Q) are never banded.
  * ATTN-WEIGHTED POINT PRE-SUM: the final matmuls are linear in the
    interpolation weights, so the P sampling points are summed BEFORE the
    narrow fold matmul.
  * loc/attn arrive as ONE Q-MAJOR pack [N, M, Qp, L*P*3] (queries in
    sublanes end to end; no in-kernel transposes); tiny query sets
    (decoder Q=5, FTF tokens Q=8) use one 128-query block.

The backward is the ANALYTIC Pallas equivalent of the CUDA col2im kernels
(ops/pallas_msda_bwd.py): same dense-separable matmul shapes, 11x over
autodiff-through-the-gather-fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import SpatialShapes, level_splits

DEFAULT_BQ = 320   # queries per block (4 rows of the flagship 48x80 level)
TINY_BQ = 128      # single block for decoder (Q=5) / FTF token (Q=8) calls
FLAT_LEVEL_MAX_PIXELS = 1024  # levels at or below use the flat kernel

# band sizing margin: a window must cover the block's own rows plus the
# learned offsets' reach on each side. At init offsets are <= n_points px
# (directional bias, transformer.py::_offset_bias_init) + 1 px bilinear
# spread; trained offsets are typically similar. Escaping offsets are
# CORRECT (lax.cond full-height fallback), just slower — the margin is a
# fast-path tuning knob, not a semantics bound.
BAND_MARGIN_ROWS = 11     # 2 * (4 px offset + 1 bilinear) + 1
SEP_BAND_QUANT_SLACK = 4  # lane-aligned starts lose up to quant-1 rows

# the analytic backward keeps the old dispatch threshold (its per-level
# kernels were tuned there; correctness is threshold-independent)
BWD_FLAT_MAX_PIXELS = 1024


def _query_groups(spatial_shapes, q: int, qp: int, bq: int,
                  pixel_queries: bool):
    """Partition the padded query blocks into contiguous groups
    [(blk_off, cnt, src_level | None)].

    ``src_level = j`` means every query of the group's blocks is a level-j
    pixel (row-major) — those blocks are spatially tight, so their taps
    into ANY target level live in a narrow y-band (data-driven banded
    value windows). Blocks that straddle two levels or contain padding get
    ``None`` (full-height kernels). Round-3 generalization: banding used
    to apply only to the level-0 prefix; with BQ dividing the level sizes
    the level-1 blocks are pure too, which shrinks the tail kernels of
    both the forward and the backward."""
    nblk = qp // bq
    if not pixel_queries:
        return [(0, nblk, None)]
    starts = level_splits(spatial_shapes)
    out = []
    for b in range(nblk):
        qlo, qhi = b * bq, (b + 1) * bq
        j = None
        if qhi <= q:
            for lvl in range(len(spatial_shapes)):
                if starts[lvl] <= qlo and qhi <= starts[lvl + 1]:
                    j = lvl
                    break
        if out and out[-1][2] == j:
            out[-1] = (out[-1][0], out[-1][1] + 1, j)
        else:
            out.append((b, 1, j))
    return out


def _span_rows(bq: int, src_hw, h_lvl: int) -> int:
    """How many rows of a target level (height ``h_lvl``) a block of ``bq``
    consecutive level-j pixels spans, via the normalized y extent."""
    hj, wj = src_hw
    r = -(-(bq * h_lvl) // (hj * wj))
    if bq % wj:
        r += 1  # block start not row-aligned: can straddle one extra row
    return r


def _sep_band_rows(h: int, d: int, block_rows: int) -> int:
    """Band-window height for a separable level, or 0 if banding is not
    worthwhile/legal: the window and its start quantum must be 128-lane
    multiples, and the level must be taller than the window.
    ``block_rows``: how many of this level's rows one query block spans."""
    if 128 % d != 0:
        return 0
    quant = max(128 // d, 1)
    needed = block_rows + BAND_MARGIN_ROWS + SEP_BAND_QUANT_SLACK
    hb = -(-needed // quant) * quant
    if h - hb >= 4:
        return hb
    return 0


def _flat_band_rows(h: int, block_rows: int) -> int:
    """Row window for the banded first flat level (sublane-granular start,
    no lane quantization)."""
    hb = block_rows + BAND_MARGIN_ROWS + 2
    if h - hb >= 4:
        return hb
    return 0

# the analytic backward (ops/pallas_msda_bwd.py) keeps its own per-head
# kernels and ONE shared Q-block partition across its sep/flat kernels
BWD_BQ = 512

_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _sep_kernel_ah(
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
    """Separable-level kernel, all heads per cell.

    refs: (band_ref?, qa_ref, v_ref, out_ref)
      qa_ref  [1, M, BQ, L*P*3]  Q-major loc rows then attn rows
      v_ref   [1, M, W, H*D]     y-major lanes (lane = y*D + d)
      out_ref [1, BQ, M*D]
    """
    if banded:
        band_ref, qa_ref, v_ref, out_ref = refs
        band = band_ref[pl.program_id(0), pl.program_id(1)]
        band_f = band.astype(jnp.float32)
    else:
        qa_ref, v_ref, out_ref = refs
        band_f = jnp.float32(0.0)

    xs = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1).astype(jnp.float32)
    # wide y iota, y-major lanes: lane // D -> y offset within the band
    # (D power of two -> a shift). NOTE a narrow [P*BQ, HB] build + 0/1 MXU
    # expansion was tried and is ~0.6 ms/layer SLOWER at banded widths —
    # the VPU column-broadcast build is cheaper than an extra 503 MFLOP
    # matmul per head-cell (measured, BASELINE.md round 3)
    lane_y = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, hb * d), 1) // d
    ).astype(jnp.float32)
    # binary fold matrix G[y*D + c, c'] = (c == c'): the y-reduction of a
    # y-major lane vector is one matmul (no lane reshapes, which Mosaic
    # does not support)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hb * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hb * d, d), 1)
    fold = (rows % d == cols).astype(jnp.bfloat16)  # [HB*D, D] exact 0/1

    for mi in range(m):
        qa_t = qa_ref[0, mi]  # [BQ, L*P*3]

        def col(which, row):
            if which == "loc":
                r = lvl * p * 2 + row
            else:
                r = nlvl * p * 2 + lvl * p + row
            return qa_t[:, r : r + 1]

        # stack the P points along sublanes -> ONE MXU matmul; attn is
        # folded into the narrow x-factor (everything downstream is linear)
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
        if banded:
            off = pl.multiple_of(band * d, 128)
            v_t = v_ref[0, mi, :, pl.ds(off, hb * d)]
        else:
            v_t = v_ref[0, mi]
        s1 = jnp.dot(
            wx_all.astype(jnp.bfloat16), v_t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [P*BQ, HB*D]
        wy_all = jnp.concatenate(
            [
                jnp.maximum(
                    0.0,
                    1.0
                    - jnp.abs(
                        lane_y + band_f - (col("loc", 2 * pi + 1) * h - 0.5)
                    ),
                )
                for pi in range(p)
            ],
            axis=0,
        ).astype(jnp.bfloat16)  # [P*BQ, HB*D]
        s2 = s1 * wy_all
        # the fold is LINEAR: sum the attn-weighted points FIRST, shrinking
        # the D-narrow fold matmul's rows P-fold
        s2w = s2[:bq]
        for pi in range(1, p):
            s2w = s2w + s2[pi * bq : (pi + 1) * bq]
        out_ref[0, :, mi * d : (mi + 1) * d] = jnp.dot(
            s2w, fold, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _flat_kernel_ah(
    *refs,
    shapes: SpatialShapes,       # the flat levels' (H, W)
    lvl_idx: Tuple[int, ...],    # their level indices into loc/attn rows
    nlvl: int,
    d: int,
    m: int,
    p: int,
    bq: int,
    hb1: int,
    banded: bool,
):
    """All small levels in ONE kernel, all heads per cell: build each
    level's 2D interpolation rows W2d[q, y*W+x] from iota arithmetic and
    contract each level with its own [BQ, HW] @ [HW, D] matmul, accumulated
    in f32 (P points pre-summed — linearity). Per-level matmuls beat the
    former concat-into-one-matmul: the level widths (600/240/60 lanes) are
    not 128-multiples, so the lane concat was all vector rotations —
    measured ~2x the whole kernel. When ``banded`` the FIRST (largest) flat
    level's rows are windowed to hb1 rows via a dynamic sublane slice.

    refs: (band_ref?, qa_ref, v_ref, out_ref)
      v_ref [1, M, sum HW, D] (flat row-major pixels, levels stacked)
    """
    if banded:
        band_ref, qa_ref, v_ref, out_ref = refs
        band1 = band_ref[pl.program_id(0), pl.program_id(1)]
    else:
        qa_ref, v_ref, out_ref = refs

    for mi in range(m):
        qa_t = qa_ref[0, mi]  # [BQ, L*P*3]

        def col(row):
            return qa_t[:, row : row + 1]

        acc = None
        row_off = 0
        for si, ((h, w), lvl) in enumerate(zip(shapes, lvl_idx)):
            if banded and si == 0:
                nrow = hb1
                y_base = band1.astype(jnp.float32)
                v_seg = v_ref[0, mi, pl.ds(band1 * w, hb1 * w), :]
            else:
                nrow = h
                y_base = jnp.float32(0.0)
                v_seg = v_ref[0, mi, row_off : row_off + h * w, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (bq, nrow * w), 1)
            lane_y = (lane // w).astype(jnp.float32) + y_base
            lane_x = (lane % w).astype(jnp.float32)

            seg = sum(
                jnp.maximum(
                    0.0,
                    1.0
                    - jnp.abs(lane_x - (col(lvl * p * 2 + 2 * pi) * w - 0.5)),
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
            part = jnp.dot(
                seg.astype(jnp.bfloat16), v_seg.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
            row_off += h * w
        out_ref[0, :, mi * d : (mi + 1) * d] = acc.astype(out_ref.dtype)


def _run_sep(
    v_y: jnp.ndarray,    # [N, M, W, H*D] (y-major lanes)
    qa: jnp.ndarray,     # [N, M, Qp, L*P*3]
    band: Optional[jnp.ndarray],  # [N, nblk] int32 row starts, or None
    lvl: int,
    nlvl: int,
    h: int,
    w: int,
    p: int,
    bq: int,
    hb: int,
    blk_off: int,
    nblk: int,
    out_dtype,
) -> jnp.ndarray:
    n, m, _, k = qa.shape
    d = v_y.shape[-1] // h
    kernel = functools.partial(
        _sep_kernel_ah, h=h, w=w, d=d, m=m, p=p, bq=bq, lvl=lvl, nlvl=nlvl,
        hb=hb, banded=band is not None,
    )
    qa_spec = pl.BlockSpec(
        (1, m, bq, k), lambda ni, qi, *_: (ni, 0, qi + blk_off, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (1, m, w, h * d), lambda ni, qi, *_: (ni, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, bq, m * d), lambda ni, qi, *_: (ni, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n, nblk * bq, m * d), out_dtype)
    cost = pl.CostEstimate(
        flops=2 * n * m * nblk * bq * p * w * hb * d,
        bytes_accessed=n * m * w * h * d * 4 + n * nblk * bq * m * k * 4,
        transcendentals=0,
    )
    if band is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, nblk),
            in_specs=[qa_spec, v_spec],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=_LIMIT, cost_estimate=cost,
        )(band, qa, v_y)
    return pl.pallas_call(
        kernel, grid=(n, nblk), in_specs=[qa_spec, v_spec],
        out_specs=out_spec, out_shape=out_shape,
        compiler_params=_LIMIT, cost_estimate=cost,
    )(qa, v_y)


def _run_flat(
    v_f: jnp.ndarray,    # [N, M, sum HW, D]
    qa: jnp.ndarray,     # [N, M, Qp, L*P*3]
    band: Optional[jnp.ndarray],  # [N, nblk] int32 (first level's rows)
    shapes: SpatialShapes,
    lvl_idx: Tuple[int, ...],
    nlvl: int,
    p: int,
    bq: int,
    hb1: int,
    blk_off: int,
    nblk: int,
    out_dtype,
) -> jnp.ndarray:
    n, m, _, k = qa.shape
    d = v_f.shape[-1]
    sum_hw = v_f.shape[2]
    kernel = functools.partial(
        _flat_kernel_ah, shapes=shapes, lvl_idx=lvl_idx, nlvl=nlvl, d=d, m=m,
        p=p, bq=bq, hb1=hb1, banded=band is not None,
    )
    qa_spec = pl.BlockSpec(
        (1, m, bq, k), lambda ni, qi, *_: (ni, 0, qi + blk_off, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (1, m, sum_hw, d), lambda ni, qi, *_: (ni, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, bq, m * d), lambda ni, qi, *_: (ni, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n, nblk * bq, m * d), out_dtype)
    cost = pl.CostEstimate(
        flops=2 * n * m * nblk * bq * p * sum_hw * d,
        bytes_accessed=n * m * sum_hw * d * 4 + n * nblk * bq * m * k * 4,
        transcendentals=0,
    )
    if band is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, nblk),
            in_specs=[qa_spec, v_spec],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=_LIMIT, cost_estimate=cost,
        )(band, qa, v_f)
    return pl.pallas_call(
        kernel, grid=(n, nblk), in_specs=[qa_spec, v_spec],
        out_specs=out_spec, out_shape=out_shape,
        compiler_params=_LIMIT, cost_estimate=cost,
    )(qa, v_f)


def _band_and_escape(
    py: jnp.ndarray,  # [N, M, G*BQ, P] absolute pixel rows for the level
    nblk: int,
    bq: int,
    h: int,
    hb: int,
    quant: int,
):
    """Data-driven per-(batch, block) band starts + global escape flag.

    A tap at row coordinate py touches integer rows floor(py) and
    floor(py)+1; the band [start, start+hb) must contain every touched
    in-image row or the banded kernel would drop weight — ``escape`` is
    True iff any block's taps exceed its window (the caller then falls
    back to the full-height kernel, keeping exactness for ANY offsets).
    ``quant`` keeps the start lane/sublane-aligned (4 rows for the
    separable level's lane slice: 4*D = 128 lanes)."""
    n, m = py.shape[0], py.shape[1]
    b = py.reshape(n, m, nblk, -1)
    lo = jnp.clip(
        jnp.floor(jnp.min(b, axis=(1, 3))).astype(jnp.int32), 0, max(h - hb, 0)
    )
    lo = (lo // quant) * quant
    hi_row = jnp.minimum(
        jnp.floor(jnp.max(b, axis=(1, 3))).astype(jnp.int32) + 1, h - 1
    )
    escape = jnp.any(hi_row > lo + (hb - 1))
    return lo, escape


def _banded_parts(groups, loc, lvl, h, bq, quant, full_hb, rows_fn, run):
    """Shared banded-group dispatch — the ONE place the banding contract
    lives, used by the forward and the analytic backward so their band
    decisions can never desynchronize. For each query group, derive the
    y-band window into target level ``lvl`` (height ``h``) from the actual
    sampling locations and lax.cond between the banded kernel and the
    full-height fallback (the escape path keeps oracle exactness for
    arbitrary offsets).

    ``loc`` is HEAD-MAJOR [N, M, Q, L, P, 2] (the nmq layout — queries in
    sublanes per head, no packing transposes anywhere; unpadded — banded
    groups are always fully inside the real query range).
    ``rows_fn(j)``: band height (rows) for a group whose queries are the
    pixels of level ``j`` — return 0 to disable banding for that group.
    ``run(band, hb, blk_off, nblk)``: launch the kernel; ``full_hb`` is the
    hb value that means full height to it (h for sep kernels, 0 for flat).
    Returns one partial result per group, in group order."""
    parts = []
    for off, cnt, j in groups:
        hb = rows_fn(j) if j is not None else 0
        if hb:
            py = loc[:, :, off * bq : (off + cnt) * bq, lvl, :, 1] * h - 0.5
            band, esc = _band_and_escape(py, cnt, bq, h, hb, quant=quant)
            parts.append(jax.lax.cond(
                esc,
                functools.partial(run, None, full_hb, off, cnt),
                functools.partial(run, band, hb, off, cnt),
            ))
        else:
            parts.append(run(None, full_hb, off, cnt))
    return parts


def _forward_from_nmq(value_nm, spatial_shapes, loc, attn, out_dtype,
                      pixel_queries=False):
    """Shared forward, ALL inputs head-major: value [N, M, S, D] (bf16),
    loc [N, M, Q, L, P, 2], attn [N, M, Q, L, P] (the nmq layout the model
    emits straight from per-head projection einsums — no relayout between
    the projections and the kernels)."""
    n, m, s, d = value_nm.shape
    q = loc.shape[2]
    starts = level_splits(spatial_shapes)
    nlvl = len(spatial_shapes)
    p = loc.shape[4]

    bq = TINY_BQ if q <= TINY_BQ else DEFAULT_BQ
    pad = (-q) % bq
    qp = q + pad
    nblk = qp // bq
    # ONE Q-MAJOR loc+attn pack [N, M, Qp, L*P*3]: the kernels slice columns
    # directly (queries stay in sublanes end to end); head-major inputs make
    # this a minor-axis concat + pad — no transposes
    qa = jnp.concatenate(
        [loc.reshape(n, m, q, nlvl * p * 2), attn.reshape(n, m, q, nlvl * p)],
        axis=-1,
    )
    qa = jnp.pad(qa, ((0, 0), (0, 0), (0, pad), (0, 0)))

    sep_lvls = [
        lvl for lvl, (h, w) in enumerate(spatial_shapes)
        if h * w > FLAT_LEVEL_MAX_PIXELS
    ]
    flat_lvls = [lvl for lvl in range(nlvl) if lvl not in sep_lvls]

    # data-driven banded groups: any contiguous run of blocks whose queries
    # are all pixels of ONE level (encoder self-attention) gets per-block
    # band windows into every target level
    groups = _query_groups(spatial_shapes, q, qp, bq, pixel_queries)

    outs = [None] * len(groups)

    def acc(gi, val):
        outs[gi] = val if outs[gi] is None else outs[gi] + val

    for lvl in sep_lvls:
        h, w = spatial_shapes[lvl]
        v_y = (
            value_nm[:, :, starts[lvl] : starts[lvl + 1]]
            .reshape(n, m, h, w, d)
            .transpose(0, 1, 3, 2, 4)                     # [N, M, W, H, D]
            .reshape(n, m, w, h * d)                      # y-major lanes
        )
        run = functools.partial(
            _run_sep, v_y, qa, lvl=lvl, nlvl=nlvl, h=h, w=w, p=p, bq=bq,
            # partials in f32: the cross-level sum must not round each
            # level's contribution to bf16 first (CUDA ref accumulates
            # f32 across all levels too); ONE cast at the end
            out_dtype=jnp.float32,
        )
        parts = _banded_parts(
            groups, loc, lvl, h, bq, quant=max(128 // d, 1), full_hb=h,
            rows_fn=lambda j: _sep_band_rows(
                h, d, _span_rows(bq, spatial_shapes[j], h)),
            run=lambda band, hb, off, cnt: run(
                band=band, hb=hb, blk_off=off, nblk=cnt),
        )
        for gi, part in enumerate(parts):
            acc(gi, part)

    if flat_lvls:
        # flat levels are always a contiguous tail (levels shrink 2x each)
        assert flat_lvls == list(range(flat_lvls[0], nlvl)), flat_lvls
        v_f = value_nm[:, :, starts[flat_lvls[0]] : starts[nlvl]]
        shapes_f = tuple(spatial_shapes[lvl] for lvl in flat_lvls)
        run = functools.partial(
            _run_flat, v_f, qa, shapes=shapes_f, lvl_idx=tuple(flat_lvls),
            nlvl=nlvl, p=p, bq=bq, out_dtype=jnp.float32,  # see sep note
        )
        h1, w1 = shapes_f[0]
        flat_bandable = (
            h1 * w1 > FLAT_LEVEL_MAX_PIXELS // 2
            and w1 % 8 == 0  # sublane-aligned dynamic row starts
        )
        parts = _banded_parts(
            groups, loc, flat_lvls[0], h1, bq, quant=1, full_hb=0,
            rows_fn=lambda j: (
                _flat_band_rows(h1, _span_rows(bq, spatial_shapes[j], h1))
                if flat_bandable else 0),
            run=lambda band, hb, off, cnt: run(
                band=band, hb1=hb, blk_off=off, nblk=cnt),
        )
        for gi, part in enumerate(parts):
            acc(gi, part)

    parts = [o for o in outs if o is not None]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return out[:, :q].astype(out_dtype)  # [N, Q, M*D]


def _bwd_block_size(q: int) -> int:
    return 128 if q <= 128 else BWD_BQ


# ---- nmq entry: everything head-major (the production model path) ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas_nmq(
    value_nm: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,   # [N, M, Q, L, P, 2]
    attention_weights: jnp.ndarray,    # [N, M, Q, L, P]
    pixel_queries: bool = False,
) -> jnp.ndarray:
    """ALL-HEAD-MAJOR variant: value [N, M, S, D], loc/attn [N, M, Q, ...]
    — the layouts per-head projection einsums emit directly
    (einsum('nsc,cmd->nmsd') / einsum('nqc,cmk->nmqk')), so neither the
    value nor the loc/attn pack pays a relayout between the projections
    and the kernels. Semantics identical to ``ms_deform_attn_pallas`` with
    the corresponding transposed arguments; output stays [N, Q, M*D].
    ``pixel_queries=True`` declares that the queries are the flattened
    level pixels in row-major order (encoder self-attention) — enables the
    banded value windows; semantics are unchanged either way."""
    return _forward_from_nmq(
        value_nm.astype(jnp.bfloat16), spatial_shapes, sampling_locations,
        attention_weights, value_nm.dtype, pixel_queries,
    )


def _fwd_nmq(value_nm, spatial_shapes, loc, attn, pixel_queries=False):
    return (
        ms_deform_attn_pallas_nmq(
            value_nm, spatial_shapes, loc, attn, pixel_queries
        ),
        (value_nm, loc, attn),
    )


def _bwd_nmq(spatial_shapes, pixel_queries, res, g):
    from tce_rvos_tpu.ops.pallas_msda_bwd import msda_backward_nmq

    value_nm, loc, attn = res
    dv_nm, dloc, dattn = msda_backward_nmq(
        value_nm, spatial_shapes, loc, attn, g,
        _bwd_block_size(loc.shape[2]), BWD_FLAT_MAX_PIXELS,
        pixel_queries=pixel_queries,
    )
    return dv_nm.astype(value_nm.dtype), dloc, dattn


ms_deform_attn_pallas_nmq.defvjp(_fwd_nmq, _bwd_nmq)


# ---- compatibility entries (tests, validators, non-model callers) ----

def _nmq_args(loc, attn):
    """Standard [N, Q, M, ...] loc/attn -> nmq [N, M, Q, ...]."""
    return loc.transpose(0, 2, 1, 3, 4, 5), attn.transpose(0, 2, 1, 3, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    pixel_queries: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.msda.ms_deform_attn (same signature,
    same semantics), forward on the Pallas kernel. value: [N, S, M, D],
    loc/attn: [N, Q, M, ...] (reference layouts — transposed once into the
    head-major nmq layout here; the production model calls
    ``ms_deform_attn_pallas_nmq`` and skips these relayouts entirely)."""
    loc, attn = _nmq_args(sampling_locations, attention_weights)
    return _forward_from_nmq(
        value.transpose(0, 2, 1, 3).astype(jnp.bfloat16), spatial_shapes,
        loc, attn, value.dtype, pixel_queries,
    )


def _fwd(value, spatial_shapes, loc, attn, pixel_queries=False):
    return (
        ms_deform_attn_pallas(value, spatial_shapes, loc, attn,
                              pixel_queries),
        (value, loc, attn),
    )


def _bwd(spatial_shapes, pixel_queries, res, g):
    from tce_rvos_tpu.ops.pallas_msda_bwd import msda_backward_nmq

    value, loc, attn = res
    loc_nmq, attn_nmq = _nmq_args(loc, attn)
    dv_hm, dloc, dattn = msda_backward_nmq(
        value.transpose(0, 2, 1, 3), spatial_shapes, loc_nmq, attn_nmq, g,
        _bwd_block_size(loc.shape[1]), BWD_FLAT_MAX_PIXELS,
        pixel_queries=pixel_queries,
    )
    return (
        dv_hm.transpose(0, 2, 1, 3).astype(value.dtype),
        dloc.transpose(0, 2, 1, 3, 4, 5),
        dattn.transpose(0, 2, 1, 3, 4),
    )


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas_nm(
    value_nm: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    pixel_queries: bool = False,
) -> jnp.ndarray:
    """Head-major VALUE, standard loc/attn [N, Q, M, ...] — kept for
    callers that have the per-head value but reference-layout locations
    (scripts/bench_msda.py variants)."""
    loc, attn = _nmq_args(sampling_locations, attention_weights)
    return _forward_from_nmq(
        value_nm.astype(jnp.bfloat16), spatial_shapes, loc, attn,
        value_nm.dtype, pixel_queries,
    )


def _fwd_nm(value_nm, spatial_shapes, loc, attn, pixel_queries=False):
    return (
        ms_deform_attn_pallas_nm(value_nm, spatial_shapes, loc, attn,
                                 pixel_queries),
        (value_nm, loc, attn),
    )


def _bwd_nm(spatial_shapes, pixel_queries, res, g):
    from tce_rvos_tpu.ops.pallas_msda_bwd import msda_backward_nmq

    value_nm, loc, attn = res
    loc_nmq, attn_nmq = _nmq_args(loc, attn)
    dv_nm, dloc, dattn = msda_backward_nmq(
        value_nm, spatial_shapes, loc_nmq, attn_nmq, g,
        _bwd_block_size(loc.shape[1]), BWD_FLAT_MAX_PIXELS,
        pixel_queries=pixel_queries,
    )
    return (
        dv_nm.astype(value_nm.dtype),
        dloc.transpose(0, 2, 1, 3, 4, 5),
        dattn.transpose(0, 2, 1, 3, 4),
    )


ms_deform_attn_pallas_nm.defvjp(_fwd_nm, _bwd_nm)
