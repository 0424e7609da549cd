"""Pallas MSDA kernel parity vs the XLA oracle.

Runs in TPU-interpret mode on the local CPU backend (fast there; the
conftest forces genuine local CPU). The kernel computes its interpolation
taps in bfloat16 by design (ops/pallas_msda.py), so tolerances are
bf16-scale, not f32-scale. On real TPU the kernel is additionally
exercised natively by bench.py / scripts/validate_pallas.py."""

import numpy as np
import pytest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.msda import ms_deform_attn
from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas

SHAPES = ((8, 16), (4, 8))
N, M, D, Q, P = 1, 2, 8, 10, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(3)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc = rng.rand(N, Q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
    attn = rng.rand(N, Q, M, L, P).astype(np.float32) + 1e-3
    attn = attn / attn.reshape(N, Q, M, L * P).sum(-1)[..., None, None]
    return jnp.array(value), jnp.array(loc), jnp.array(attn)


def test_pallas_matches_oracle(inputs):
    value, loc, attn = inputs
    expected = np.asarray(ms_deform_attn(value, SHAPES, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_pallas(value, SHAPES, loc, attn))
    # bf16 taps: ~8 mantissa bits => absolute error ~1e-2 * |value| scale
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=5e-3)


def test_pallas_analytic_backward_matches_oracle_vjp(inputs):
    """The backward is the ANALYTIC Pallas col2im equivalent
    (ops/pallas_msda_bwd.py) — all three gradients must match the oracle's
    autodiff at bf16-tap tolerance (the right-subgradient convention at
    exact integer sampling points matches grid_sample's floor-based AD)."""
    value, loc, attn = inputs

    def loss_p(v, l, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a) ** 2)

    def loss_o(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 0.02 * scale, (
            name, np.abs(a - b).max(), scale
        )


def test_pallas_backward_integer_sampling_point(inputs):
    """Regression: a sampling location landing EXACTLY on a pixel center
    must produce the oracle's right-derivative (-V[x] + V[x+1]), not a
    zero subgradient."""
    value, loc, attn = inputs
    # put one point of level 0 exactly on pixel (x=7, y=3): loc*W - 0.5 = 7
    loc = loc.at[0, 0, 0, 0, 0, 0].set((7 + 0.5) / SHAPES[0][1])
    loc = loc.at[0, 0, 0, 0, 0, 1].set((3 + 0.5) / SHAPES[0][0])

    def loss_p(v, l, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a) ** 2)

    def loss_o(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = np.asarray(jax.grad(loss_p, argnums=1)(value, loc, attn))
    go = np.asarray(jax.grad(loss_o, argnums=1)(value, loc, attn))
    target = go[0, 0, 0, 0, 0]
    got = gp[0, 0, 0, 0, 0]
    assert np.abs(target).max() > 0  # oracle gradient is nonzero here
    np.testing.assert_allclose(got, target, rtol=0.05, atol=2e-2 * np.abs(target).max())


SHAPES_SEP = ((40, 64), (4, 8))  # 2560 px level -> separable path
S_SEP = sum(h * w for h, w in SHAPES_SEP)


@pytest.fixture(scope="module")
def inputs_sep():
    rng = np.random.RandomState(5)
    value = rng.randn(N, S_SEP, M, D).astype(np.float32)
    loc = rng.rand(N, Q, M, 2, P, 2).astype(np.float32) * 1.2 - 0.1
    attn = rng.rand(N, Q, M, 2, P).astype(np.float32) + 1e-3
    attn = attn / attn.reshape(N, Q, M, 2 * P).sum(-1)[..., None, None]
    return jnp.array(value), jnp.array(loc), jnp.array(attn)


def test_separable_kernel_forward_and_backward(inputs_sep):
    """The 40x64 level exceeds FLAT_LEVEL_MAX_PIXELS, exercising the
    SEPARABLE kernel family (fwd + analytic bwd) which the small default
    shapes never reach."""
    from tce_rvos_tpu.ops.pallas_msda import FLAT_LEVEL_MAX_PIXELS

    assert SHAPES_SEP[0][0] * SHAPES_SEP[0][1] > FLAT_LEVEL_MAX_PIXELS
    value, loc, attn = inputs_sep
    expected = np.asarray(ms_deform_attn(value, SHAPES_SEP, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_pallas(value, SHAPES_SEP, loc, attn))
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=5e-3)

    def loss_p(v, l, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ms_deform_attn_pallas(v, SHAPES_SEP, l, a) ** 2)

    def loss_o(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES_SEP, l, a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 0.02 * scale, (name, np.abs(a - b).max())


# ---- banded value windows (pixel_queries) ------------------------------

SHAPES_BAND = ((40, 64), (20, 32), (5, 8))  # sep lvl0 + bandable flat lvl1
S_BAND = sum(h * w for h, w in SHAPES_BAND)
M_B, D_B = 2, 16  # 24*16 = 384 lanes: 128-aligned band windows


def _pixel_query_inputs(max_offset_px: float, seed: int = 7):
    """Queries = the flattened level pixels (encoder layout); sampling
    points = own position + offsets bounded by ``max_offset_px`` pixels."""
    rng = np.random.RandomState(seed)
    l = len(SHAPES_BAND)
    value = rng.randn(N, S_BAND, M_B, D_B).astype(np.float32)
    ref = np.concatenate(
        [
            np.stack(
                np.meshgrid(
                    (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h,
                    indexing="xy",
                ),
                axis=-1,
            ).reshape(h * w, 2)
            for h, w in SHAPES_BAND
        ],
        axis=0,
    )  # [S, 2] normalized (x, y)
    off = (rng.rand(N, S_BAND, M_B, l, P, 2) * 2 - 1) * max_offset_px
    norm = np.asarray([[w, h] for h, w in SHAPES_BAND], np.float32)
    loc = ref[None, :, None, None, None, :] + off / norm[None, None, None, :, None, :]
    attn = rng.rand(N, S_BAND, M_B, l, P).astype(np.float32) + 1e-3
    attn = attn / attn.reshape(N, S_BAND, M_B, l * P).sum(-1)[..., None, None]
    return (
        jnp.array(value),
        jnp.array(loc.astype(np.float32)),
        jnp.array(attn),
    )


@pytest.mark.parametrize("max_off,expect_banded", [(3.0, True), (30.0, False)])
def test_banded_pixel_queries_parity(max_off, expect_banded):
    """pixel_queries=True must stay oracle-exact BOTH when the banded
    windows cover every tap (small offsets) and when taps escape and the
    lax.cond falls back to the full-height kernels (large offsets)."""
    from tce_rvos_tpu.ops.pallas_msda import (
        DEFAULT_BQ, _band_and_escape, _sep_band_rows,
    )

    value, loc, attn = _pixel_query_inputs(max_off)
    # confirm which path the dispatcher takes for this offset magnitude
    h0, w0 = SHAPES_BAND[0]
    nb0 = (h0 * w0) // DEFAULT_BQ
    hb = _sep_band_rows(h0, D_B, -(-DEFAULT_BQ // w0))
    assert hb > 0
    # _band_and_escape takes the head-major nmq layout [N, M, G*BQ, P]
    py = (
        loc[:, : nb0 * DEFAULT_BQ, :, 0, :, 1].transpose(0, 2, 1, 3) * h0 - 0.5
    )
    _, esc = _band_and_escape(
        py, nb0, DEFAULT_BQ, h0, hb, quant=128 // D_B
    )
    assert bool(esc) != expect_banded

    expected = np.asarray(ms_deform_attn(value, SHAPES_BAND, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            ms_deform_attn_pallas(
                value, SHAPES_BAND, loc, attn, pixel_queries=True
            )
        )
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=5e-3)


def test_banded_backward_matches_oracle():
    """Gradients flow through the banded forward's custom VJP unchanged."""
    value, loc, attn = _pixel_query_inputs(2.0, seed=9)

    def loss_p(v, l, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                ms_deform_attn_pallas(
                    v, SHAPES_BAND, l, a, pixel_queries=True
                )
                ** 2
            )

    def loss_o(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES_BAND, l, a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 0.02 * scale, (name, np.abs(a - b).max())


def test_nm_variant_matches_default(inputs):
    """ms_deform_attn_pallas_nm consumes head-major [N, M, S, D] value and
    must agree with the [N, S, M, D] entry (used when the value projection
    emits head-major directly)."""
    from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas_nm

    value, loc, attn = inputs
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(ms_deform_attn_pallas(value, SHAPES, loc, attn))
        b = np.asarray(
            ms_deform_attn_pallas_nm(
                value.transpose(0, 2, 1, 3), SHAPES, loc, attn
            )
        )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pallas_3d_matches_oracle():
    """The temporal (is_3d) Pallas forward must match the XLA trilinear
    oracle (ops/msda.py::ms_deform_attn_3d; ref CUDA
    ms_deform_im2col_cuda.cuh:366-420) — including frame coordinates that
    reach outside [0, N-1] (zero contribution) and fractional frames that
    lerp across two batch slices. First level is >1024 px so BOTH the
    separable-3d and flat-3d kernels are exercised."""
    from tce_rvos_tpu.ops.msda import ms_deform_attn_3d
    from tce_rvos_tpu.ops.pallas_msda_3d import ms_deform_attn_pallas_3d

    shapes = ((40, 32), (4, 8))
    n, m, d, q, p = 3, 2, 8, 10, 3
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(7)
    value = jnp.asarray(rng.randn(n, s, m, d).astype(np.float32))
    loc = rng.rand(n, q, m, l, p, 3).astype(np.float32) * 1.2 - 0.1
    loc = jnp.asarray(loc)
    attn = rng.rand(n, q, m, l, p).astype(np.float32) + 1e-3
    attn = jnp.asarray(attn / attn.reshape(n, q, m, l * p).sum(-1)[..., None, None])

    expected = np.asarray(ms_deform_attn_3d(value, shapes, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_pallas_3d(value, shapes, loc, attn))
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=5e-3)


def test_pallas_3d_backward_matches_oracle_vjp():
    """The 3D analytic Pallas backward (ops/pallas_msda_3d_bwd.py — TPU
    counterpart of the reference's dedicated 3D col2im kernel,
    ms_deform_im2col_cuda.cuh:566-714,1461-1507) must match the XLA
    trilinear oracle's autodiff for all FOUR gradient groups (d_value,
    d_loc incl. the temporal coordinate, d_attn) at bf16-tap tolerance."""
    from tce_rvos_tpu.ops.msda import ms_deform_attn_3d
    from tce_rvos_tpu.ops.pallas_msda_3d import ms_deform_attn_pallas_3d

    shapes = ((40, 32), (4, 8))
    n, m, d, q, p = 3, 2, 8, 10, 3
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(19)
    value = jnp.asarray(rng.randn(n, s, m, d).astype(np.float32))
    loc = rng.rand(n, q, m, l, p, 3).astype(np.float32) * 1.2 - 0.1
    loc = jnp.asarray(loc)
    attn = rng.rand(n, q, m, l, p).astype(np.float32) + 1e-3
    attn = jnp.asarray(attn / attn.reshape(n, q, m, l * p).sum(-1)[..., None, None])

    def loss_p(v, lo, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ms_deform_attn_pallas_3d(v, shapes, lo, a) ** 2)

    def loss_o(v, lo, a):
        return jnp.sum(ms_deform_attn_3d(v, shapes, lo, a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 0.02 * scale, (
            name, np.abs(a - b).max(), scale
        )
    # the temporal coordinate's gradient specifically must be live
    assert np.abs(np.asarray(gp[1])[..., 2]).max() > 0


def test_banded_level1_groups_parity():
    """Round-3 generalization: tail query blocks that are pure LEVEL-1
    pixel blocks get banded value windows too (_query_groups src_level=1).
    Shapes chosen so the group-1 windows actually fit (sep lvl0: 64 of 80
    rows; flat lvl1: 33 of 40 rows) and offsets stay inside the margin —
    the banded branches run, and fwd+bwd must stay oracle-exact."""
    shapes = ((80, 32), (40, 16), (5, 8))
    n, m, d, p = 2, 2, 8, 3
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(11)
    value = jnp.asarray(rng.randn(n, s, m, d).astype(np.float32))
    ref = np.concatenate(
        [
            np.stack(
                np.meshgrid(
                    (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h,
                    indexing="xy",
                ),
                axis=-1,
            ).reshape(h * w, 2)
            for h, w in shapes
        ],
        axis=0,
    )
    off = (rng.rand(n, s, m, l, p, 2) * 2 - 1) * 3.0
    norm = np.asarray([[w, h] for h, w in shapes], np.float32)
    loc = jnp.asarray(
        (
            ref[None, :, None, None, None, :]
            + off / norm[None, None, None, :, None, :]
        ).astype(np.float32)
    )
    attn = rng.rand(n, s, m, l, p).astype(np.float32) + 1e-3
    attn = jnp.asarray(
        attn / attn.reshape(n, s, m, l * p).sum(-1)[..., None, None]
    )

    from tce_rvos_tpu.ops.pallas_msda import _query_groups
    groups = _query_groups(shapes, s, s + ((-s) % 320), 320, True)
    assert any(j == 1 for _, _, j in groups), groups

    expected = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            ms_deform_attn_pallas(value, shapes, loc, attn, pixel_queries=True)
        )
    np.testing.assert_allclose(got, expected, rtol=0.05, atol=5e-3)

    g = jnp.asarray(rng.randn(n, s, m * d).astype(np.float32))

    def loss_p(v, lo, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                ms_deform_attn_pallas(v, shapes, lo, a, pixel_queries=True) * g
            )

    def loss_o(v, lo, a):
        return jnp.sum(ms_deform_attn(v, shapes, lo, a) * g)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 0.02 * scale, (name, np.abs(a - b).max())
