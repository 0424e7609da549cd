"""Parity tests for the multi-scale deformable attention core.

Replicates the reference's kernel-vs-oracle strategy
(/root/reference/models/ops/test.py:31-86): our XLA implementation is checked
against an independently-written torch oracle built on F.grid_sample (the same
ground truth the reference used), plus gradient checks via JAX AD vs torch AD.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tce_rvos_tpu.ops.msda import ms_deform_attn, ms_deform_attn_3d

SHAPES = ((12, 16), (6, 8), (3, 4))
N, M, D, Q, P = 2, 4, 8, 10, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def torch_oracle(value, shapes, loc, attn):
    """Ground-truth MSDA via torch grid_sample (zeros padding,
    align_corners=False), written from the op's mathematical definition."""
    n, s, m, d = value.shape
    _, q, _, l, p, _ = loc.shape
    out = torch.zeros(n, q, m, d, dtype=value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w]  # [n, hw, m, d]
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(n * m, d, h, w)
        grid = 2.0 * loc[:, :, :, lvl] - 1.0  # [n, q, m, p, 2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(n * m, q, p, 2)
        tap = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [n*m, d, q, p]
        tap = tap.reshape(n, m, d, q, p)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3)  # [n, m, q, p]
        out += torch.einsum("nmdqp,nmqp->nqmd", tap, a)
    return out.reshape(n, q, m * d)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc = rng.rand(N, Q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1  # incl. OOB
    attn = rng.rand(N, Q, M, L, P).astype(np.float32) + 1e-3
    attn = attn / attn.reshape(N, Q, M, L * P).sum(-1)[..., None, None]
    return value, loc, attn


def test_forward_matches_torch_oracle(inputs):
    value, loc, attn = inputs
    ours = np.asarray(ms_deform_attn(jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    ref = torch_oracle(
        torch.from_numpy(value), SHAPES, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_forward_query_chunking(inputs):
    value, loc, attn = inputs
    full = ms_deform_attn(jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn))
    chunked = ms_deform_attn(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn), 4
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-6, atol=1e-6)


def test_gradients_match_torch(inputs):
    value, loc, attn = inputs

    def loss_jax(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    loss = (torch_oracle(tv, SHAPES, tl, ta) ** 2).sum()
    loss.backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-4)
    # location grads differ only at exact integer lattice points (subgradient
    # choice); random locations avoid those.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_3d_reduces_to_2d_at_integer_frames():
    """With the frame coordinate pinned exactly onto each sample's own frame,
    the 3D op must equal the 2D op."""
    rng = np.random.RandomState(1)
    value = rng.randn(N, S, M, D).astype(np.float32)
    loc2 = (rng.rand(N, Q, M, L, P, 2) * 0.8 + 0.1).astype(np.float32)
    attn = rng.rand(N, Q, M, L, P).astype(np.float32)
    attn = attn / attn.reshape(N, Q, M, L * P).sum(-1)[..., None, None]
    # loc_f such that f_im = loc_f * N - 0.5 == own frame index
    own = (np.arange(N, dtype=np.float32) + 0.5) / N
    locf = np.broadcast_to(own[:, None, None, None, None], (N, Q, M, L, P)).astype(np.float32)
    loc3 = np.concatenate([loc2, locf[..., None]], axis=-1)
    out3 = ms_deform_attn_3d(jnp.array(value), SHAPES, jnp.array(loc3), jnp.array(attn))
    out2 = ms_deform_attn(jnp.array(value), SHAPES, jnp.array(loc2), jnp.array(attn))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_3d_frame_lerp():
    """A point halfway between frames 0 and 1 must average their taps."""
    rng = np.random.RandomState(2)
    value = rng.randn(2, S, M, D).astype(np.float32)
    loc2 = (rng.rand(2, Q, M, L, P, 2) * 0.8 + 0.1).astype(np.float32)
    attn = np.ones((2, Q, M, L, P), dtype=np.float32) / (L * P)
    # f_im = 0.5 -> loc_f = (0.5 + 0.5)/N = 0.5
    locf = np.full((2, Q, M, L, P, 1), 0.5, dtype=np.float32)
    loc3 = np.concatenate([loc2, locf], axis=-1)
    out3 = np.asarray(
        ms_deform_attn_3d(jnp.array(value), SHAPES, jnp.array(loc3), jnp.array(attn))
    )
    # manual: average the two frames' values, then run 2D on every batch row
    v_avg = value.mean(axis=0, keepdims=True)
    expected = []
    for i in range(2):
        e = ms_deform_attn(
            jnp.array(v_avg), SHAPES, jnp.array(loc2[i : i + 1]), jnp.array(attn[i : i + 1])
        )
        expected.append(np.asarray(e)[0])
    np.testing.assert_allclose(out3, np.stack(expected), rtol=1e-5, atol=1e-5)


def test_msda_layer_3d_zero_temporal_offsets_match_2d():
    """Module wiring for the temporal branch (MSDeformAttnLayer.is_3d):
    the temporal reference is the query's own frame and the offset
    projection is zero-init with a zero temporal bias component, so at
    init the 3D layer must reproduce the 2D layer exactly (the frame hat
    weight is 1 on the query's own frame). Also checks the layer
    differentiates through the 3D op."""
    import jax
    from flax import linen as nn  # noqa: F401

    from tce_rvos_tpu.models.transformer import MSDeformAttnLayer

    shapes = ((6, 8), (3, 4))
    n, q, c = 3, 5, 32
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(5)
    query = jnp.asarray(rng.randn(n, q, c).astype(np.float32))
    src = jnp.asarray(rng.randn(n, s, c).astype(np.float32))
    ref = jnp.asarray(rng.rand(n, q, len(shapes), 2).astype(np.float32))

    layer2d = MSDeformAttnLayer(c, len(shapes), 4, 2, impl="xla")
    layer3d = MSDeformAttnLayer(c, len(shapes), 4, 2, impl="xla", is_3d=True)
    v2 = layer2d.init(jax.random.PRNGKey(0), query, ref, src, shapes)
    v3 = layer3d.init(jax.random.PRNGKey(0), query, ref, src, shapes)

    out2, _, _ = layer2d.apply(v2, query, ref, src, shapes)
    out3, loc3, attn3 = layer3d.apply(v3, query, ref, src, shapes)
    np.testing.assert_allclose(
        np.asarray(out3), np.asarray(out2), rtol=1e-5, atol=1e-5
    )
    assert loc3.shape == (n, q, 4, len(shapes), 2, 2)  # xy for consumers

    def loss(v):
        o, _, _ = layer3d.apply(v, query, ref, src, shapes)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(v3)
    gk = g["params"]["sampling_offsets"]["kernel"]
    assert np.isfinite(np.asarray(gk)).all()
    # temporal offset columns receive gradient (every 3rd column)
    gk = np.asarray(gk).reshape(c, -1, 3)
    assert np.abs(gk[:, :, 2]).max() > 0
