"""Fused Pallas LayerNorm: parity vs flax nn.LayerNorm (fwd) and vs
autodiff of the plain-jnp reference (bwd), in TPU-interpret mode on CPU."""

import numpy as np
import pytest  # noqa: F401

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental.pallas import tpu as pltpu

from tce_rvos_tpu.ops.pallas_ln import (
    _ln_reference,
    fused_layer_norm,
    layer_norm,
)

R, C = 300, 256  # R deliberately NOT a block multiple (ragged last block)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 100, C) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, scale, bias


def test_fused_ln_matches_flax(inputs):
    x, scale, bias = inputs
    ln = nn.LayerNorm(epsilon=1e-6)
    expected = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused_layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)
    # the dispatching wrapper's CPU path agrees too
    ref = layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_backward(inputs):
    x, scale, bias = inputs

    def loss_p(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_layer_norm(x, s, b) ** 2)

    def loss_r(x, s, b):
        return jnp.sum(_ln_reference(x, s, b, 1e-6) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for name, a, b in zip(("dx", "dscale", "dbias"), gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale_ = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 1e-4 * scale_, (name, np.abs(a - b).max())


def test_fused_ln_bf16_io():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(R, C), jnp.bfloat16)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = fused_layer_norm(x, scale, bias)
    assert got.dtype == jnp.bfloat16
    expected = _ln_reference(x, scale, bias, 1e-6)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_add_ln(inputs):
    """LN(x + residual) with the add folded into the kernel."""
    from tce_rvos_tpu.ops.pallas_ln import fused_add_layer_norm

    x, scale, bias = inputs
    res = x * 0.3 + 0.1
    expected = _ln_reference(x + res, scale, bias, 1e-6)
    with pltpu.force_tpu_interpret_mode():
        got = fused_add_layer_norm(x, res, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)

    def loss_p(x, r, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_add_layer_norm(x, r, s, b) ** 2)

    def loss_r(x, r, s, b):
        return jnp.sum(_ln_reference(x + r, s, b, 1e-6) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    for name, a, b in zip(("dx", "dres", "dscale", "dbias"), gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        sc = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() < 1e-4 * sc, (name, np.abs(a - b).max())
