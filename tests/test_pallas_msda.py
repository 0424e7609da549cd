"""Pallas MSDA kernel parity vs the XLA oracle.

Interpreter-mode execution is prohibitively slow on remote-compile backends
(every interpreted kernel op is an eager dispatch), so these tests are
opt-in: set RUN_PALLAS_INTERPRET=1. On real TPU the kernel is exercised
natively by bench.py / scripts/validate_pallas.py."""

import os

import numpy as np
import pytest

if not os.environ.get("RUN_PALLAS_INTERPRET"):
    pytest.skip(
        "pallas interpret tests disabled (set RUN_PALLAS_INTERPRET=1)",
        allow_module_level=True,
    )

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
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_pallas_backward_uses_oracle_vjp(inputs):
    value, loc, attn = inputs

    def loss_p(v, l, a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ms_deform_attn_pallas(v, SHAPES, l, a) ** 2)

    def loss_o(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 2))(value, loc, attn)
    go = jax.grad(loss_o, argnums=(0, 2))(value, loc, attn)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
