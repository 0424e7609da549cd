"""One-pass fused LayerNorm for TPU.

The reference uses torch.nn.LayerNorm throughout
(models/tce_deformable_transformer.py, models/segmentation.py); XLA lowers
our flax equivalents to multi-output reduce fusions that profile ~6x off
HBM bandwidth at the encoder's [N*S, 256] hot shape (~0.3 ms per LN,
device timeline). This kernel reads the row block once, computes the
mean / fast-variance statistics in f32 on the VPU, and writes the
normalized rows once — bandwidth-bound by construction.

Semantics match ``flax.linen.LayerNorm`` with ``use_fast_variance=True``
(var = E[x^2] - E[x]^2) and f32 statistics regardless of input dtype.
The backward is analytic, computed in plain XLA (it fuses fine there).

``layer_norm`` dispatches: Pallas on TPU backends when the feature dim is
lane-aligned, the plain-jnp reference otherwise (CPU tests, odd widths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 1024


def _ln_kernel(*refs, eps: float, with_res: bool):
    if with_res:
        x_ref, r_ref, s_ref, b_ref, o_ref = refs
        x = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    else:
        x_ref, s_ref, b_ref, o_ref = refs
        x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (
        y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _ln_pallas_2d(x, scale, bias, eps, res=None):
    r, c = x.shape
    br = min(_BLOCK_ROWS, max(8, r))
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec] + ([row_spec] if res is not None else []) + [
        vec_spec, vec_spec,
    ]
    args = (x,) + ((res,) if res is not None else ()) + (scale[None], bias[None])
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, with_res=res is not None),
        grid=(pl.cdiv(r, br),),
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
    )(*args)


def _stats(x32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return mu, rstd


def _ln_reference(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu, rstd = _stats(x32, eps)
    y = (x32 - mu) * rstd * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps=1e-6):
    """Pallas one-pass LayerNorm over the last axis. x: [..., C] with C a
    multiple of 128; scale/bias: [C]. Output dtype follows x."""
    shape = x.shape
    y = _ln_pallas_2d(x.reshape(-1, shape[-1]), scale, bias, eps)
    return y.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_add_layer_norm(x, res, scale, bias, eps=1e-6):
    """LN(x + res) with the residual add folded into the kernel's single
    pass (the transformer's post-norm blocks are all LN(x + drop(y)) —
    materializing the sum costs an extra HBM round-trip per norm)."""
    shape = x.shape
    y = _ln_pallas_2d(
        x.reshape(-1, shape[-1]), scale, bias, eps,
        res=res.reshape(-1, shape[-1]),
    )
    return y.reshape(shape)


def _fused_add_fwd(x, res, scale, bias, eps):
    return fused_add_layer_norm(x, res, scale, bias, eps), (x, res, scale)


def _fused_add_bwd(eps, resids, g):
    x, res, scale = resids
    s = (x.astype(jnp.float32) + res.astype(jnp.float32)).astype(x.dtype)
    dx, dscale, dbias = _fused_bwd(eps, (s, scale), g)
    return dx, dx.astype(res.dtype), dscale, dbias


def _fused_fwd(x, scale, bias, eps):
    return fused_layer_norm(x, scale, bias, eps), (x, scale)


def _fused_bwd(eps, res, g):
    x, scale = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mu, rstd = _stats(x32, eps)
    xhat = (x32 - mu) * rstd
    gs = g32 * scale.astype(jnp.float32)
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=red).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=red).astype(scale.dtype)
    dx = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dscale, dbias


fused_layer_norm.defvjp(_fused_fwd, _fused_bwd)


fused_add_layer_norm.defvjp(_fused_add_fwd, _fused_add_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def layer_norm(x, scale, bias, eps=1e-6, residual=None):
    """Dispatching LayerNorm (optionally LN(x + residual)): Pallas kernel
    on TPU for lane-aligned feature dims, plain-jnp reference otherwise.
    Numerics are identical (f32 stats, fast variance) up to the
    output-dtype rounding."""
    if x.shape[-1] % 128 == 0 and x.ndim >= 2 and _on_tpu():
        if residual is not None:
            return fused_add_layer_norm(x, residual, scale, bias, eps)
        return fused_layer_norm(x, scale, bias, eps)
    if residual is not None:
        x = x + residual
    return _ln_reference(x, scale, bias, eps)
