"""Mixed-precision helpers — the TPU bf16 inference fast path.

TPU-first design: rather than threading a ``dtype`` attribute through every
flax module, the framework keeps its modules dtype-polymorphic (flax's
default promotion semantics — compute dtype follows the operands) and
enters bf16 by casting parameters and inputs once at the boundary.
Numerically sensitive state stays f32 by construction:

  * normalisation statistics (flax computes LayerNorm/GroupNorm stats in
    f32 internally regardless of the operand dtype),
  * box / reference-point coordinate math (pinned to f32 in the decoder,
    transformer.py),
  * MSDA sampling locations (f32 into both the XLA gather and the Pallas
    kernel; the kernel quantises only its interpolation taps to bf16),
  * position encodings are built in f32 and cast to the feature dtype at
    the point of use (``layers.with_pos``) so they can't silently
    re-promote a bf16 feature path.

The reference stack (torch CUDA) runs f32 end to end; on TPU the MXU's
native bf16 matmul path is the speed-of-light configuration, so
``ModelConfig.compute_dtype = "bfloat16"`` is the intended deployment
setting for inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def resolve_dtype(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(
            f"compute_dtype must be one of {sorted(_DTYPES)}, got {name!r}"
        ) from None


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``; leave ints,
    bools and non-arrays untouched."""
    dtype = resolve_dtype(dtype) if isinstance(dtype, str) else dtype

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def apply_compute_dtype(cfg, variables, inputs):
    """Enter the configured compute dtype: cast params and the video input.

    Returns ``(variables, inputs)`` unchanged when ``cfg.compute_dtype`` is
    float32. Text ids / masks / sizes are integer-typed and pass through.
    """
    if cfg.compute_dtype == "float32":
        return variables, inputs
    dtype = resolve_dtype(cfg.compute_dtype)
    variables = cast_floating(variables, dtype)
    inputs = dict(inputs)
    inputs["video"] = inputs["video"].astype(dtype)
    return variables, inputs
