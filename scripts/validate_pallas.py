"""Native-TPU validation + microbenchmark of the Pallas MSDA kernel vs the
XLA gather path. Run on a real chip (default env): prints parity error and
per-call latency at encoder-like sizes."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from tce_rvos_tpu.ops.msda import ms_deform_attn
from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas


def main():
    # 360p encoder-like sizes: levels 8x..64x of a 384x640 input, N=b*t=5
    shapes = ((48, 80), (24, 40), (12, 20), (6, 10))
    n, m, d, p = 5, 8, 32, 4
    s = sum(h * w for h, w in shapes)
    q = s
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(n, s, m, d), jnp.float32)
    loc = jnp.asarray(rng.rand(n, q, m, len(shapes), p, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(n, q, m, len(shapes), p) + 1e-3, jnp.float32)
    attn = attn / attn.reshape(n, q, m, -1).sum(-1)[..., None, None]

    f_xla = jax.jit(lambda v, l, a: ms_deform_attn(v, shapes, l, a))
    f_pal = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, shapes, l, a))

    print(f"devices: {jax.devices()}")
    o_xla = jax.block_until_ready(f_xla(value, loc, attn))
    o_pal = jax.block_until_ready(f_pal(value, loc, attn))
    err = float(jnp.max(jnp.abs(o_xla - o_pal)))
    rel = err / (float(jnp.max(jnp.abs(o_xla))) + 1e-9)
    print(f"parity: max abs err {err:.3e} (rel {rel:.3e})")

    for name, f in (("xla_gather", f_xla), ("pallas", f_pal)):
        for _ in range(3):
            jax.block_until_ready(f(value, loc, attn))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = f(value, loc, attn)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms/call  (N={n}, Q={q}, M={m}, D={d})")

    # analytic Pallas backward (ops/pallas_msda_bwd.py) vs the oracle VJP
    g = jnp.asarray(rng.randn(n, q, m * d), jnp.float32)
    gr = jax.jit(jax.grad(
        lambda v, l, a: (ms_deform_attn(v, shapes, l, a) * g).sum(),
        argnums=(0, 1, 2),
    ))(value, loc, attn)
    gp = jax.jit(jax.grad(
        lambda v, l, a: (ms_deform_attn_pallas(v, shapes, l, a) * g).sum(),
        argnums=(0, 1, 2),
    ))(value, loc, attn)
    for nm, a, b in zip(("d_value", "d_loc", "d_attn"), gr, gp):
        a, b = np.asarray(a), np.asarray(b)
        print(f"bwd {nm}: rel err {np.abs(a - b).max() / np.abs(a).max():.3e}")


if __name__ == "__main__":
    main()
