"""Native (real-TPU) parity + timing for the is_3d Pallas forward
(ops/pallas_msda_3d.py) vs the XLA trilinear oracle
(ops/msda.py::ms_deform_attn_3d), at an encoder-like temporal shape."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tce_rvos_tpu.ops.msda import ms_deform_attn_3d
    from tce_rvos_tpu.ops.pallas_msda_3d import ms_deform_attn_pallas_3d

    print("devices:", jax.devices())
    shapes = ((48, 80), (24, 40), (12, 20), (6, 10))
    n, m, d, p = 5, 8, 32, 4
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    q = s
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(n, s, m, d).astype(np.float32))
    loc = jnp.asarray(rng.rand(n, q, m, l, p, 3).astype(np.float32))
    attn = rng.rand(n, q, m, l, p).astype(np.float32) + 1e-3
    attn = jnp.asarray(
        attn / attn.reshape(n, q, m, l * p).sum(-1)[..., None, None]
    )

    f_o = jax.jit(lambda v, lo, a: ms_deform_attn_3d(v, shapes, lo, a))
    f_p = jax.jit(lambda v, lo, a: ms_deform_attn_pallas_3d(v, shapes, lo, a))
    o = jax.block_until_ready(f_o(value, loc, attn))
    pl_ = jax.block_until_ready(f_p(value, loc, attn))
    rel = float(jnp.max(jnp.abs(o - pl_))) / (float(jnp.max(jnp.abs(o))) + 1e-9)
    print(f"3d parity (native): rel err {rel:.3e}")
    assert rel < 2e-2, rel

    for name, fn in (("xla_3d", f_o), ("pallas_3d", f_p)):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(value, loc, attn)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.3f} ms/call  "
              f"(N={n}, Q={q}, M={m}, D={d})")


if __name__ == "__main__":
    main()
