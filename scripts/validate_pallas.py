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

    # ---- BANDED path (pixel_queries=True), native: encoder-realistic
    # structured locations = own pixel position + small offsets ----
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
    off = (rng.rand(n, s, m, len(shapes), p, 2) * 2 - 1) * 3.0
    norm = np.asarray([[w, h] for h, w in shapes], np.float32)
    loc_px = jnp.asarray(
        (
            ref[None, :, None, None, None, :]
            + off / norm[None, None, None, :, None, :]
        ).astype(np.float32)
    )
    f_band = jax.jit(
        lambda v, l, a: ms_deform_attn_pallas(
            v, shapes, l, a, pixel_queries=True
        )
    )
    o_band = jax.block_until_ready(f_band(value, loc_px, attn))
    o_ref = f_xla(value, loc_px, attn)
    rel = float(jnp.max(jnp.abs(o_band - o_ref))) / (
        float(jnp.max(jnp.abs(o_ref))) + 1e-9
    )
    print(f"banded fwd parity (native): rel err {rel:.3e}")
    assert rel < 2e-2, rel
    t0 = time.perf_counter()
    for _ in range(20):
        out = f_band(value, loc_px, attn)
    jax.block_until_ready(out)
    print(f"pallas banded: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms/call")

    gb = jax.jit(jax.grad(
        lambda v, l, a: (
            ms_deform_attn_pallas(v, shapes, l, a, pixel_queries=True) * g
        ).sum(),
        argnums=(0, 1, 2),
    ))(value, loc_px, attn)
    go = jax.jit(jax.grad(
        lambda v, l, a: (ms_deform_attn(v, shapes, l, a) * g).sum(),
        argnums=(0, 1, 2),
    ))(value, loc_px, attn)
    for nm, a, b in zip(("d_value", "d_loc", "d_attn"), go, gb):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / np.abs(a).max()
        print(f"banded bwd {nm} (native): rel err {rel:.3e}")
        assert rel < 3e-2, (nm, rel)

    f_grad = jax.jit(jax.grad(
        lambda v, l, a: (
            ms_deform_attn_pallas(v, shapes, l, a, pixel_queries=True) * g
        ).sum(),
        argnums=(0, 1, 2),
    ))
    for _ in range(3):
        jax.block_until_ready(f_grad(value, loc_px, attn))
    t0 = time.perf_counter()
    for _ in range(20):
        gout = f_grad(value, loc_px, attn)
    jax.block_until_ready(gout)
    print(f"pallas banded fwd+bwd: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
