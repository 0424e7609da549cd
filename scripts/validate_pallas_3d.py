"""Native (real-TPU) parity + timing for the is_3d Pallas kernels
(ops/pallas_msda_3d.py fwd, ops/pallas_msda_3d_bwd.py analytic bwd) vs the
XLA trilinear oracle (ops/msda.py::ms_deform_attn_3d), at an encoder-like
temporal shape.

The oracle runs ON THE HOST CPU: the XLA gather path at this Q=S=5100 size
crashes the TPU worker through the sandbox tunnel (the same fragility as
the round-3 note about tiny-Q gather calls in the bf16 model) — and CPU
f32 is the better reference anyway."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tce_rvos_tpu.ops.msda import ms_deform_attn_3d
    from tce_rvos_tpu.ops.pallas_msda_3d import ms_deform_attn_pallas_3d

    print("devices:", jax.devices())
    cpu = jax.devices("cpu")[0]
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

    with jax.default_device(cpu):
        f_o = jax.jit(lambda v, lo, a: ms_deform_attn_3d(v, shapes, lo, a))
        o = np.asarray(jax.block_until_ready(f_o(value, loc, attn)))
    f_p = jax.jit(lambda v, lo, a: ms_deform_attn_pallas_3d(v, shapes, lo, a))
    pl_ = np.asarray(jax.block_until_ready(f_p(value, loc, attn)))
    rel = float(np.max(np.abs(o - pl_))) / (float(np.max(np.abs(o))) + 1e-9)
    print(f"3d parity (native vs cpu oracle): rel err {rel:.3e}")
    assert rel < 2e-2, rel

    t0 = time.perf_counter()
    for _ in range(10):
        out = f_p(value, loc, attn)
    jax.block_until_ready(out)
    print(f"pallas_3d fwd: {(time.perf_counter() - t0) / 10 * 1e3:.3f} "
          f"ms/call  (N={n}, Q={q}, M={m}, D={d})")

    # ---- analytic 3D backward (ops/pallas_msda_3d_bwd.py) vs oracle VJP ----
    with jax.default_device(cpu):
        g_o = jax.jit(jax.grad(
            lambda v, lo, a: jnp.sum(ms_deform_attn_3d(v, shapes, lo, a) ** 2),
            argnums=(0, 1, 2)))
        go = jax.block_until_ready(g_o(value, loc, attn))
    g_p = jax.jit(jax.grad(
        lambda v, lo, a: jnp.sum(
            ms_deform_attn_pallas_3d(v, shapes, lo, a) ** 2),
        argnums=(0, 1, 2)))
    gp = jax.block_until_ready(g_p(value, loc, attn))
    for nm, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.max(np.abs(b))) + 1e-9
        err = float(np.max(np.abs(a - b))) / scale
        print(f"3d bwd {nm}: rel err {err:.3e}")
        assert err < 2e-2, (nm, err)

    t0 = time.perf_counter()
    for _ in range(10):
        out = g_p(value, loc, attn)
    jax.block_until_ready(out)
    print(f"pallas_3d fwd+bwd: {(time.perf_counter() - t0) / 10 * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
