"""Native (real-TPU) parity + timing for the is_3d Pallas kernels
(ops/pallas_msda_3d.py fwd, ops/pallas_msda_3d_bwd.py analytic bwd) vs the
XLA trilinear oracle (ops/msda.py::ms_deform_attn_3d), at an encoder-like
temporal shape.

The oracle runs ON THE HOST CPU in a SUBPROCESS with JAX_PLATFORMS=cpu:
the XLA gather path at this Q=S=5100 size crashes the TPU worker through
the sandbox tunnel (the same fragility as the round-3 note about tiny-Q
gather calls in the bf16 model), and compiling "cpu" programs from inside
an axon-initialized process still routes through the remote-compile
service (observed wedged >20 min at ~0% CPU) — a clean cpu process
compiles the same program locally in seconds."""

import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

_ORACLE_SRC = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, {repo!r})
from tce_rvos_tpu.ops.msda import ms_deform_attn_3d
d = np.load(sys.argv[1])
shapes = tuple(map(tuple, d["shapes"]))
value, loc, attn = (jnp.asarray(d[k]) for k in ("value", "loc", "attn"))
fwd = jax.jit(lambda v, lo, a: ms_deform_attn_3d(v, shapes, lo, a))
out = {{"fwd": np.asarray(fwd(value, loc, attn))}}
if d["grads"]:
    g = jax.jit(jax.grad(
        lambda v, lo, a: jnp.sum(ms_deform_attn_3d(v, shapes, lo, a) ** 2),
        argnums=(0, 1, 2)))(value, loc, attn)
    out.update(dv=np.asarray(g[0]), dloc=np.asarray(g[1]),
               dattn=np.asarray(g[2]))
np.savez(sys.argv[2], **out)
"""


def cpu_oracle(shapes, value, loc, attn, grads: bool):
    """Run the XLA 3D oracle (fwd and optionally its VJP) in a clean
    JAX_PLATFORMS=cpu subprocess; returns the npz dict."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        inp, outp = os.path.join(td, "in.npz"), os.path.join(td, "out.npz")
        np.savez(inp, shapes=np.asarray(shapes), value=np.asarray(value),
                 loc=np.asarray(loc), attn=np.asarray(attn), grads=grads)
        src = _ORACLE_SRC.format(repo=repo)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
        subprocess.run([sys.executable, "-c", src, inp, outp],
                       check=True, env=env)
        return dict(np.load(outp))


def main():
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

    o = cpu_oracle(shapes, value, loc, attn, grads=False)["fwd"]
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
    # parity at a REDUCED shape: the CPU gather-oracle VJP at the full
    # Q=5100 shape takes >40 min to compile; parity is shape-generic (both
    # kernel families + multi-frame lerp are exercised below), the full
    # shape is covered by the native timing after
    shapes_b = ((24, 40), (12, 20), (6, 10))
    s_b = sum(h * w for h, w in shapes_b)
    q_b, n_b = 640, 4
    l_b = len(shapes_b)
    value_b = jnp.asarray(rng.randn(n_b, s_b, m, d).astype(np.float32))
    loc_b = jnp.asarray(rng.rand(n_b, q_b, m, l_b, p, 3).astype(np.float32))
    attn_b = rng.rand(n_b, q_b, m, l_b, p).astype(np.float32) + 1e-3
    attn_b = jnp.asarray(
        attn_b / attn_b.reshape(n_b, q_b, m, l_b * p).sum(-1)[..., None, None]
    )
    od = cpu_oracle(shapes_b, value_b, loc_b, attn_b, grads=True)
    go = (od["dv"], od["dloc"], od["dattn"])
    g_pb = jax.jit(jax.grad(
        lambda v, lo, a: jnp.sum(
            ms_deform_attn_pallas_3d(v, shapes_b, lo, a) ** 2),
        argnums=(0, 1, 2)))
    gp = jax.block_until_ready(g_pb(value_b, loc_b, attn_b))
    for nm, a, b in zip(("d_value", "d_loc", "d_attn"), gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.max(np.abs(b))) + 1e-9
        err = float(np.max(np.abs(a - b))) / scale
        print(f"3d bwd {nm}: rel err {err:.3e}")
        assert err < 2e-2, (nm, err)

    # native fwd+bwd timing at the parity shape; the FULL encoder shape's
    # backward compile runs ~1 h through the remote-compile service (pass
    # --full to wait for it — one-time, cached; the 3D mode is experimental
    # so the default keeps this script under ~15 min)
    t0 = time.perf_counter()
    for _ in range(10):
        out = g_pb(value_b, loc_b, attn_b)
    jax.block_until_ready(out)
    print(f"pallas_3d fwd+bwd (reduced {shapes_b}, Q={q_b}): "
          f"{(time.perf_counter() - t0) / 10 * 1e3:.3f} ms/call")

    if "--full" in sys.argv:
        g_p = jax.jit(jax.grad(
            lambda v, lo, a: jnp.sum(
                ms_deform_attn_pallas_3d(v, shapes, lo, a) ** 2),
            argnums=(0, 1, 2)))
        jax.block_until_ready(g_p(value, loc, attn))
        t0 = time.perf_counter()
        for _ in range(10):
            out = g_p(value, loc, attn)
        jax.block_until_ready(out)
        print(f"pallas_3d fwd+bwd (full): "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
