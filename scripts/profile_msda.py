"""Device-profile the Pallas MSDA op per kernel (the reliable measurement:
wall-clock through the axon tunnel has multi-ms contention noise; the
device timeline does not)."""

import collections
import glob
import gzip
import json
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = ((48, 80), (24, 40), (12, 20), (6, 10))
N, M, D, P = 5, 8, 32, 4
S = sum(h * w for h, w in SHAPES)
Q = S
L = len(SHAPES)
REPS = 3


def device_profile(f, args, reps=REPS):
    jax.block_until_ready(f(*args))
    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            jax.block_until_ready(f(*args))
    p = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(p) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            durs[e["name"]] += e["dur"]
    return {k: v / reps / 1e3 for k, v in durs.items()}


def main():
    parity = "--no-parity" not in sys.argv
    from tce_rvos_tpu.ops.msda import ms_deform_attn
    from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas

    rng = np.random.RandomState(0)
    if parity:
        n, q = 2, 300
        v = rng.randn(n, S, M, D).astype(np.float32)
        loc = rng.rand(n, q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
        attn = rng.rand(n, q, M, L, P).astype(np.float32)
        attn /= attn.sum((-1, -2), keepdims=True)
        ref = np.asarray(
            ms_deform_attn(jnp.asarray(v), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
        )
        got = np.asarray(
            jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, SHAPES, l, a))(
                jnp.asarray(v), jnp.asarray(loc), jnp.asarray(attn)
            )
        )
        err = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"parity rel err: {err:.5f}")
        assert err < 2e-2

    v = jnp.asarray(rng.randn(N, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(N, Q, M, L, P, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(N, Q, M, L, P).astype(np.float32))
    f = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, SHAPES, l, a))
    durs = device_profile(f, (v, loc, attn))
    total = 0.0
    for k, ms in sorted(durs.items(), key=lambda kv: -kv[1]):
        if ms > 0.02:
            print(f"{ms:9.3f} ms/call  {k[:60]}")
        if not k.startswith("jit_"):
            total += ms
    print(f"--- device total (sum of ops): {total:.2f} ms/call")


if __name__ == "__main__":
    main()
