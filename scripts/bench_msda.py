"""Microbenchmark of the MSDA op at encoder shape on the real chip.

Measures ms/call at the flagship encoder size: N=5 frames, 4 levels of a
384x640 frame (strides 8..64), M=8 heads, D=32, P=4 points, Q=S=5100.

Methodology (BASELINE.md): the axon tunnel costs ~26 ms/dispatch, memoizes
identical calls, and the chip shows multi-ms run-to-run contention noise —
so each timed dispatch scans K distinct calls on-device, ms/call is the
slope between a K1 and K2 run, variants are interleaved, and we report the
MIN over R trials (contention only ever adds time).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = ((48, 80), (24, 40), (12, 20), (6, 10))
N, M, D, P = 5, 8, 32, 4
S = sum(h * w for h, w in SHAPES)
Q = S
L = len(SHAPES)
K1, K2, TRIALS = 2, 18, 4


def make_inputs(k, seed, head_major=False, nmq=False):
    rng = np.random.RandomState(seed)
    vshape = (k, N, M, S, D) if (head_major or nmq) else (k, N, S, M, D)
    value = jnp.asarray(rng.randn(*vshape).astype(np.float32))
    if nmq:  # head-major loc/attn (the production model layout)
        loc = jnp.asarray(rng.rand(k, N, M, Q, L, P, 2).astype(np.float32))
        attn = rng.rand(k, N, M, Q, L, P).astype(np.float32)
    else:
        loc = jnp.asarray(rng.rand(k, N, Q, M, L, P, 2).astype(np.float32))
        attn = rng.rand(k, N, Q, M, L, P).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return value, loc, jnp.asarray(attn)


class Variant:
    def __init__(self, name, fn, head_major=False, nmq=False, k1=K1, k2=K2):
        self.name, self.fn, self.head_major = name, fn, head_major
        self.nmq = nmq
        self.k1, self.k2 = k1, k2
        self.best = float("inf")

    def prepare(self, seed):
        self.inputs = {
            k: make_inputs(k, seed + k, self.head_major, self.nmq)
            for k in (self.k1, self.k2)
        }

        fn = self.fn

        @jax.jit
        def run(value, loc, attn):
            def one(c, xs):
                v, l, a = xs
                return c + fn(v, l, a).sum().astype(jnp.float32), 0

            cs, _ = jax.lax.scan(one, jnp.float32(0), (value, loc, attn))
            return cs

        self.run = run
        for k in (self.k1, self.k2):
            float(run(*self.inputs[k]))  # compile

    def trial(self):
        ts = {}
        for k in (self.k1, self.k2):
            t0 = time.perf_counter()
            float(self.run(*self.inputs[k]))
            ts[k] = time.perf_counter() - t0
        slope = (ts[self.k2] - ts[self.k1]) / (self.k2 - self.k1) * 1e3
        self.best = min(self.best, slope)


def main():
    which = sys.argv[1:] or ["pallas_nm", "pallas_nmq"]
    variants = []
    if "xla" in which:
        from tce_rvos_tpu.ops.msda import ms_deform_attn

        variants.append(
            Variant("xla", lambda v, l, a: ms_deform_attn(v, SHAPES, l, a), k1=1, k2=3)
        )
    if "pallas" in which:
        from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas

        variants.append(
            Variant("pallas [N,S,M,D]", lambda v, l, a: ms_deform_attn_pallas(v, SHAPES, l, a))
        )
    if "pallas_nm" in which:
        from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas_nm

        variants.append(
            Variant(
                "pallas_nm [N,M,S,D]",
                lambda v, l, a: ms_deform_attn_pallas_nm(v, SHAPES, l, a),
                head_major=True,
            )
        )
    if "pallas_nmq" in which:
        from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas_nmq

        variants.append(
            Variant(
                "pallas_nmq [all head-major]",
                lambda v, l, a: ms_deform_attn_pallas_nmq(v, SHAPES, l, a),
                nmq=True,
            )
        )

    seed = int(time.time() * 1e6) % (2**31)
    for v in variants:
        v.prepare(seed)
    for _ in range(TRIALS):
        for v in variants:
            v.trial()
    for v in variants:
        print(f"{v.name}: {v.best:.2f} ms/call (min of {TRIALS})")


if __name__ == "__main__":
    main()
