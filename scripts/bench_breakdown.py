"""Component-level throughput breakdown on a real TPU chip.

Benches the flagship config minus one piece at a time (config ablation),
using the same tunnel-safe protocol as bench.py: K distinct clips scanned
inside ONE dispatch (this sandbox's TPU tunnel costs ~26 ms per dispatch,
so naive per-call timing measures the RPC, not the chip), time-seeded
inputs (the tunnel memoizes identical calls across processes), one scalar
checksum fetch to close the timing window.

Round-1 results are recorded in BASELINE.md ("Component breakdown").
Run: python scripts/bench_breakdown.py  (default env — real chip).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from tce_rvos_tpu.config import ModelConfig
from tce_rvos_tpu.models.build import build_model, example_inputs
from tce_rvos_tpu.utils.precision import apply_compute_dtype

T, H, W, K, ITERS = 5, 384, 640, 8, 3


def bench(label, **over):
    base_kw = dict(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                   msda_impl="pallas", compute_dtype="bfloat16")
    base_kw.update(over)
    cfg = ModelConfig(**base_kw)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    @jax.jit
    def fwd_k(variables, videos_k, video_mask, text_ids, text_attn_mask, sizes):
        def one(carry, video):
            out = model.apply(variables, video=video, video_mask=video_mask,
                              text_ids=text_ids, text_attn_mask=text_attn_mask,
                              sizes=sizes)
            return carry + out["pred_masks"].sum().astype(jnp.float32), 0

        cs, _ = jax.lax.scan(one, jnp.float32(0), videos_k)
        return cs

    rng = np.random.RandomState(int(time.time() * 1e6) % (2**31))
    base = np.asarray(inputs["video"], np.float32)
    in_dtype = inputs["video"].dtype
    make = jax.jit(lambda v: v)
    stacks = [
        jax.block_until_ready(make(np.stack(
            [base + rng.randn(*base.shape).astype(np.float32) * 0.01
             for _ in range(K)]
        ).astype(in_dtype)))
        for _ in range(ITERS)
    ]
    rest = (inputs["video_mask"], inputs["text_ids"],
            inputs["text_attn_mask"], inputs["sizes"])
    float(fwd_k(variables, stacks[0], *rest))  # compile + settle
    t0 = time.perf_counter()
    cs = sum(float(fwd_k(variables, stacks[i], *rest)) for i in range(ITERS))
    dt = (time.perf_counter() - t0) / (ITERS * K)
    print(f"{label}: {dt * 1e3:.1f} ms/clip ({1 / dt:.1f} clips/s) "
          f"cs={cs:.0f}", flush=True)
    return dt


def main():
    bench("flagship")
    bench("enc_layers=1", enc_layers=1)
    bench("dec_layers=1", dec_layers=1)
    bench("f_token=0 (no FTF)", f_token=0)
    bench("vlblock off", vlblock=False)
    bench("msda_impl=xla", msda_impl="xla")
    bench("min (enc1 dec1 noFTF noVL)", enc_layers=1, dec_layers=1,
          f_token=0, vlblock=False)


if __name__ == "__main__":
    main()
