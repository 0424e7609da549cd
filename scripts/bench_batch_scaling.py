"""Batch-scaling curve of the flagship forward (VERDICT r3 item 8).

Measures ms/clip and useful-FLOP MFU at batch E in {1, 2, 4, 8} clips per
forward (N = E*5 frames through the encoder) — the shapes the
expression-batched serving path (infer.run_video_batch) actually runs. If
the Pallas kernels' per-call fixed costs amortize with batch, serving MFU
improves for free; if the curve is flat, that documents the floor.

Methodology = bench.py: K forwards chained in one lax.scan per dispatch
(amortizes the ~26 ms tunnel RPC), distinct time-seeded inputs, in-graph
checksum fetch per iteration.

Usage: python scripts/bench_batch_scaling.py [E ...]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, H, W = 5, 384, 640
USEFUL_FLOPS_PER_CLIP = 1.2398e12  # scripts/count_flops.py
V5E_BF16_PEAK_FLOPS = 197e12
WARM_K, ITERS = 2, 3
K = int(os.environ.get("BBS_K", "8"))  # chained forwards per dispatch


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8,
                      qtrans=True, msda_impl="pallas",
                      compute_dtype="bfloat16")
    model = build_model(cfg)

    for e in batches:
        inputs = example_inputs(cfg, b=e, t=T, hw=(H, W), text_len=8)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
        variables, inputs = apply_compute_dtype(cfg, variables, inputs)

        @jax.jit
        def fwd_k(variables, videos_k, video_mask, text_ids, text_attn, sizes):
            def one(carry, video):
                out = model.apply(
                    variables, video=video, video_mask=video_mask,
                    text_ids=text_ids, text_attn_mask=text_attn, sizes=sizes,
                )
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
                 for _ in range(K)]).astype(in_dtype)))
            for _ in range(ITERS)
        ]
        rest = (inputs["video_mask"], inputs["text_ids"],
                inputs["text_attn_mask"], inputs["sizes"])
        float(fwd_k(variables, stacks[0], *rest))  # compile + settle

        start = time.perf_counter()
        sums = [fwd_k(variables, stacks[i], *rest) for i in range(ITERS)]
        _ = sum(float(x) for x in sums)
        elapsed = time.perf_counter() - start

        clips_per_sec = ITERS * K * e / elapsed
        print(json.dumps({
            "metric": "flagship_forward_batch_scaling",
            "batch_clips": e,
            "frames_per_forward": e * T,
            "ms_per_clip": round(1000.0 / clips_per_sec, 2),
            "clips_per_sec": round(clips_per_sec, 2),
            "mfu": round(
                USEFUL_FLOPS_PER_CLIP * clips_per_sec / V5E_BF16_PEAK_FLOPS,
                4),
        }), flush=True)


if __name__ == "__main__":
    main()
