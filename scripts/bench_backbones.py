"""Flagship inference throughput across the reference's flagship backbones.

The reference's shipped scripts name THREE flagship backbones: resnet50
(scripts/dist_train_test_ytvos_new.sh), video_swin_t_p4w7 and
video_swin_s_p4w7 (scripts/dist_test_davis.sh, scripts/inf_jhmdb.sh). bench.py measures the
resnet50 headline; this sweep measures all of them under the identical
protocol (bf16, 5x384x640 clips, K-clip lax.scan to amortize dispatch) so
the perf story covers every shipped config.

Usage: python scripts/bench_backbones.py [backbone ...]
       (default: resnet50 video_swin_t_p4w7 video_swin_s_p4w7)
Prints one JSON line per backbone.
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
WARMUP = 2
ITERS = 3
K = 8


def bench_one(backbone: str) -> dict:
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    cfg = ModelConfig(
        backbone=backbone, with_box_refine=True, binary=True, f_token=8,
        qtrans=True, msda_impl="pallas", compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    @jax.jit
    def fwd_k(variables, videos_k, video_mask, text_ids, text_attn_mask, sizes):
        def one(carry, video):
            out = model.apply(
                variables, video=video, video_mask=video_mask,
                text_ids=text_ids, text_attn_mask=text_attn_mask, sizes=sizes,
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
    clips_per_sec = ITERS * K / elapsed
    return {
        "metric": f"ytvos_flagship_clips_per_sec_per_chip[{backbone}]",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s (5x384x640, FTF8+IQT, bf16)",
        "device_ms": round(1000.0 / clips_per_sec, 2),
    }


def main():
    backbones = sys.argv[1:] or [
        "resnet50", "video_swin_t_p4w7", "video_swin_s_p4w7"
    ]
    for name in backbones:
        print(json.dumps(bench_one(name)), flush=True)


if __name__ == "__main__":
    main()
