"""Cost story for --msda_3d (VERDICT r4 item 5): device throughput of the
flagship forward (and optionally the train step) with temporal-trilinear
MSDA, vs the 2D default, plus the Mosaic compile times of the 3D programs
(the 3D backward had a known 112 s (block 256) / 620 s (block 512) compile
cliff — commit d85d9e6; record it where a regression would be seen).

Methodology = bench.py (K forwards chained in one lax.scan, time-seeded
distinct inputs, in-graph checksum). Reference anchor: the is_3d branch of
ms_deform_im2col_cuda.cuh:366-420,566-714 — which the reference never wires
into any model config (SURVEY.md §2.1), so there is no reference-side
number to compare; the 2D flagship is the baseline.

Usage: python scripts/bench_3d.py [fwd|train|both] [K]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

T, H, W = 5, 384, 640


def bench_forward(cfg_kwargs, k: int):
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8,
                      qtrans=True, msda_impl="pallas",
                      compute_dtype="bfloat16", **cfg_kwargs)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
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
    stacks = [
        jax.block_until_ready(jax.jit(lambda v: v)(np.stack(
            [base + rng.randn(*base.shape).astype(np.float32) * 0.01
             for _ in range(k)]).astype(in_dtype)))
        for _ in range(3)
    ]
    rest = (inputs["video_mask"], inputs["text_ids"],
            inputs["text_attn_mask"], inputs["sizes"])
    t0 = time.perf_counter()
    float(fwd_k(variables, stacks[0], *rest))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = sum(float(fwd_k(variables, stacks[i], *rest)) for i in range(3))
    elapsed = time.perf_counter() - t0
    return 3 * k / elapsed, compile_s


def bench_train(cfg_kwargs, k: int):
    from tce_rvos_tpu.config import ModelConfig, TrainConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8,
                      qtrans=True, msda_impl="pallas", use_checkpoint=True,
                      compute_dtype="bfloat16", **cfg_kwargs)
    tcfg = TrainConfig()
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg, steps_per_epoch=1000)
    step = make_train_step(model.apply, tx, criterion_from_configs(cfg, tcfg),
                           compute_dtype=cfg.compute_dtype)
    rng = np.random.RandomState(0)
    batch = dict(inputs)
    batch["targets"] = {
        "labels": jnp.zeros((1, T), jnp.int32),
        "boxes": jnp.asarray(rng.rand(1, T, 4), np.float32),
        "masks": jnp.asarray((rng.rand(1, T, H, W) > 0.5).astype(np.float32)),
        "valid": jnp.ones((1, T), jnp.int32),
    }

    @jax.jit
    def k_steps(state, videos_k, rngs_k):
        def one(st, xs):
            video, r = xs
            b = dict(batch)
            b["video"] = video
            st, metrics = step(st, b, r)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(one, state, (videos_k, rngs_k))
        return st, losses.sum()

    base = np.asarray(inputs["video"], np.float32)
    videos_k = jnp.asarray(np.stack(
        [base + rng.randn(*base.shape).astype(np.float32) * 0.01
         for _ in range(k)]))
    rngs_k = jax.random.split(
        jax.random.key(0, impl=tcfg.dropout_rng_impl), k)
    t0 = time.perf_counter()
    st, s0 = k_steps(state, videos_k, rngs_k)
    jax.block_until_ready(s0)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        st2, s = k_steps(state, videos_k, rngs_k)
        float(s)
    ms_step = (time.perf_counter() - t0) / (reps * k) * 1e3
    return ms_step, compile_s


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if what in ("fwd", "both"):
        for is3d in (False, True):
            cps, compile_s = bench_forward({"msda_3d": is3d}, k)
            print(json.dumps({
                "metric": "flagship_forward_3d" if is3d else "flagship_forward_2d",
                "clips_per_sec": round(cps, 2),
                "ms_per_clip": round(1000.0 / cps, 2),
                "compile_plus_first_s": round(compile_s, 1),
            }), flush=True)
    if what in ("train", "both"):
        for is3d in (False, True):
            ms, compile_s = bench_train({"msda_3d": is3d}, max(2, k // 2))
            print(json.dumps({
                "metric": "flagship_train_3d" if is3d else "flagship_train_2d",
                "ms_per_step": round(ms, 1),
                "compile_plus_first_s": round(compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
