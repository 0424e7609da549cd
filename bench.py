"""Benchmark: flagship-config inference throughput on one TPU chip.

Protocol (BASELINE.md north star — clips/sec/chip on Ref-YouTube-VOS-style
inference): flagship model (resnet50, FTF=8, IQT, box refine, binary),
5-frame clips at the reference's val resolution (360 short side, max 640 —
padded to 384x640 for static shapes), batch 1, steady-state over repeated
jitted forwards after warmup.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
``vs_baseline`` field is computed against REFERENCE_GPU_CLIPS_PER_SEC below —
a documented estimate of the reference stack's single-GPU throughput at the
same resolution (PyTorch eager ReferFormer-class models with the CUDA
MSDeformAttn run ~5-10 clips/s on an A100 at this size; we use 8.0). The
driver's target is vs_baseline >= 3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_CLIPS_PER_SEC = 8.0  # documented estimate, see module docstring
# USEFUL forward FLOPs per clip, counted by XLA cost analysis on the
# gather-oracle MSDA build (scripts/count_flops.py) — deformable attention
# at its true 4*L*P-taps-per-query arithmetic, NOT the Pallas
# dense-separable executed-FLOP blowup. v5e bf16 peak = 197 TFLOP/s.
USEFUL_FLOPS_PER_CLIP = 1.239e12
V5E_BF16_PEAK_FLOPS = 197e12

T = 5
H, W = 384, 640
WARMUP = 3
ITERS = 4
K = 16  # clips per dispatch (lax.scan) — amortizes per-dispatch RPC overhead


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    # deployment configuration: bf16 boundary cast (utils/precision.py) —
    # pass "float32" as argv[1] to measure the full-precision path
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                      msda_impl="pallas", compute_dtype=dtype)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)

    init = jax.jit(model.init)
    variables = init(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    # K clips per dispatch, scanned sequentially on-device: a production
    # server keeps the chip fed (dispatch latency overlaps compute), so the
    # per-clip metric must not be inflated by per-dispatch RPC overhead —
    # measured at ~26 ms/dispatch through this sandbox's TPU tunnel, i.e.
    # comparable to the model itself. lax.scan serialises the K forwards,
    # so elapsed/K is true per-clip device time plus 1/K of the overhead.
    @jax.jit
    def fwd_k(variables, videos_k, video_mask, text_ids, text_attn_mask, sizes):
        def one(carry, video):
            out = model.apply(
                variables,
                video=video,
                video_mask=video_mask,
                text_ids=text_ids,
                text_attn_mask=text_attn_mask,
                sizes=sizes,
            )
            # scalar checksum: fetching it forces real execution
            return carry + out["pred_masks"].sum().astype(jnp.float32), 0
        cs, _ = jax.lax.scan(one, jnp.float32(0), videos_k)
        return cs

    # distinct (pre-staged, device-resident) inputs per clip: defeats call
    # memoization in tunnel backends without per-iteration host round-trips;
    # a single scalar fetch closes the timing window. Seed from the clock —
    # tunnel result caches persist across processes, so a fixed seed would
    # replay cached results.
    rng = np.random.RandomState(int(time.time() * 1e6) % (2**31))
    base = np.asarray(inputs["video"], np.float32)
    in_dtype = inputs["video"].dtype  # keep the compute dtype (bf16 path)
    make = jax.jit(lambda v: v)  # device staging
    stacks = [
        jax.block_until_ready(
            make(
                np.stack(
                    [
                        base + rng.randn(*base.shape).astype(np.float32) * 0.01
                        for _ in range(K)
                    ]
                ).astype(in_dtype)
            )
        )
        for _ in range(ITERS)
    ]
    rest = (
        inputs["video_mask"],
        inputs["text_ids"],
        inputs["text_attn_mask"],
        inputs["sizes"],
    )

    float(fwd_k(variables, stacks[0], *rest))  # compile + settle

    start = time.perf_counter()
    sums = [fwd_k(variables, stacks[i], *rest) for i in range(ITERS)]
    checksum = sum(float(x) for x in sums)  # forces execution of every iter
    elapsed = time.perf_counter() - start

    clips_per_sec = ITERS * K / elapsed
    device_ms = 1000.0 / clips_per_sec  # scan amortizes dispatch overhead

    # ---- serving path (VERDICT r4 item 1): per window, the text-
    # independent backbone runs ONCE and the text-conditioned trunk runs
    # with E expressions stacked on the batch axis (infer.run_video_batch).
    # E=4 x 5-frame windows = 20 frames/trunk — the measured flat region of
    # the batch-scaling curve (scripts/bench_batch_scaling.py; 40 frames is
    # 2.6x worse per clip). The serial protocol costs E full forwards per
    # window; the metric below is expression-windows/s on the batched path.
    E = 4
    from tce_rvos_tpu.models.text_encoder import tokenize

    text_ids_e, text_attn_e = tokenize(
        [f"the object number {i} moving around" for i in range(E)]
    )

    @jax.jit
    def serve_k(variables, videos_k, video_mask, sizes):
        def one(carry, video):
            feats = model.apply(
                variables, video=video, video_mask=video_mask,
                backbone_only=True,
            )
            out = model.apply(
                variables, video=None, video_mask=video_mask,
                text_ids=text_ids_e, text_attn_mask=text_attn_e,
                sizes=sizes, precomputed_feats=feats,
            )
            return carry + out["pred_masks"].sum().astype(jnp.float32), 0
        cs, _ = jax.lax.scan(one, jnp.float32(0), videos_k)
        return cs

    sk = K // 2  # E=4 windows are ~4x the work of one clip
    serve_stacks = [s[:sk] for s in stacks]
    float(serve_k(variables, serve_stacks[0], inputs["video_mask"],
                  inputs["sizes"]))  # compile + settle
    start = time.perf_counter()
    ssums = [
        serve_k(variables, serve_stacks[i], inputs["video_mask"],
                inputs["sizes"])
        for i in range(ITERS)
    ]
    checksum += sum(float(x) for x in ssums)
    serve_elapsed = time.perf_counter() - start
    # expression-windows per second: each scan step serves E expressions
    # over one 5-frame window
    exp_windows_per_sec = ITERS * sk * E / serve_elapsed
    # the serial protocol runs E full forwards for the same outputs
    serving_speedup = exp_windows_per_sec / clips_per_sec

    result = {
        "metric": "ytvos_flagship_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s (5x384x640 frames, resnet50+FTF8+IQT)",
        "vs_baseline": round(clips_per_sec / REFERENCE_GPU_CLIPS_PER_SEC, 4),
        # absolute numbers so the headline doesn't rest on the +-40% GPU
        # estimate alone: ms/clip and useful-FLOP MFU vs v5e bf16 peak
        "device_ms": round(device_ms, 2),
        "mfu": round(
            USEFUL_FLOPS_PER_CLIP * clips_per_sec / V5E_BF16_PEAK_FLOPS, 4
        ),
        # serving path: expression-windows/s with backbone reuse +
        # E=4 expression batching, and its speedup over the serial
        # per-expression protocol (which pays one full forward each)
        "serving_exp_windows_per_sec": round(exp_windows_per_sec, 4),
        "serving_speedup_vs_serial": round(serving_speedup, 4),
    }
    # surface the last recorded train-step bench (scripts/bench_train_step.py
    # writes TRAIN_BENCH.json for the deployment bf16+remat config) so the
    # driver-captured JSON carries training perf too; carries its own
    # measured_at stamp — it is NOT re-measured here (a train-step compile
    # is ~12 min through the remote-compile tunnel)
    train_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "TRAIN_BENCH.json")
    if os.path.exists(train_path):
        with open(train_path) as fh:
            result["train"] = json.load(fh)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
