"""Protocol-level serving throughput: seconds/video for the ytvos and davis
inference protocols, serial-per-expression vs the batched serving path.

The reference protocols re-run the FULL model once per (expression x window)
over identical frames (inference_ytvos.py:186,294; inference_davis.py:184-295
— x4 annotators), although the backbone is text-independent (fusion enters
after input_proj, models/tce_rvos.py:258-307). The serving path
(infer.InferenceEngine.run_video_batch) computes the backbone once per window
and stacks the expressions on the trunk's batch axis; this script measures
what that is worth at protocol level on the real chip.

Synthetic videos (random frames at the val resolution) — IO/decode excluded,
preprocess (cv2 resize + normalize + pad) included, PNG encoding excluded.

Usage: python scripts/bench_protocol.py [ytvos|davis|both] [--exps E ...]
Prints one JSON line per (protocol, n_expressions) with seconds/video for
both paths and the projected split wall-clock.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")  # repo root (bench.py-style invocation)

# air-gapped: skip the HF hub retry storm before the tokenizer fallback
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np

# Ref-YouTube-VOS valid: 202 videos, ~70 frames, ~10 expressions/video
# (2 meta expressions x ~5 by the 2-annotator layout; the exact count varies
# per video — the per-E rows below let any density be projected).
YTVOS_VIDEOS = 202
YTVOS_FRAMES = 70
# Ref-DAVIS17 val: 30 videos, ~67 frames, 4 annotators x ~2 objects
DAVIS_VIDEOS = 30
DAVIS_FRAMES = 67


def make_engine(window: int):
    import jax

    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.infer import InferenceEngine
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(
        with_box_refine=True, binary=True, f_token=8, qtrans=True,
        msda_impl="pallas", compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    return InferenceEngine(cfg, variables, size=360, max_size=640,
                           window=window)


def bench_video(engine, n_frames: int, n_exps: int, exp_batch: int,
                reps: int = 2, whole_video: bool = False):
    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 255, (360, 640, 3), np.uint8).astype(np.float32) / 255.0
        for _ in range(n_frames)
    ]
    caps = [f"the object number {i} moving around the scene"
            for i in range(n_exps)]

    # warmup both paths (compiles)
    engine.run_video(frames, caps[0], whole_video=whole_video)
    engine.run_video_batch(frames, caps, exp_batch=exp_batch,
                           whole_video=whole_video)

    t0 = time.time()
    for _ in range(reps):
        for c in caps:
            engine.run_video(frames, c, whole_video=whole_video)
    serial_s = (time.time() - t0) / reps

    t0 = time.time()
    for _ in range(reps):
        engine.run_video_batch(frames, caps, exp_batch=exp_batch,
                               whole_video=whole_video)
    batched_s = (time.time() - t0) / reps
    return serial_s, batched_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("protocol", nargs="?", default="both",
                   choices=["ytvos", "davis", "both"])
    p.add_argument("--exps", type=int, nargs="*", default=[2, 4, 8])
    p.add_argument("--exp_batch", type=int, default=8)
    p.add_argument("--window", type=int, default=0,
                   help="frames per window (0 = num_frames for ytvos, "
                        "num_frames for davis too — the reference's 32 was "
                        "a CUDA constraint)")
    p.add_argument("--whole_video", action="store_true",
                   help="bench the default ytvos protocol (the whole video "
                        "in ONE forward, T padded to the bucket) instead of "
                        "the windowed keep_fps protocol")
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args()

    jobs = []
    if args.protocol in ("ytvos", "both"):
        jobs.append(("ytvos", YTVOS_FRAMES, YTVOS_VIDEOS))
    if args.protocol in ("davis", "both"):
        jobs.append(("davis", DAVIS_FRAMES, DAVIS_VIDEOS))

    engine = make_engine(args.window or None)
    for name, n_frames, n_videos in jobs:
        for n_exps in args.exps:
            serial_s, batched_s = bench_video(
                engine, n_frames, n_exps, args.exp_batch,
                reps=args.reps, whole_video=args.whole_video,
            )
            print(json.dumps({
                "metric": f"{name}_protocol_video_sec",
                "mode": "whole_video" if args.whole_video else
                        f"windowed_{engine.window}",
                "n_frames": n_frames,
                "n_expressions": n_exps,
                "serial_s_per_video": round(serial_s, 3),
                "batched_s_per_video": round(batched_s, 3),
                "speedup": round(serial_s / batched_s, 3),
                "projected_split_min_batched": round(
                    batched_s * n_videos / 60.0, 2),
                "projected_split_min_serial": round(
                    serial_s * n_videos / 60.0, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
