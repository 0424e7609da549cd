"""Whole-video realism check (BASELINE.md): run the ytvos whole-video
protocol at a realistic length — T≈36 sampled frames at the val resolution
(360 short side -> 384x640 padded) — on one real chip, and report
per-frame latency, peak device memory, and the compile-bucket count.

The reference's default ytvos protocol feeds the ENTIRE video as one batch
(inference_ytvos.py:280-295); FTF/IQT attend across all T frames, so T=40
is a much bigger program than the 5-frame training clip. This script is
the memory-headroom proof for that mode on a 16G v5e chip.

Usage: python scripts/whole_video_check.py [T]
"""

import sys
import time

import jax
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 36
H, W = 360, 640


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.infer import InferenceEngine
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8,
                      qtrans=True, msda_impl="pallas",
                      compute_dtype="bfloat16")
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(64, 64), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    engine = InferenceEngine(cfg, variables, size=360, max_size=640)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(T)]

    t0 = time.perf_counter()
    out = engine.run_video(frames, "the runner on the left", whole_video=True)
    compile_s = time.perf_counter() - t0
    assert out["pred_masks"].shape[0] == T, out["pred_masks"].shape

    t0 = time.perf_counter()
    out = engine.run_video(frames, "the runner on the left", whole_video=True)
    steady = time.perf_counter() - t0

    mem_line = "n/a"
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem_line = (
                f"peak {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB / "
                f"limit {stats.get('bytes_limit', 0)/2**30:.2f} GiB"
            )
    except Exception as e:  # tunnel backends may not expose memory_stats
        mem_line = f"unavailable ({e})"

    print(
        f"whole-video T={T} ({H}x{W}): first(+compile) {compile_s:.1f}s, "
        f"steady {steady:.2f}s = {steady/T*1e3:.1f} ms/frame; memory: {mem_line}"
    )


if __name__ == "__main__":
    main()
