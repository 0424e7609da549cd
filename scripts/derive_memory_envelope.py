"""Derive the expression-batching memory envelope from XLA's own buffer
assignment (VERDICT r4 item 7: replace the hard-coded ``40 // win`` bound in
infer.run_video_batch with a memory model).

For a grid of (E expressions, T frames-per-window) serving shapes at the val
resolution (384x640 padded), lowers + compiles the trunk forward
(InferenceEngine._trunk: text-conditioned transformer over precomputed
backbone features, E stacked on the batch axis) and the backbone forward,
and reads ``compile().memory_analysis().peak_memory_in_bytes`` — the
compiler's authoritative peak for the executable. No execution needed, so
no OOM risk; works through the remote-compile tunnel.

Output: one JSON line per point + a least-squares fit
peak ≈ base + slope * (E*T), whose coefficients parameterize
infer.trunk_frame_budget.

Usage: python scripts/derive_memory_envelope.py [--points "e,t e,t ..."]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# air-gapped: skip the HF hub retry storm before the tokenizer fallback
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

H, W = 384, 640


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", default="1,8 1,16 1,40 2,8 2,20 4,8 8,8 2,40 4,20")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax

    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.infer import InferenceEngine
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.text_encoder import tokenize

    cfg = ModelConfig(
        with_box_refine=True, binary=True, f_token=8, qtrans=True,
        msda_impl="pallas", compute_dtype=args.dtype,
    )
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=2, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    engine = InferenceEngine(cfg, variables, size=360, max_size=640)

    points = []
    for tok in args.points.split():
        e, t = (int(x) for x in tok.split(","))
        points.append((e, t))

    rng = np.random.RandomState(0)
    rows = []
    for e, t in points:
        frames = [rng.rand(360, 640, 3).astype(np.float32) for _ in range(t)]
        video, mask, model_size = engine.preprocess(frames)
        sizes = np.asarray([model_size], np.int32)
        ids, attn = tokenize([f"an object number {k}" for k in range(e)])

        bb_lowered = jax.jit(engine._backbone_forward).lower(
            engine.variables, video, mask
        )
        bb_ma = bb_lowered.compile().memory_analysis()
        feats = jax.eval_shape(
            lambda v, vid, m: engine._backbone_forward(v, vid, m),
            engine.variables, video, mask,
        )
        feats = tuple(np.zeros(f.shape, f.dtype) for f in feats)
        tr_lowered = jax.jit(engine._trunk_forward).lower(
            engine.variables, feats, mask, ids, attn, sizes
        )
        tr_ma = tr_lowered.compile().memory_analysis()
        row = {
            "e": e, "t": t, "et": e * t,
            "trunk_peak_gib": round(tr_ma.peak_memory_in_bytes / 2**30, 3),
            "trunk_args_gib": round(tr_ma.argument_size_in_bytes / 2**30, 3),
            "trunk_temp_gib": round(tr_ma.temp_size_in_bytes / 2**30, 3),
            "bb_peak_gib": round(bb_ma.peak_memory_in_bytes / 2**30, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # fit trunk peak = base + slope * (e*t)
    et = np.asarray([r["et"] for r in rows], np.float64)
    pk = np.asarray([r["trunk_peak_gib"] for r in rows], np.float64)
    A = np.stack([np.ones_like(et), et], axis=1)
    coef, *_ = np.linalg.lstsq(A, pk, rcond=None)
    resid = pk - A @ coef
    print(json.dumps({
        "fit": "trunk_peak_gib = base + slope * E*T",
        "base_gib": round(float(coef[0]), 4),
        "slope_gib_per_frame": round(float(coef[1]), 5),
        "max_abs_resid_gib": round(float(np.abs(resid).max()), 4),
    }))


if __name__ == "__main__":
    main()
