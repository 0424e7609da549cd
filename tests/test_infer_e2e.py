"""End-to-end inference protocol tests: synthetic dataset on disk -> model
-> protocol driver -> saved PNGs -> offline evaluator. Drives the flagship
product flow (infer.py + eval/davis_eval.py) with a tiny random model."""

import json
import os

import numpy as np
import pytest

import jax

from tce_rvos_tpu.config import ModelConfig


pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

TINY = dict(
    enc_layers=1, dec_layers=2, dim_feedforward=32, binary=True,
    text_encoder_layers=1, text_encoder_hidden=32, text_encoder_heads=2,
    text_encoder_intermediate=64, num_frames=3,
)


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    """Synthetic Ref-DAVIS17: inference layout (meta_expressions + JPEG
    frames) AND evaluation layout (ImageSets + Annotations_unsupervised)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("davis")
    rng = np.random.RandomState(0)
    video = "goat"
    frames = [f"{i:05d}" for i in range(4)]
    os.makedirs(root / "valid" / "JPEGImages" / video)
    os.makedirs(root / "Annotations_unsupervised" / "480p" / video)
    os.makedirs(root / "ImageSets" / "2017")
    for f in frames:
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "valid" / "JPEGImages" / video / f"{f}.jpg")
        gt = np.zeros((64, 64), np.uint8)
        gt[16:48, 16:48] = 1
        g = Image.fromarray(gt, mode="P")
        g.putpalette([0, 0, 0, 255, 0, 0] + [0] * 750)
        g.save(root / "Annotations_unsupervised" / "480p" / video / f"{f}.png")
    with open(root / "ImageSets" / "2017" / "val.txt", "w") as fh:
        fh.write(video + "\n")
    meta = {
        "videos": {
            video: {
                "frames": frames,
                "expressions": {
                    str(i): {"exp": "the goat on the rock"} for i in range(4)
                },
            }
        }
    }
    os.makedirs(root / "meta_expressions" / "valid")
    with open(root / "meta_expressions" / "valid" / "meta_expressions.json", "w") as fh:
        json.dump(meta, fh)
    return root


def test_davis_protocol_end_to_end(davis_root, tmp_path):
    """run_davis -> 4 annotator dirs of palette PNGs -> evaluate_davis."""
    from tce_rvos_tpu.infer import InferenceEngine, run_davis
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.eval.davis_eval import evaluate_davis

    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    engine = InferenceEngine(cfg, variables, size=64, max_size=96, window=4)
    out_dir = str(tmp_path / "out")
    run_davis(engine, str(davis_root), out_dir, split="valid")

    # 4 annotator dirs with one PNG per frame
    for anno in range(4):
        d = os.path.join(out_dir, "valid", f"anno_{anno}", "goat")
        assert sorted(os.listdir(d)) == [f"{i:05d}.png" for i in range(4)]

    res = evaluate_davis(
        str(davis_root), os.path.join(out_dir, "valid", "anno_0"), subset="val"
    )
    s = res["summary"]
    # random model: metrics exist and are valid numbers in [0, 1]
    for k in ("J&F-Mean", "J-Mean", "F-Mean"):
        assert 0.0 <= s[k] <= 1.0, (k, s)


def test_ytvos_protocol_end_to_end(davis_root, tmp_path):
    """run_ytvos on the same layout (ytvos shares it) -> binary PNGs per
    expression; whole-video and windowed protocols both run."""
    from PIL import Image

    from tce_rvos_tpu.infer import InferenceEngine, run_ytvos
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    engine = InferenceEngine(cfg, variables, size=64, max_size=96, window=4)
    out_dir = str(tmp_path / "out_ytvos")
    run_ytvos(engine, str(davis_root), out_dir, split="valid", whole_video=True,
              visualize=True)
    d = os.path.join(out_dir, "valid", "goat", "0")
    files = sorted(os.listdir(d))
    assert files == [f"{i:05d}.png" for i in range(4)]
    m = np.array(Image.open(os.path.join(d, files[0])))
    assert m.shape == (64, 64)
    assert set(np.unique(m)).issubset({0, 255})
    # --visualize consumer (reference inference_ytvos.py:318-363): RGB
    # overlays with sampling points for every frame
    vd = os.path.join(out_dir, "valid_vis", "goat", "0")
    assert sorted(os.listdir(vd)) == files
    overlay = np.array(Image.open(os.path.join(vd, files[0])))
    assert overlay.shape == (64, 64, 3)


@pytest.fixture(scope="module")
def ytvos_two_videos(tmp_path_factory):
    """Two-video ytvos layout for the device fan-out test."""
    import json as _json

    from PIL import Image

    root = tmp_path_factory.mktemp("ytvos2")
    rng = np.random.RandomState(7)
    videos = {}
    for video in ("goat", "lion"):
        frames = [f"{i:05d}" for i in range(3)]
        os.makedirs(root / "valid" / "JPEGImages" / video)
        for f in frames:
            img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "valid" / "JPEGImages" / video / f"{f}.jpg"
            )
        videos[video] = {
            "frames": frames,
            "expressions": {"0": {"exp": f"the {video} moving"}},
        }
    os.makedirs(root / "meta_expressions" / "valid")
    with open(root / "meta_expressions" / "valid" / "meta_expressions.json", "w") as fh:
        _json.dump({"videos": videos}, fh)
    return root


def test_ytvos_device_fanout_matches_serial(ytvos_two_videos, tmp_path):
    """make_engines(num_devices=2) on the virtual CPU mesh must produce
    bit-identical PNGs to the serial single-engine run (round-1 verdict
    item: the per-device video fan-out replacing the reference's
    mp.Process-per-GPU sharding, inference_ytvos.py:88-113)."""
    from PIL import Image

    from tce_rvos_tpu.infer import InferenceEngine, make_engines, run_ytvos
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    serial_dir = str(tmp_path / "serial")
    engine = InferenceEngine(cfg, variables, size=64, max_size=96, window=4)
    run_ytvos(engine, str(ytvos_two_videos), serial_dir, split="valid")

    fan_dir = str(tmp_path / "fanout")
    engines = make_engines(
        cfg, variables, num_devices=2, size=64, max_size=96, window=4
    )
    assert len(engines) == 2
    assert engines[0].device != engines[1].device
    run_ytvos(engines, str(ytvos_two_videos), fan_dir, split="valid")

    for video in ("goat", "lion"):
        for f in ("00000", "00001", "00002"):
            a = np.array(Image.open(os.path.join(serial_dir, "valid", video, "0", f + ".png")))
            b = np.array(Image.open(os.path.join(fan_dir, "valid", video, "0", f + ".png")))
            assert np.array_equal(a, b), (video, f)


def test_long_expression_not_truncated(tmp_path):
    """Expressions longer than the old 24-token cap must reach the model
    in full (reference pads to longest and never truncates —
    models/tce_rvos.py:408). Guards against reintroducing a silent
    ``max_len`` in the inference tokenization path."""
    from tce_rvos_tpu.infer import InferenceEngine
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.text_encoder import tokenize, EOS_TOKEN_ID

    caption = (
        "the small spotted goat that stands on the very large grey rock "
        "next to the three trees while two birds fly above the river bank"
    )
    ids, attn = tokenize([caption])
    n_tok = int(attn.sum())
    assert n_tok > 24  # would have been cut by the old cap
    assert ids[0, n_tok - 1] == EOS_TOKEN_ID  # EOS survived

    cfg = ModelConfig(**TINY)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
              for _ in range(cfg.num_frames)]
    engine = InferenceEngine(cfg, variables, size=32, max_size=48,
                             window=cfg.num_frames)
    out = engine.run_video(frames, caption)

    # manual forward with the full-length (untruncated) tokens must agree
    video, mask, model_size = engine.preprocess(frames)
    ref = engine.run_window(video, mask, ids, attn, model_size)
    np.testing.assert_allclose(
        out["pred_masks"], np.asarray(ref["pred_masks"])[0], rtol=0, atol=0
    )


def test_expression_batched_matches_serial(tmp_path):
    """Serving path (VERDICT r3 item 1): run_video_batch computes the
    backbone ONCE per window and batches the expressions on the trunk's
    batch axis — per-expression outputs must match the serial run_video
    path (binarized masks identical, floats at f32 reduction-noise scale).
    Includes a padded tail chunk (3 expressions, exp_batch=4) and mixed
    caption lengths spanning two tokenizer buckets."""
    from tce_rvos_tpu.infer import InferenceEngine
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(**TINY, f_token=2, qtrans=True, with_box_refine=True)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(32, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)

    rng = np.random.RandomState(1)
    frames = [
        rng.randint(0, 255, (32, 48, 3), np.uint8).astype(np.float32) / 255.0
        for _ in range(5)
    ]
    engine = InferenceEngine(cfg, variables, size=32, max_size=48,
                             window=cfg.num_frames)
    caps = [
        "the red ball",
        "a running dog on the grass next to the small tree",
        "the red ball again",
    ]
    serial = [engine.run_video(frames, c) for c in caps]
    batched = engine.run_video_batch(frames, caps, exp_batch=4)
    assert len(batched) == 3
    for s, b in zip(serial, batched):
        assert np.array_equal(s["pred_masks"] > 0, b["pred_masks"] > 0)
        np.testing.assert_allclose(b["pred_masks"], s["pred_masks"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(b["pred_logits"], s["pred_logits"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(b["pred_boxes"], s["pred_boxes"],
                                   rtol=1e-5, atol=1e-5)
        assert s["inter_samples"].shape == b["inter_samples"].shape
