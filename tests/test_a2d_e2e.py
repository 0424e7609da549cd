"""A2D-Sentences end-to-end: synthetic mp4 + h5 fixtures -> dataset ->
collate -> model (valid_indices path) -> postprocess -> mAP/P@K metrics."""

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
    text_encoder_intermediate=64, num_frames=3, dataset_file="a2d",
)


@pytest.fixture(scope="module")
def a2d_root(tmp_path_factory):
    import cv2
    import h5py

    root = tmp_path_factory.mktemp("a2d")
    rng = np.random.RandomState(0)
    vid_dir = root / "Release" / "clips320H"
    ann_dir = root / "text_annotations" / "a2d_annotation_with_instances" / "vidA"
    os.makedirs(vid_dir)
    os.makedirs(ann_dir)

    h, w, t = 64, 64, 6
    writer = cv2.VideoWriter(
        str(vid_dir / "vidA.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
    )
    for _ in range(t):
        writer.write((rng.rand(h, w, 3) * 255).astype(np.uint8))
    writer.release()

    # one annotated frame (frame_idx 3, 1-indexed) with one instance
    mask = np.zeros((h, w), np.uint8)
    mask[20:40, 20:40] = 1
    with h5py.File(ann_dir / "00003.h5", "w") as f:
        f.create_dataset("instance", data=np.array([7]))
        # reference stores reMask transposed (w, h)
        f.create_dataset("reMask", data=mask.T)

    ann = [["the red ball", "vidA", 3, 7]]
    for split in ("train", "test"):
        with open(root / f"a2d_sentences_single_frame_{split}_annotations.json", "w") as fh:
            json.dump(ann, fh)
    return root


def test_a2d_dataset_and_eval_end_to_end(a2d_root):
    from tce_rvos_tpu.config import DataConfig
    from tce_rvos_tpu.data.a2d import A2DSentencesDataset
    from tce_rvos_tpu.data.registry import collate_batch
    from tce_rvos_tpu.data.transforms import make_val_transform
    from tce_rvos_tpu.engine import evaluate_a2d
    from tce_rvos_tpu.models.build import build_model, example_inputs

    cfg = ModelConfig(**TINY)
    ds = A2DSentencesDataset(
        str(a2d_root),
        str(a2d_root / "a2d_sentences_single_frame_test_annotations.json"),
        make_val_transform(size=64, max_size=96),
        num_frames=cfg.num_frames,
        subset="val",
    )
    assert len(ds) == 1
    clip, target = ds[0]
    assert clip.shape[0] == cfg.num_frames
    assert target["valid_indices"].shape == (1,)
    assert target["masks"].shape[0] == 1  # single annotated frame

    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    inputs["valid_indices"] = np.zeros((1,), np.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    fwd = jax.jit(
        lambda v, **kw: {
            k: o
            for k, o in model.apply(v, **kw).items()
            if k in ("pred_logits", "pred_masks")
        }
    )

    loader = [collate_batch([ds[0]])]
    metrics = evaluate_a2d(fwd, variables, loader)
    assert "mAP 0.5:0.95" in metrics and "P@0.5" in metrics
    assert 0.0 <= metrics["mean_iou"] <= 1.0


@pytest.fixture(scope="module")
def a2d_root_rect(tmp_path_factory):
    """48x32 source frames — the val transform's resize is NON-identity, so
    GT and predictions must both be scored at the original resolution."""
    import cv2
    import h5py

    root = tmp_path_factory.mktemp("a2d_rect")
    rng = np.random.RandomState(1)
    vid_dir = root / "Release" / "clips320H"
    ann_dir = root / "text_annotations" / "a2d_annotation_with_instances" / "vidB"
    os.makedirs(vid_dir)
    os.makedirs(ann_dir)

    h, w, t = 48, 32, 6
    writer = cv2.VideoWriter(
        str(vid_dir / "vidB.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
    )
    for _ in range(t):
        writer.write((rng.rand(h, w, 3) * 255).astype(np.uint8))
    writer.release()

    mask = np.zeros((h, w), np.uint8)
    mask[12:24, 8:16] = 1  # area 96 of 1536 -> fraction 1/16
    with h5py.File(ann_dir / "00003.h5", "w") as f:
        f.create_dataset("instance", data=np.array([7]))
        f.create_dataset("reMask", data=mask.T)

    ann = [["the red ball", "vidB", 3, 7]]
    with open(root / "a2d_sentences_single_frame_test_annotations.json", "w") as fh:
        json.dump(ann, fh)
    return root


def test_a2d_eval_scores_at_original_resolution(a2d_root_rect):
    """Scale-consistency regression test (round-1 verdict: GT was encoded
    from the val-RESIZED mask while predictions were resized to the original
    size, so every IoU was computed across two different scales). With an
    all-ones prediction, overall IoU must equal the GT's exact area fraction
    at the ORIGINAL 48x32 resolution: 96/1536 = 1/16."""
    import jax.numpy as jnp

    from tce_rvos_tpu.data.a2d import A2DSentencesDataset
    from tce_rvos_tpu.data.registry import collate_batch
    from tce_rvos_tpu.data.transforms import make_val_transform
    from tce_rvos_tpu.engine import evaluate_a2d

    ds = A2DSentencesDataset(
        str(a2d_root_rect),
        str(a2d_root_rect / "a2d_sentences_single_frame_test_annotations.json"),
        make_val_transform(size=64, max_size=96),  # 48x32 -> 96x64
        num_frames=3,
        subset="val",
    )
    batch = collate_batch([ds[0]])
    assert batch["orig_masks"][0].shape == (1, 48, 32)
    hp, wp = batch["video"].shape[2:4]
    assert (hp, wp) != (48, 32)  # resize really is non-identity

    def fake_fwd(variables, **kw):
        # every query predicts an all-ones mask with certainty
        b, t = 1, 1
        q = 2
        return {
            "pred_logits": jnp.full((b, t, q, 1), 20.0),
            "pred_masks": jnp.full((b, t, q, hp // 4, wp // 4), 20.0),
        }

    metrics = evaluate_a2d(fake_fwd, None, [batch])
    assert abs(metrics["overall_iou"] - 96.0 / 1536.0) < 1e-6, metrics
