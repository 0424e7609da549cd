"""RefCOCO-pretrain eval end to end: synthetic COCO-format refexp json ->
build_refexp val dataset -> collate -> tiny model -> evaluate_coco_pretrain
-> P@K + class-agnostic COCO box mAP stats (reference main.py:150-176 with
RefExpEvaluator + CocoEvaluator)."""

import json
import os

import numpy as np
import pytest

import jax

from tce_rvos_tpu.config import DataConfig, ModelConfig
from tce_rvos_tpu.data.refexp import build_refexp
from tce_rvos_tpu.data.registry import collate_batch
from tce_rvos_tpu.engine import evaluate_coco_pretrain
from tce_rvos_tpu.models.build import build_model



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "train2014"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        name = f"img_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (64, 96, 3), np.uint8)
        ).save(img_dir / name)
        images.append(
            {
                "id": i + 1,
                "file_name": name,
                "height": 64,
                "width": 96,
                "caption": f"the thing number {i}",
            }
        )
        x, y, w, h = 10 + 8 * i, 12, 30, 24
        annotations.append(
            {
                "id": i + 1,
                "image_id": i + 1,
                "bbox": [x, y, w, h],
                "area": w * h,
                "iscrowd": 0,
                "category_id": 1,
                "segmentation": [[x, y, x + w, y, x + w, y + h, x, y + h]],
            }
        )
    ann = {"images": images, "annotations": annotations, "categories": []}
    with open(root / "instances_refcoco_val.json", "w") as fh:
        json.dump(ann, fh)
    return str(root)


def test_refexp_eval_end_to_end(coco_root):
    model_cfg = ModelConfig(
        enc_layers=1, dec_layers=1, dim_feedforward=32, binary=True,
        num_frames=1, text_encoder_layers=1, text_encoder_hidden=32,
        text_encoder_heads=2, text_encoder_intermediate=64,
    )
    data_cfg = DataConfig(coco_path=coco_root, max_size=128)
    ds = build_refexp("refcoco", "val", data_cfg, model_cfg)
    assert len(ds) == 2

    gt_boxes = ds.gt_boxes_by_image()
    assert set(gt_boxes) == {1, 2} and gt_boxes[1].shape == (1, 4)
    coco_gt = ds.coco_gt_by_image()
    assert coco_gt[2][0]["area"] == 30 * 24

    model = build_model(model_cfg)
    batch0 = collate_batch([ds[0]])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        video=batch0["video"], video_mask=batch0["video_mask"],
        text_ids=batch0["text_ids"], text_attn_mask=batch0["text_attn_mask"],
        sizes=batch0["sizes"],
    )
    fwd = jax.jit(lambda v, **kw: model.apply(v, **kw))

    loader = [collate_batch([ds[i]]) for i in range(2)]
    stats = evaluate_coco_pretrain(
        fwd, variables, iter(loader), gt_boxes, coco_gt
    )
    assert "P@1" in stats and 0.0 <= stats["P@1"] <= 1.0
    assert len(stats["coco_eval_bbox"]) == 12
    ap = stats["coco_eval_bbox"][0]
    assert ap == -1.0 or 0.0 <= ap <= 1.0

    # segm path (reference engine.py:126-128,154-157: PostProcessSegm +
    # coco_eval_masks when args.masks): GT segmentation RLEs come from
    # coco_gt_by_image's polygon rasterization
    assert "segmentation" in coco_gt[1][0]
    loader = [collate_batch([ds[i]]) for i in range(2)]
    stats_m = evaluate_coco_pretrain(
        fwd, variables, iter(loader), gt_boxes, coco_gt, masks=True
    )
    assert len(stats_m["coco_eval_masks"]) == 12
    ap_m = stats_m["coco_eval_masks"][0]
    assert ap_m == -1.0 or 0.0 <= ap_m <= 1.0
