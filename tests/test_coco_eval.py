"""CocoEvaluator protocol tests — analytically-known AP/AR scenarios
(the sandbox has no pycocotools to cross-check against, so every case is
hand-derivable from the COCO matching rules)."""

import numpy as np

from tce_rvos_tpu.eval.coco_eval import CocoEvaluator, box_iou_xyxy
from tce_rvos_tpu.utils import rle as rle_util


def gt_ann(x, y, w, h, crowd=0):
    return {"bbox": [x, y, w, h], "area": w * h, "iscrowd": crowd}


def pred(boxes, scores):
    return {
        "scores": np.asarray(scores, np.float64),
        "boxes": np.asarray(boxes, np.float64),
        "labels": np.ones(len(scores), np.int64),
    }


def test_box_iou_crowd_denominator():
    dets = np.array([[0.0, 0.0, 10.0, 10.0]])
    gts = np.array([[0.0, 0.0, 20.0, 20.0]])
    plain = box_iou_xyxy(dets, gts, np.array([False]))
    crowd = box_iou_xyxy(dets, gts, np.array([True]))
    assert np.isclose(plain[0, 0], 100.0 / 400.0)
    assert np.isclose(crowd[0, 0], 1.0)  # fully inside the crowd region


def test_perfect_detections_ap_one():
    gt = {1: [gt_ann(0, 0, 100, 100)], 2: [gt_ann(10, 10, 150, 80)]}
    ev = CocoEvaluator(gt)
    ev.update({1: pred([[0, 0, 100, 100]], [0.9])})
    ev.update({2: pred([[10, 10, 160, 90]], [0.8])})
    s = ev.summarize()["bbox"]
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0
    assert s["AR@100"] == 1.0


def test_iou_06_matches_three_thresholds():
    # det covers 60% of the gt exactly: TP at thr 0.50/0.55/0.60 only
    gt = {1: [gt_ann(0, 0, 100, 100)]}
    ev = CocoEvaluator(gt)
    ev.update({1: pred([[0, 0, 100, 60]], [0.9])})
    s = ev.summarize()["bbox"]
    assert np.isclose(s["AP50"], 1.0)
    assert np.isclose(s["AP75"], 0.0)
    assert np.isclose(s["AP"], 3.0 / 10.0)


def test_high_scoring_fp_halves_ap():
    gt = {1: [gt_ann(0, 0, 100, 100)]}
    ev = CocoEvaluator(gt)
    # rank-1 detection misses, rank-2 is perfect -> precision 0.5 at recall 1
    ev.update({1: pred([[500, 500, 600, 600], [0, 0, 100, 100]], [0.9, 0.8])})
    s = ev.summarize()["bbox"]
    assert np.isclose(s["AP50"], 0.5)


def test_crowd_match_is_ignored_not_fp():
    gt = {
        1: [gt_ann(0, 0, 200, 200, crowd=1)],
        2: [gt_ann(0, 0, 100, 100)],
    }
    ev = CocoEvaluator(gt)
    # highest-scoring det lands inside the crowd region: must be ignored,
    # so the perfect det on image 2 still yields AP 1.0
    ev.update({1: pred([[50, 50, 100, 100]], [0.95])})
    ev.update({2: pred([[0, 0, 100, 100]], [0.9])})
    s = ev.summarize()["bbox"]
    assert s["AP"] == 1.0


def test_area_ranges():
    gt = {1: [gt_ann(0, 0, 16, 16)]}  # area 256 < 32^2 -> small
    ev = CocoEvaluator(gt)
    ev.update({1: pred([[0, 0, 16, 16]], [0.9])})
    s = ev.summarize()["bbox"]
    assert s["AP_small"] == 1.0
    assert s["AP_large"] == -1.0  # no large GT -> undefined
    assert s["AP"] == 1.0


def test_ar_at_1_vs_10():
    gt = {1: [gt_ann(0, 0, 100, 100)]}
    ev = CocoEvaluator(gt)
    # top-1 det is an FP; the match only exists within the top-10
    ev.update({1: pred([[500, 500, 600, 600], [0, 0, 100, 100]], [0.9, 0.8])})
    s = ev.summarize()["bbox"]
    assert s["AR@1"] == 0.0
    assert s["AR@10"] == 1.0


def test_segm_iou_type():
    gm = np.zeros((64, 64), np.uint8)
    gm[8:40, 8:40] = 1
    gt = {
        1: [
            {
                "bbox": [8, 8, 32, 32],
                "area": int(gm.sum()),
                "iscrowd": 0,
                "segmentation": rle_util.encode(gm),
            }
        ]
    }
    ev = CocoEvaluator(gt, iou_types=("bbox", "segm"))
    ev.update(
        {
            1: {
                "scores": np.array([0.9]),
                "boxes": np.array([[8.0, 8.0, 40.0, 40.0]]),
                "masks": gm[None, None],
            }
        }
    )
    s = ev.summarize()
    assert s["segm"]["AP"] == 1.0
    assert s["bbox"]["AP"] == 1.0
    stats = ev.stats("segm")
    assert len(stats) == 12 and stats[0] == 1.0


def test_duplicate_update_ignored():
    gt = {1: [gt_ann(0, 0, 100, 100)]}
    ev = CocoEvaluator(gt)
    p = {1: pred([[0, 0, 100, 100]], [0.9])}
    ev.update(p)
    ev.update(p)  # same image again (e.g. re-fed shard) — must not double-count
    assert len(ev._per_image["bbox"]) == 1
