"""RefCOCO/+/g pretraining evaluation: Precision@{1,5,10} at IoU>=0.5
(parity with reference datasets/refexp_eval.py:13-85)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tce_rvos_tpu.utils.boxes import box_iou


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] x [M,4] -> [N,M] IoU, numpy."""
    import jax.numpy as jnp

    return np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))[0])


class RefExpEvaluator:
    def __init__(self, gt_boxes_by_image: Dict, k: tuple = (1, 5, 10),
                 thresh_iou: float = 0.5):
        """gt_boxes_by_image: image_id -> [n_gt, 4] xyxy arrays."""
        self.gt = gt_boxes_by_image
        self.k = k
        self.thresh_iou = thresh_iou
        self.predictions: Dict = {}

    def update(self, predictions: Dict):
        """predictions: image_id -> {'scores': [n], 'boxes': [n, 4]}."""
        self.predictions.update(predictions)

    def summarize(self) -> Dict[str, float]:
        hits = {k: 0 for k in self.k}
        total = 0
        for image_id, gt in self.gt.items():
            pred = self.predictions.get(image_id)
            if pred is None:
                total += 1
                continue
            order = np.argsort(-np.asarray(pred["scores"]))
            boxes = np.asarray(pred["boxes"])[order]
            iou = _iou_xyxy(boxes, np.asarray(gt).reshape(-1, 4))
            best_per_rank = iou.max(axis=1)
            for k in self.k:
                if (best_per_rank[:k] >= self.thresh_iou).any():
                    hits[k] += 1
            total += 1
        results = {f"P@{k}": hits[k] / max(total, 1) for k in self.k}
        print(f"RefExp precision: {results}")
        return results
