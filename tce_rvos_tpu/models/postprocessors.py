"""Postprocessors (parity with reference models/postprocessors.py).

Split into a jit-able device part (upsample/sigmoid/threshold/topk) and a
host part (un-pad, resize to original size, RLE encode) — the reference does
everything on device then syncs per-mask; here one device->host transfer
moves the final binarized stack.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tce_rvos_tpu.utils import rle as rle_util
from tce_rvos_tpu.utils.boxes import box_cxcywh_to_xyxy
from tce_rvos_tpu.utils.interpolate import resize_bilinear, resize_nearest


def a2d_device_postprocess(outputs: Dict) -> Dict:
    """Device half of A2DSentencesPostProcess (reference :22-41): take the
    single annotated frame, sigmoid scores, upsample masks 4x, binarize."""
    out_logits = outputs["pred_logits"][:, 0, :, 0]       # [B, N]
    out_masks = outputs["pred_masks"][:, 0]               # [B, N, h, w]
    scores = nn.sigmoid(out_logits)
    h, w = out_masks.shape[-2:]
    masks = resize_bilinear(
        out_masks[..., None], (h * 4, w * 4), align_corners=False
    )[..., 0]
    return {"scores": scores, "masks": nn.sigmoid(masks) > 0.5}


def a2d_host_postprocess(
    device_out: Dict,
    resized_sizes: List,   # per-sample (h, w) before padding
    orig_sizes: List,      # per-sample (H, W) original dataset size
) -> List[Dict]:
    """Host half (reference :43-54): un-pad, nearest-resize to original size,
    RLE-encode every query's mask."""
    scores = np.asarray(device_out["scores"])
    masks = np.asarray(device_out["masks"])
    preds = []
    for i, (rs, os_) in enumerate(zip(resized_sizes, orig_sizes)):
        mh, mw = int(rs[0]), int(rs[1])
        m = masks[i][:, :mh, :mw]  # [N, mh, mw]
        m = np.asarray(
            resize_nearest(
                jnp.asarray(m[..., None], jnp.float32), (int(os_[0]), int(os_[1]))
            )[..., 0]
        )
        rles = [rle_util.encode((mi > 0.5).astype(np.uint8)) for mi in m]
        preds.append(
            {"scores": scores[i], "masks": m > 0.5, "rle_masks": rles}
        )
    return preds


def coco_postprocess_bbox(outputs: Dict, target_sizes: np.ndarray) -> List[Dict]:
    """PostProcess for COCO pretraining (reference :58-100): flatten (t, q),
    top-k by score, scale boxes to absolute coords, labels forced binary."""
    logits = np.asarray(outputs["pred_logits"])
    boxes = np.asarray(outputs["pred_boxes"])
    b = logits.shape[0]
    logits = logits.reshape(b, -1, logits.shape[-1])
    boxes = boxes.reshape(b, -1, 4)
    num_queries = logits.shape[1]
    prob = 1.0 / (1.0 + np.exp(-logits))
    flat = prob.reshape(b, -1)
    topk = np.argsort(-flat, axis=1)[:, :num_queries]
    scores = np.take_along_axis(flat, topk, axis=1)
    topk_boxes = topk // logits.shape[2]
    labels = topk % logits.shape[2]
    xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(boxes)))
    xyxy = np.take_along_axis(xyxy, topk_boxes[..., None].repeat(4, -1), axis=1)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = np.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    xyxy = xyxy * scale
    return [
        {"scores": s, "labels": np.ones_like(l), "boxes": bx}
        for s, l, bx in zip(scores, labels, xyxy)
    ]


def coco_postprocess_segm(
    results: List[Dict],
    outputs: Dict,
    orig_target_sizes: np.ndarray,
    max_target_sizes: np.ndarray,
    threshold: float = 0.5,
) -> List[Dict]:
    """PostProcessSegm (reference :103-154)."""
    logits = np.asarray(outputs["pred_logits"])
    masks = np.asarray(outputs["pred_masks"])
    b = logits.shape[0]
    logits = logits.reshape(b, -1, logits.shape[-1])
    masks = masks.reshape(b, -1, masks.shape[-2], masks.shape[-1])
    num_queries = logits.shape[1]
    prob = 1.0 / (1.0 + np.exp(-logits))
    flat = prob.reshape(b, -1)
    topk = np.argsort(-flat, axis=1)[:, :num_queries]
    topk_boxes = topk // logits.shape[2]
    sel = np.take_along_axis(
        masks, topk_boxes[..., None, None], axis=1
    )
    h, w = sel.shape[-2:]
    up = np.asarray(
        resize_bilinear(
            jnp.asarray(sel.transpose(0, 2, 3, 1), jnp.float32), (h * 4, w * 4)
        )
    ).transpose(0, 3, 1, 2)
    up = 1.0 / (1.0 + np.exp(-up)) > threshold
    for i, (t, tt) in enumerate(zip(max_target_sizes, orig_target_sizes)):
        ih, iw = int(t[0]), int(t[1])
        cur = up[i][:, :ih, :iw]
        cur = np.asarray(
            resize_nearest(
                jnp.asarray(cur[..., None], jnp.float32), (int(tt[0]), int(tt[1]))
            )[..., 0]
        ).astype(np.uint8)
        results[i]["masks"] = cur[:, None]
    return results
