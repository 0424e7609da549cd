"""Box utilities (behavioural parity with reference util/box_ops.py:7-108),
pure jnp, fully batched."""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of [..., N, 4] x [..., M, 4] xyxy boxes -> ([..., N, M], union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) on xyxy boxes."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU of aligned box pairs [..., 4] x [..., 4] -> [...]. (the diag of
    generalized_box_iou, computed without the N×M blowup)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / union
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / area_c


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] binary masks -> [..., 4] xyxy boxes (zeros for empty masks)."""
    h, w = masks.shape[-2], masks.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    m = masks.astype(jnp.float32)
    any_mask = m.sum(axis=(-2, -1)) > 0
    big = jnp.float32(1e8)
    x = m * xs[None, :]
    y = m * ys[:, None]
    x_min = jnp.where(m > 0, x, big).min(axis=(-2, -1))
    y_min = jnp.where(m > 0, y, big).min(axis=(-2, -1))
    x_max = x.max(axis=(-2, -1))
    y_max = y.max(axis=(-2, -1))
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_mask[..., None], boxes, jnp.zeros_like(boxes))


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with the reference's clamping (util/misc.py:555-559)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps)
    x2 = jnp.clip(1.0 - x, eps)
    return jnp.log(x1 / x2)
