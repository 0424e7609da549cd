"""Min-cost instance matcher.

The reference ``HungarianMatcher`` (models/matcher.py:45-240) is, despite its
name, a min-cost *selector*: each clip has exactly one ground-truth instance
track, so matching reduces to picking the best query slot via ``torch.min``
(matcher.py:234-237). The reference loops over batch and frames in Python;
here everything is one batched jnp expression (jit/vmap-able, no host sync).

Cost layout per batch element (parity with matcher.py:141-231):
  * class cost  — focal pos-neg margin at the target class, averaged over
    *valid* frames only;
  * box costs   — L1 + GIoU, averaged over valid frames only;
  * mask costs  — focal + dice over ALL frames (the reference does not mask
    invalid frames here — behaviour preserved);
  * visibility cost (optional) — focal margin over all frames.

Returns the argmin query index per batch element: [b] int32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from tce_rvos_tpu.utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou


def _focal_margin(prob: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0):
    """pos_cost - neg_cost of the focal classification cost
    (matcher.py:154-161)."""
    neg = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    return pos - neg


def _focal_mask_coef(logits, targets, alpha=0.25, gamma=2.0):
    """sigmoid focal coef, mean over the flattened mask (matcher.py:26-42).
    logits/targets broadcast to a common shape; reduces the trailing axes."""
    prob = nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    coef = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        coef = (alpha * targets + (1 - alpha) * (1 - targets)) * coef
    return coef


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    cost_mask: float = 2.0
    cost_dice: float = 5.0
    cost_vis: float = 2.0
    num_classes: int = 1
    use_masks: bool = True
    use_vis: bool = False
    mask_out_stride: int = 4


def match(
    cfg: MatcherConfig,
    pred_logits: jnp.ndarray,   # [b, t, q, K]
    pred_boxes: jnp.ndarray,    # [b, t, q, 4] cxcywh in [0,1]
    pred_masks: jnp.ndarray,    # [b, t, q, h, w] logits (stride-4)
    tgt_labels: jnp.ndarray,    # [b, t] int32
    tgt_boxes: jnp.ndarray,     # [b, t, 4]
    tgt_masks: jnp.ndarray,     # [b, t, H, W] binary, H=4h (padded input size)
    tgt_valid: jnp.ndarray,     # [b, t] {0,1}
    pred_visible: jnp.ndarray | None = None,  # [b, t, q, 1]
) -> jnp.ndarray:
    b, t, q, k = pred_logits.shape
    valid = tgt_valid.astype(jnp.float32)
    n_valid = jnp.maximum(valid.sum(axis=1), 1.0)  # [b]

    cost = jnp.zeros((b, q), jnp.float32)

    # ---- class cost (valid frames only) ----
    prob = nn.sigmoid(pred_logits)  # [b, t, q, K]
    if cfg.num_classes == 1:
        prob_tgt = prob[..., 0]
    else:
        prob_tgt = jnp.take_along_axis(
            prob, tgt_labels[:, :, None, None], axis=-1
        )[..., 0]
    cls = _focal_margin(prob_tgt)  # [b, t, q]
    cls = (cls * valid[:, :, None]).sum(axis=1) / n_valid[:, None]
    any_valid = (valid.sum(axis=1) > 0)[:, None]
    cost = cost + cfg.cost_class * jnp.where(any_valid, cls, 0.0)

    # ---- box costs (valid frames only) ----
    l1 = jnp.abs(pred_boxes - tgt_boxes[:, :, None, :]).sum(-1)  # [b, t, q]
    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes.reshape(b * t, q, 4)),
        box_cxcywh_to_xyxy(tgt_boxes.reshape(b * t, 1, 4)),
    ).reshape(b, t, q)
    box_cost = cfg.cost_bbox * l1 + cfg.cost_giou * (-giou)
    box_cost = (box_cost * valid[:, :, None]).sum(axis=1) / n_valid[:, None]
    cost = cost + jnp.where(any_valid, box_cost, 0.0)

    # ---- visibility cost (all frames) ----
    if cfg.use_vis and pred_visible is not None:
        vis_prob = nn.sigmoid(pred_visible[..., 0])  # [b, t, q]
        cost = cost + cfg.cost_vis * _focal_margin(vis_prob).mean(axis=1)

    # ---- mask costs (all frames — reference behaviour) ----
    if cfg.use_masks:
        s = cfg.mask_out_stride
        start = s // 2
        tm = tgt_masks[:, :, start::s, start::s].astype(pred_masks.dtype)
        # [b, t, h, w] vs pred [b, t, q, h, w]
        focal = _focal_mask_coef(pred_masks, tm[:, :, None])
        focal = focal.transpose(0, 2, 1, 3, 4).reshape(b, q, -1).mean(-1)
        pm = nn.sigmoid(pred_masks).transpose(0, 2, 1, 3, 4).reshape(b, q, -1)
        tmf = tm[:, :, None].reshape(b, 1, -1)
        num = 2.0 * (pm * tmf).sum(-1)
        den = pm.sum(-1) + tmf.sum(-1)
        dice = (num + 1.0) / (den + 1.0)
        cost = cost + cfg.cost_mask * focal + cfg.cost_dice * (-dice)

    return jnp.argmin(cost, axis=1).astype(jnp.int32)  # [b]
