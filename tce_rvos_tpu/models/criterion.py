"""Set criterion — focal class loss, L1+GIoU box loss, focal+dice mask loss,
optional visibility loss, with per-decoder-layer aux losses.

Behavioural parity with reference models/criterion.py:14-262, vectorized:
no per-batch python loops, no host round-trips; the valid-frame index
arithmetic of loss_labels (criterion.py:60-64) becomes a boolean scatter.

Distributed note: the reference all-reduces num_boxes across ranks
(criterion.py:230-237). Under global-batch jit semantics the sum over the
sharded batch axis *is* the global sum — XLA inserts the psum — so the same
normalization falls out with no explicit collective.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from tce_rvos_tpu.models.matcher import MatcherConfig, match
from tce_rvos_tpu.models.segmentation import dice_loss, sigmoid_focal_loss
from tce_rvos_tpu.utils.boxes import box_cxcywh_to_xyxy, elementwise_giou


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 1
    focal_alpha: float = 0.25
    mask_out_stride: int = 4
    use_masks: bool = True
    use_vis: bool = False
    # loss weights (weight_dict in reference build(), tce_rvos.py:687-701)
    cls_coef: float = 2.0
    bbox_coef: float = 5.0
    giou_coef: float = 2.0
    mask_coef: float = 2.0
    dice_coef: float = 5.0
    vis_coef: float = 2.0
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)


def _one_layer_losses(
    cfg: CriterionConfig,
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    logits = outputs["pred_logits"]  # [b, t, q, K]
    boxes = outputs["pred_boxes"]
    masks = outputs["pred_masks"]
    b, t, q, k = logits.shape

    best_q = match(
        cfg.matcher,
        logits,
        boxes,
        masks,
        targets["labels"],
        targets["boxes"],
        targets["masks"],
        targets["valid"],
        outputs.get("pred_visible"),
    )  # [b]

    valid = targets["valid"].astype(bool)  # [b, t]
    losses: Dict[str, jnp.ndarray] = {}

    # ---- class loss (criterion.py:41-95) ----
    # target class map over the flattened (t, q) axis: matched query on valid
    # frames gets the target label (0 for binary), everything else no-object
    qa = jnp.arange(q)[None, None, :]
    is_matched = (qa == best_q[:, None, None]) & valid[:, :, None]  # [b, t, q]
    if cfg.num_classes == 1:
        tgt_cls = jnp.where(is_matched, 0, cfg.num_classes)
    else:
        tgt_cls = jnp.where(
            is_matched, targets["labels"][:, :, None], cfg.num_classes
        )
    onehot = nn.one_hot(tgt_cls, k + 1)[..., :-1]  # [b, t, q, K]
    loss_ce = (
        sigmoid_focal_loss(
            logits.reshape(b, t * q, k),
            onehot.reshape(b, t * q, k),
            num_boxes,
            alpha=cfg.focal_alpha,
        )
        * (t * q)
    )
    losses["loss_ce"] = cfg.cls_coef * loss_ce

    # ---- visibility loss (criterion.py:97-123) ----
    if cfg.use_vis and "pred_visible" in outputs:
        vis = outputs["pred_visible"]  # [b, t, q, 1]
        vis_matched = jnp.take_along_axis(
            vis, best_q[:, None, None, None], axis=2
        )[:, :, 0, :]  # [b, t, 1]
        tgt_vis = valid.astype(vis.dtype)[..., None]
        loss_vis = (
            sigmoid_focal_loss(vis_matched, tgt_vis, float(t), alpha=cfg.focal_alpha)
            * (t * q)
        )
        losses["loss_vis"] = cfg.vis_coef * loss_vis

    # ---- box losses (criterion.py:126-153; all frames, like the reference) ----
    src_boxes = jnp.take_along_axis(
        boxes, best_q[:, None, None, None], axis=2
    )[:, :, 0, :].reshape(b * t, 4)
    tgt_boxes = targets["boxes"].reshape(b * t, 4)
    losses["loss_bbox"] = cfg.bbox_coef * (
        jnp.abs(src_boxes - tgt_boxes).sum() / num_boxes
    )
    giou = elementwise_giou(
        box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    losses["loss_giou"] = cfg.giou_coef * ((1.0 - giou).sum() / num_boxes)

    # ---- mask losses (criterion.py:156-192) ----
    if cfg.use_masks:
        s = cfg.mask_out_stride
        start = s // 2
        tm = targets["masks"][:, :, start::s, start::s].astype(masks.dtype)
        src_masks = jnp.take_along_axis(
            masks, best_q[:, None, None, None, None], axis=2
        )[:, :, 0]  # [b, t, h, w]
        src_flat = src_masks.reshape(b, -1)
        tgt_flat = tm.reshape(b, -1)
        losses["loss_mask"] = cfg.mask_coef * sigmoid_focal_loss(
            src_flat, tgt_flat, num_boxes
        )
        losses["loss_dice"] = cfg.dice_coef * dice_loss(src_flat, tgt_flat, num_boxes)

    return losses


def criterion(
    cfg: CriterionConfig,
    outputs: Dict,
    targets: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Compute all losses (already weighted). ``targets``:
      labels [b, t] int32, boxes [b, t, 4] cxcywh-normalized,
      masks [b, t, H, W] binary at padded input size, valid [b, t] {0,1}.

    Returns a dict of scalars; total = sum of values (aux included, suffixed
    ``_i`` like the reference weight_dict keys)."""
    num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)
    losses = _one_layer_losses(cfg, outputs, targets, num_boxes)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_losses = _one_layer_losses(cfg, aux, targets, num_boxes)
        losses.update({f"{k}_{i}": v for k, v in aux_losses.items()})
    return losses


def criterion_from_configs(model_cfg, train_cfg) -> CriterionConfig:
    """Build from ModelConfig + TrainConfig (mirrors reference build(),
    tce_rvos.py:686-715)."""
    return CriterionConfig(
        num_classes=model_cfg.num_classes,
        focal_alpha=train_cfg.focal_alpha,
        use_masks=model_cfg.masks,
        use_vis=model_cfg.vis_loss,
        cls_coef=train_cfg.cls_loss_coef,
        bbox_coef=train_cfg.bbox_loss_coef,
        giou_coef=train_cfg.giou_loss_coef,
        mask_coef=train_cfg.mask_loss_coef,
        dice_coef=train_cfg.dice_loss_coef,
        vis_coef=train_cfg.vis_loss_coef,
        matcher=MatcherConfig(
            cost_class=train_cfg.set_cost_class,
            cost_bbox=train_cfg.set_cost_bbox,
            cost_giou=train_cfg.set_cost_giou,
            cost_mask=train_cfg.set_cost_mask,
            cost_dice=train_cfg.set_cost_dice,
            cost_vis=train_cfg.set_cost_vis,
            num_classes=model_cfg.num_classes,
            use_masks=model_cfg.masks,
            use_vis=model_cfg.vis_loss,
        ),
    )
