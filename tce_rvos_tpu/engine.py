"""Train/eval loops (parity with reference engine.py).

  * ``train_one_epoch`` (engine.py:36-94): forward+loss+update in one jitted
    step, loss-dict logging through MetricLogger, non-finite loss aborts
    (engine.py:70-73), per-step grad-norm metric.
  * ``evaluate_a2d`` (engine.py:295-357): per-batch device postprocess, host
    RLE encoding, metrics = self-contained mAP + P@K/IoU (replaces the
    pickled all_gather + rank-0 pycocotools flow; under multi-host each
    process evaluates its shard and process_allgather merges).
"""

from __future__ import annotations

import math
import sys
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tce_rvos_tpu.utils.logging import MetricLogger, SmoothedValue


def train_one_epoch(
    state,
    step_fn: Callable,
    loader,
    epoch: int,
    rng: jax.Array,
    print_freq: int = 10,
    max_steps: Optional[int] = None,
) -> Dict[str, float]:
    logger = MetricLogger()
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"

    for step, batch in enumerate(logger.log_every(loader, print_freq, header)):
        if max_steps is not None and step >= max_steps:
            break
        rng, step_rng = jax.random.split(rng)
        batch_dev = {k: v for k, v in batch.items() if k != "image_ids"}
        state, metrics = step_fn(state, batch_dev, step_rng)
        host_metrics = {k: float(v) for k, v in metrics.items()}
        loss = host_metrics.pop("loss")
        if not math.isfinite(loss):
            print(f"Loss is {loss}, stopping training")
            print(host_metrics)
            sys.exit(1)
        logger.update(loss=loss, **host_metrics)

    return state, {k: m.global_avg for k, m in logger.meters.items()}


def evaluate_yvos(
    fwd: Callable,
    variables,
    loader,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Train-set mask-quality probe (parity with reference
    engine.py:164-286 evaluate_yvos): run the model on training clips,
    select the best query by mean class score, report dice/focal of its
    masks against GT. A sanity metric, not a benchmark."""
    from tce_rvos_tpu.models.segmentation import dice_loss, sigmoid_focal_loss

    logger = MetricLogger()
    dices, focals = [], []
    for bi, batch in enumerate(logger.log_every(loader, 10, "YVOS probe:")):
        if max_batches is not None and bi >= max_batches:
            break
        outputs = fwd(
            variables,
            video=jnp.asarray(batch["video"]),
            video_mask=jnp.asarray(batch["video_mask"]),
            text_ids=jnp.asarray(batch["text_ids"]),
            text_attn_mask=jnp.asarray(batch["text_attn_mask"]),
            sizes=jnp.asarray(batch["sizes"]),
        )
        logits = np.asarray(outputs["pred_logits"])  # [b, t, q, K]
        masks = np.asarray(outputs["pred_masks"])    # [b, t, q, h, w]
        scores = 1 / (1 + np.exp(-logits))
        best_q = scores.mean(axis=1).max(axis=-1).argmax(axis=-1)  # [b]
        b = masks.shape[0]
        sel = masks[np.arange(b), :, best_q]  # [b, t, h, w]
        gt = batch["targets"]["masks"][:, :, 2::4, 2::4]
        sel_f = jnp.asarray(sel.reshape(b, -1))
        gt_f = jnp.asarray(gt.reshape(b, -1))
        dices.append(float(dice_loss(sel_f, gt_f, b)))
        focals.append(float(sigmoid_focal_loss(sel_f, gt_f, b)))
    out = {"dice_loss": float(np.mean(dices)), "focal_loss": float(np.mean(focals))}
    print(out)
    return out


def evaluate_coco_pretrain(
    fwd: Callable,
    variables,
    loader,
    gt_boxes_by_image: Dict,
    coco_gt_by_image: Dict = None,
    masks: bool = False,
) -> Dict[str, float]:
    """COCO-pretrain eval (parity with reference engine.py:98-161): run the
    bbox postprocessor and score P@{1,5,10} via RefExpEvaluator plus,
    when ``coco_gt_by_image`` annotations are supplied, the class-agnostic
    COCO box mAP the reference gets from CocoEvaluator (engine.py:143-157).
    With ``masks=True`` the segm postprocessor runs too and the evaluator
    additionally scores mask mAP — reference engine.py:126-128 wires
    PostProcessSegm when args.masks, and :154-157 reports
    ``coco_eval_masks``. GT annotations must then carry ``segmentation``
    RLEs (data/{refexp,coco}.py ``coco_gt_by_image`` provide them)."""
    from tce_rvos_tpu.eval.refexp_eval import RefExpEvaluator
    from tce_rvos_tpu.models.postprocessors import (
        coco_postprocess_bbox,
        coco_postprocess_segm,
    )

    iou_types = ("bbox", "segm") if masks else ("bbox",)
    evaluator = RefExpEvaluator(gt_boxes_by_image)
    coco_evaluator = None
    if coco_gt_by_image is not None:
        from tce_rvos_tpu.eval.coco_eval import CocoEvaluator

        coco_evaluator = CocoEvaluator(coco_gt_by_image, iou_types=iou_types)
    logger = MetricLogger()
    for batch in logger.log_every(loader, 10, "Test:"):
        outputs = fwd(
            variables,
            video=jnp.asarray(batch["video"]),
            video_mask=jnp.asarray(batch["video_mask"]),
            text_ids=jnp.asarray(batch["text_ids"]),
            text_attn_mask=jnp.asarray(batch["text_attn_mask"]),
            sizes=jnp.asarray(batch["sizes"]),
        )
        results = coco_postprocess_bbox(outputs, np.asarray(batch["orig_sizes"]))
        if masks:
            results = coco_postprocess_segm(
                results, outputs,
                np.asarray(batch["orig_sizes"]), np.asarray(batch["sizes"]),
            )
        res = {
            batch["image_ids"][i]: {
                "scores": results[i]["scores"],
                "boxes": results[i]["boxes"],
                **(
                    {"masks": results[i]["masks"]} if masks else {}
                ),
            }
            for i in range(len(results))
        }
        evaluator.update(res)
        if coco_evaluator is not None:
            coco_evaluator.update(res)
    # multi-host: each process evaluated its loader shard — merge the
    # prediction dicts before scoring (reference CocoEvaluator does a
    # multi-rank merge, coco_eval.py:172-207; single-process: identity)
    if jax.process_count() > 1:
        from tce_rvos_tpu.parallel.collectives import all_gather_objects
        from tce_rvos_tpu.utils import rle as rle_util

        def _jsonable_rle(r):
            c = r["counts"]
            return {"size": list(r["size"]),
                    "counts": c.decode("ascii") if isinstance(c, bytes) else c}

        def _ser(v):
            d = {"scores": np.asarray(v["scores"]).tolist(),
                 "boxes": np.asarray(v["boxes"]).tolist()}
            if "masks" in v:
                # RLE-encode for the JSON-over-uint8 gather (binary mask
                # stacks are huge; counts strings are compact + jsonable)
                m = np.asarray(v["masks"]).astype(np.uint8)
                d["rle_masks"] = [
                    _jsonable_rle(rle_util.encode(mi.squeeze())) for mi in m
                ]
            return d

        local = {k: _ser(v) for k, v in evaluator.predictions.items()}
        merged = {}
        for shard in all_gather_objects(local):
            merged.update(shard)
        merged = {
            k: {
                "scores": np.asarray(v["scores"]),
                "boxes": np.asarray(v["boxes"]),
                **(
                    {"rle_masks": [
                        {"size": r["size"], "counts": r["counts"].encode("ascii")
                         if isinstance(r["counts"], str) else r["counts"]}
                        for r in v["rle_masks"]
                    ]} if "rle_masks" in v else {}
                ),
            }
            for k, v in merged.items()
        }
        evaluator = RefExpEvaluator(gt_boxes_by_image)
        evaluator.update(merged)
        if coco_evaluator is not None:
            from tce_rvos_tpu.eval.coco_eval import CocoEvaluator

            coco_evaluator = CocoEvaluator(coco_gt_by_image, iou_types=iou_types)
            coco_evaluator.update(merged)
    stats = evaluator.summarize()
    if coco_evaluator is not None:
        stats["coco_eval_bbox"] = coco_evaluator.stats("bbox")
        if masks:
            stats["coco_eval_masks"] = coco_evaluator.stats("segm")
    return stats


def evaluate_a2d(
    fwd: Callable,
    variables,
    loader,
    threshold: float = 0.5,
) -> Dict[str, float]:
    """fwd(variables, **model_inputs) -> outputs dict. The loader must yield
    batches with 'valid_indices', per-sample 'image_id', 'orig_size',
    'size'."""
    from tce_rvos_tpu.models.postprocessors import (
        a2d_device_postprocess,
        a2d_host_postprocess,
    )
    from tce_rvos_tpu.utils import rle as rle_util
    from tce_rvos_tpu.eval.a2d_eval import (
        calculate_map,
        calculate_precision_at_k_and_iou_metrics,
    )

    logger = MetricLogger()
    predictions = []
    gt_by_image = {}
    for batch in logger.log_every(loader, 10, "Test:"):
        outputs = fwd(
            variables,
            video=jnp.asarray(batch["video"]),
            video_mask=jnp.asarray(batch["video_mask"]),
            text_ids=jnp.asarray(batch["text_ids"]),
            text_attn_mask=jnp.asarray(batch["text_attn_mask"]),
            sizes=jnp.asarray(batch["sizes"]),
            valid_indices=jnp.asarray(batch["valid_indices"]),
        )
        dev = a2d_device_postprocess(outputs)
        preds = a2d_host_postprocess(
            dev, batch["sizes"], batch["orig_sizes"]
        )
        for i, p in enumerate(preds):
            image_id = batch["image_ids"][i]
            # GT at ORIGINAL resolution (loader's untransformed 'orig_masks');
            # predictions are resized to orig_size by the postprocessor, so
            # encoding the val-transformed mask here would score two different
            # scales against each other (reference engine.py:332-345 reads GT
            # from the annotation json at original resolution)
            gt_by_image[image_id] = rle_util.encode(
                (batch["orig_masks"][i][0] > 0.5).astype(np.uint8)
            )
            for score, rle in zip(p["scores"], p["rle_masks"]):
                predictions.append(
                    {"image_id": image_id, "score": float(score), "rle": rle}
                )

    # multi-host: every process evaluated its shard of the loader; merge the
    # predictions and GT before scoring (single-process: identity)
    if jax.process_count() > 1:
        from tce_rvos_tpu.parallel.collectives import all_gather_objects

        predictions = [p for shard in all_gather_objects(predictions) for p in shard]
        merged_gt = {}
        for shard in all_gather_objects(gt_by_image):
            merged_gt.update(shard)
        gt_by_image = merged_gt

    metrics = calculate_map(gt_by_image, predictions)
    p_at_k, overall_iou, mean_iou = calculate_precision_at_k_and_iou_metrics(
        gt_by_image, predictions
    )
    metrics.update({f"P@{k}": v for k, v in zip((0.5, 0.6, 0.7, 0.8, 0.9), p_at_k)})
    metrics["overall_iou"] = overall_iou
    metrics["mean_iou"] = mean_iou
    print(metrics)
    return metrics
