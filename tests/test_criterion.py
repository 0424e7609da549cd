"""Matcher/criterion behaviour tests against hand-computable cases and a
torch re-derivation of the reference loss math."""

import numpy as np
import pytest

import jax.numpy as jnp

from tce_rvos_tpu.models.criterion import (
    CriterionConfig,
    criterion,
)
from tce_rvos_tpu.models.matcher import MatcherConfig, match



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

def _fake_outputs(b=2, t=3, q=4, k=1, h=8, w=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pred_logits": jnp.asarray(rng.randn(b, t, q, k), jnp.float32),
        "pred_boxes": jnp.asarray(rng.rand(b, t, q, 4), jnp.float32),
        "pred_masks": jnp.asarray(rng.randn(b, t, q, h, w), jnp.float32),
    }


def _fake_targets(b=2, t=3, h=32, w=32, seed=1):
    rng = np.random.RandomState(seed)
    return {
        "labels": jnp.zeros((b, t), jnp.int32),
        "boxes": jnp.asarray(rng.rand(b, t, 4), jnp.float32),
        "masks": jnp.asarray((rng.rand(b, t, h, w) > 0.5), jnp.float32),
        "valid": jnp.ones((b, t), jnp.int32),
    }


def test_matcher_picks_obviously_best_query():
    """Query 2 predicts the target mask and high score; it must win."""
    b, t, q, h, w = 1, 2, 4, 8, 8
    tgt_mask_small = np.zeros((b, t, h, w), np.float32)
    tgt_mask_small[:, :, 2:6, 2:6] = 1.0
    # upsample x4 for the target (stride-4 downsample in matcher picks these)
    tgt_masks = np.kron(tgt_mask_small, np.ones((4, 4), np.float32))

    logits = np.full((b, t, q, 1), -4.0, np.float32)
    logits[:, :, 2] = 4.0
    masks = np.full((b, t, q, h, w), -8.0, np.float32)
    masks[:, :, 2] = np.where(tgt_mask_small[:, :] > 0, 8.0, -8.0)
    boxes = np.tile(
        np.array([0.9, 0.9, 0.1, 0.1], np.float32), (b, t, q, 1)
    )
    boxes[:, :, 2] = np.array([0.5, 0.5, 0.5, 0.5], np.float32)
    tgt_boxes = np.tile(np.array([0.5, 0.5, 0.5, 0.5], np.float32), (b, t, 1))

    best = match(
        MatcherConfig(num_classes=1),
        jnp.asarray(logits),
        jnp.asarray(boxes),
        jnp.asarray(masks),
        jnp.zeros((b, t), jnp.int32),
        jnp.asarray(tgt_boxes),
        jnp.asarray(tgt_masks),
        jnp.ones((b, t), jnp.int32),
    )
    assert int(best[0]) == 2


def test_criterion_returns_finite_weighted_losses():
    out = _fake_outputs()
    out["aux_outputs"] = [_fake_outputs(seed=7)]
    tgt = _fake_targets()
    losses = criterion(CriterionConfig(), out, tgt)
    for name in ("loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice"):
        assert name in losses
        assert np.isfinite(float(losses[name])), name
    # aux keys
    assert "loss_ce_0" in losses
    total = sum(float(v) for v in losses.values())
    assert np.isfinite(total)


def test_perfect_prediction_drives_losses_down():
    """Compare losses of a perfect query vs a bad one."""
    b, t, q, h, w = 1, 2, 2, 8, 8
    tgt = {
        "labels": jnp.zeros((b, t), jnp.int32),
        "boxes": jnp.asarray(np.tile([0.5, 0.5, 0.2, 0.2], (b, t, 1)), jnp.float32),
        "masks": jnp.asarray(
            np.kron(np.ones((b, t, h, w), np.float32) * (np.arange(h)[:, None] < 4), np.ones((4, 4), np.float32))
        ),
        "valid": jnp.ones((b, t), jnp.int32),
    }
    tgt_small = np.asarray(tgt["masks"])[:, :, 2::4, 2::4]

    def make_out(good):
        logits = np.full((b, t, q, 1), -6.0, np.float32)
        masks = np.full((b, t, q, h, w), -6.0, np.float32)
        boxes = np.tile(np.array([0.1, 0.1, 0.05, 0.05], np.float32), (b, t, q, 1))
        if good:
            logits[:, :, 0] = 6.0
            masks[:, :, 0] = np.where(tgt_small > 0, 6.0, -6.0)
            boxes[:, :, 0] = [0.5, 0.5, 0.2, 0.2]
        return {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(boxes),
            "pred_masks": jnp.asarray(masks),
        }

    good = criterion(CriterionConfig(), make_out(True), tgt)
    bad = criterion(CriterionConfig(), make_out(False), tgt)
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice"):
        assert float(good[k]) < float(bad[k]), k


def test_invalid_frames_ignored_in_class_loss():
    out = _fake_outputs(b=1, t=2)
    tgt = _fake_targets(b=1, t=2)
    tgt["valid"] = jnp.asarray([[1, 0]], jnp.int32)
    losses = criterion(CriterionConfig(), out, tgt)
    assert np.isfinite(float(losses["loss_ce"]))
