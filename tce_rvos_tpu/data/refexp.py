"""RefCOCO/+/g datasets for joint pretraining.

Parity with reference datasets/refexp.py (single-image "1-frame clips") and
datasets/refexp2seq.py (pseudo-video clips synthesized from one COCO image
via random perspective/affine/motion-blur jitter + frame shuffle —
refexp2seq.py:31-67; the imgaug dependency is replaced with cv2 warps).

Expects COCO-format json (converted by tools/convert_refexp_to_coco) with
one annotation per image and the caption in image['caption'].
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional, Tuple

import numpy as np


def poly_to_mask(segmentation, h: int, w: int) -> np.ndarray:
    """COCO polygon / RLE -> binary mask."""
    from tce_rvos_tpu.utils import rle as rle_util

    if isinstance(segmentation, dict):
        if isinstance(segmentation["counts"], list):
            return rle_util.decode_counts(segmentation["counts"], h, w).astype(np.float32)
        return rle_util.decode(segmentation).astype(np.float32)
    import cv2

    mask = np.zeros((h, w), np.uint8)
    for poly in segmentation:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


class ImageToSeqAugmenter:
    """Pseudo-video jitter (semantics of
    datasets/image_to_seq_augmenter.py): per synthetic frame, a random
    perspective + affine (rotate/translate/shear) warp of the still image
    and its mask."""

    def __init__(
        self,
        perturb_max: float = 0.02,
        rotation_range: Tuple[float, float] = (-20, 20),
        translate_range: Tuple[float, float] = (-0.1, 0.1),
        rng: Optional[random.Random] = None,
    ):
        self.perturb_max = perturb_max
        self.rotation_range = rotation_range
        self.translate_range = translate_range
        self.rng = rng or random.Random()

    def _warp_matrix(self, h: int, w: int) -> np.ndarray:
        import cv2

        r = self.rng
        # perspective: jitter the 4 corners
        src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
        jit = np.float32(
            [
                [r.uniform(-1, 1) * self.perturb_max * w,
                 r.uniform(-1, 1) * self.perturb_max * h]
                for _ in range(4)
            ]
        )
        persp = cv2.getPerspectiveTransform(src, src + jit)
        # affine: rotation + translation about the center
        ang = r.uniform(*self.rotation_range) * 0.1
        tx = r.uniform(*self.translate_range) * w * 0.3
        ty = r.uniform(*self.translate_range) * h * 0.3
        aff = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
        aff[:, 2] += (tx, ty)
        aff3 = np.vstack([aff, [0, 0, 1]]).astype(np.float32)
        return (persp @ aff3).astype(np.float32)

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        import cv2

        h, w = image.shape[:2]
        m = self._warp_matrix(h, w)
        img_w = cv2.warpPerspective(image, m, (w, h), flags=cv2.INTER_LINEAR)
        mask_w = cv2.warpPerspective(
            mask.astype(np.uint8), m, (w, h), flags=cv2.INTER_NEAREST
        )
        return img_w, mask_w.astype(np.float32)


class RefExpDataset:
    """COCO-format referring expressions; returns clips of length
    ``num_frames`` (1 for the plain image dataset; >1 synthesizes a
    pseudo-video like refexp2seq)."""

    def __init__(
        self,
        img_folder: str,
        ann_file: str,
        transforms=None,
        num_frames: int = 1,
        f_extra: int = 0,
        rng: Optional[random.Random] = None,
    ):
        self.img_folder = img_folder
        with open(ann_file) as fh:
            coco = json.load(fh)
        self.images = {img["id"]: img for img in coco["images"]}
        self.anns_by_image = {}
        for ann in coco["annotations"]:
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.ids = [i for i in self.images if i in self.anns_by_image]
        self._transforms = transforms
        self.num_frames = num_frames
        self.f_extra = f_extra
        self.rng = rng or random.Random()
        self.augmenter = ImageToSeqAugmenter(rng=self.rng)

    def __len__(self):
        return len(self.ids)

    def gt_boxes_by_image(self):
        """image_id -> [n_gt, 4] xyxy, for eval.refexp_eval.RefExpEvaluator
        (reference datasets/refexp_eval.py:49-60 reads them off coco_gt)."""
        out = {}
        for img_id in self.ids:
            boxes = []
            for a in self.anns_by_image[img_id]:
                x, y, w, h = a["bbox"]
                boxes.append([x, y, x + w, y + h])
            out[img_id] = np.asarray(boxes, np.float32)
        return out

    def coco_gt_by_image(self):
        """image_id -> annotation dicts for eval.coco_eval.CocoEvaluator.
        When annotations carry polygon segmentations they are rasterized to
        RLE so the evaluator can score the ``segm`` iou_type (the reference
        feeds pycocotools the raw polygons and it rasterizes internally)."""
        from tce_rvos_tpu.utils import rle as rle_util

        out = {}
        for img_id in self.ids:
            info = self.images[img_id]
            h, w = int(info["height"]), int(info["width"])
            anns = []
            for a in self.anns_by_image[img_id]:
                d = {
                    "bbox": a["bbox"],
                    "area": a.get(
                        "area", float(a["bbox"][2]) * float(a["bbox"][3])
                    ),
                    "iscrowd": a.get("iscrowd", 0),
                }
                if "segmentation" in a:
                    d["segmentation"] = rle_util.encode(
                        poly_to_mask(a["segmentation"], h, w).astype(np.uint8)
                    )
                anns.append(d)
            out[img_id] = anns
        return out

    def __getitem__(self, idx: int):
        from PIL import Image

        img_id = self.ids[idx]
        info = self.images[img_id]
        anns = self.anns_by_image[img_id]
        caption = " ".join(info.get("caption", "").lower().split())
        path = os.path.join(self.img_folder, info["file_name"])
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        h, w = img.shape[:2]

        ann = anns[0]
        mask = poly_to_mask(ann["segmentation"], h, w) if "segmentation" in ann else np.zeros((h, w), np.float32)
        x, y, bw, bh = ann["bbox"]
        box = [x, y, x + bw, y + bh]

        total = self.num_frames + 2 * self.f_extra
        # the warp+shuffle clip synthesis runs in EVERY split — the
        # reference's refexp2seq.py:62-67 applies its augmenter in
        # __getitem__ with no image_set gate, so val clips are randomly
        # warped there too (a quirk replicated for protocol parity)
        frames, masks = [img], [mask]
        for _ in range(total - 1):
            fi, mi = self.augmenter(img, mask)
            frames.append(fi)
            masks.append(mi)
        order = list(range(total))
        if total > 1:
            self.rng.shuffle(order)
        frames = [frames[i] for i in order]
        masks = [masks[i] for i in order]

        boxes, valid = [], []
        from tce_rvos_tpu.data.ytvos import mask_to_box

        for m in masks:
            if (m > 0).any():
                y1, y2, x1, x2 = mask_to_box(m)
                boxes.append([x1, y1, x2, y2])
                valid.append(1)
            else:
                boxes.append(box)
                valid.append(0)

        target = {
            "frames_idx": np.arange(total, dtype=np.int64),
            "labels": np.zeros((total,), np.int64),
            "boxes": np.asarray(boxes, np.float32),
            "masks": np.stack(masks),
            "valid": np.asarray(valid, np.int64),
            "caption": caption,
            "orig_size": np.asarray([h, w], np.int64),
            "size": np.asarray([h, w], np.int64),
            "image_id": img_id,
        }
        if self._transforms is not None:
            frames, target = self._transforms(frames, target)
        from tce_rvos_tpu.data.ytvos import clip_target

        return np.stack(frames), clip_target(target, self.f_extra)


def build_refexp(
    name: str, image_set: str, data_cfg, model_cfg, as_video: bool = True,
    transforms=None,
):
    from tce_rvos_tpu.data.transforms import make_train_transform, make_val_transform

    root = data_cfg.coco_path
    mode = "instances"
    paths = {
        "refcoco": ("train2014", f"{mode}_refcoco_{image_set}.json"),
        "refcoco+": ("train2014", f"{mode}_refcoco+_{image_set}.json"),
        "refcocog": ("train2014", f"{mode}_refcocog_{image_set}.json"),
    }
    img_dir, ann = paths[name]
    tf = transforms or (
        make_train_transform(data_cfg.max_size) if image_set == "train"
        else make_val_transform()
    )
    return RefExpDataset(
        os.path.join(root, img_dir),
        os.path.join(root, ann),
        tf,
        num_frames=model_cfg.num_frames if as_video else 1,
        f_extra=model_cfg.f_extra if as_video else 0,
    )
