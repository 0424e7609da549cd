"""Clip-level data transforms, numpy/PIL host-side.

Behavioural parity with reference datasets/transforms_video.py: all
transforms act on a whole clip (list of frames) plus a target dict with
boxes (xyxy, absolute), masks, caption, valid flags. The train pipeline
(ytvos.py:250-284): hflip(0.5) + photometric distort + multi-scale resize
(or resize->crop->resize) + normalize(+cxcywh); val: resize 360 / max 640.

Notable reference semantics preserved:
  * horizontal flip swaps 'left'<->'right' in the caption
    (transforms_video.py:453-463);
  * Check() marks boxes that collapse after cropping as invalid
    (transforms_video.py:20-45) — implemented here as area>0 validity;
  * resize keeps aspect ratio, short side=size capped so long side<=max_size.

Arrays: frames float32 [H, W, 3] RGB in [0,1] pre-normalize; masks uint8
[H, W]; boxes float32 [N, 4].
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

TRAIN_SCALES = [288, 320, 352, 392, 416, 448, 480, 512]


def _resize_frame(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    import cv2

    h, w = size
    interp = cv2.INTER_LINEAR
    out = cv2.resize(img, (w, h), interpolation=interp)
    if out.ndim == 2:
        out = out[..., None]
    return out


def _resize_mask(mask: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    import cv2

    h, w = size
    return cv2.resize(mask.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST)


def get_size_with_aspect_ratio(
    image_size: Tuple[int, int], size: int, max_size: Optional[int] = None
) -> Tuple[int, int]:
    """(h, w) -> target (h, w); torchvision/DETR convention
    (transforms_video.py RandomResize internals)."""
    h, w = image_size
    if max_size is not None:
        min_original = float(min(h, w))
        max_original = float(max(h, w))
        if max_original / min_original * size > max_size:
            size = int(round(max_size * min_original / max_original))
    if (h <= w and h == size) or (w <= h and w == size):
        return h, w
    if h < w:
        oh = size
        ow = int(size * w / h)
    else:
        ow = size
        oh = int(size * h / w)
    return oh, ow


class ClipTransform:
    def __call__(self, frames: List[np.ndarray], target: Dict) -> Tuple[List[np.ndarray], Dict]:
        raise NotImplementedError


class Compose(ClipTransform):
    def __init__(self, transforms: Sequence[ClipTransform]):
        self.transforms = list(transforms)

    def __call__(self, frames, target):
        for t in self.transforms:
            frames, target = t(frames, target)
        return frames, target


class RandomHorizontalFlip(ClipTransform):
    def __init__(self, p: float = 0.5, rng: Optional[random.Random] = None):
        self.p = p
        self.rng = rng or random

    def __call__(self, frames, target):
        if self.rng.random() >= self.p:
            return frames, target
        w = frames[0].shape[1]
        frames = [np.ascontiguousarray(f[:, ::-1]) for f in frames]
        if "masks" in target:
            target["masks"] = np.ascontiguousarray(target["masks"][..., ::-1])
        if "boxes" in target and len(target["boxes"]):
            b = target["boxes"].copy()
            b[:, [0, 2]] = w - b[:, [2, 0]]
            target["boxes"] = b
        if "caption" in target:
            # the reference swaps 'left'/'right' words on flip
            cap = target["caption"].replace("left", "@").replace("right", "left")
            target["caption"] = cap.replace("@", "right")
        return frames, target


class RandomResize(ClipTransform):
    def __init__(self, sizes: Sequence[int], max_size: Optional[int] = None,
                 rng: Optional[random.Random] = None):
        self.sizes = list(sizes)
        self.max_size = max_size
        self.rng = rng or random

    def __call__(self, frames, target):
        size = self.rng.choice(self.sizes)
        h, w = frames[0].shape[:2]
        oh, ow = get_size_with_aspect_ratio((h, w), size, self.max_size)
        frames = [_resize_frame(f, (oh, ow)) for f in frames]
        ratio_h, ratio_w = oh / h, ow / w
        if "boxes" in target and len(target["boxes"]):
            b = target["boxes"] * np.array([ratio_w, ratio_h, ratio_w, ratio_h], np.float32)
            target["boxes"] = b
        if "masks" in target:
            target["masks"] = np.stack(
                [_resize_mask(m, (oh, ow)) for m in target["masks"]]
            )
        target["size"] = np.array([oh, ow], np.int64)
        return frames, target


class RandomSizeCrop(ClipTransform):
    def __init__(self, min_size: int, max_size: int, rng: Optional[random.Random] = None):
        self.min_size = min_size
        self.max_size = max_size
        self.rng = rng or random

    def __call__(self, frames, target):
        h, w = frames[0].shape[:2]
        tw = self.rng.randint(self.min_size, min(w, self.max_size))
        th = self.rng.randint(self.min_size, min(h, self.max_size))
        i = self.rng.randint(0, h - th) if h > th else 0
        j = self.rng.randint(0, w - tw) if w > tw else 0
        frames = [f[i : i + th, j : j + tw] for f in frames]
        if "boxes" in target and len(target["boxes"]):
            b = target["boxes"] - np.array([j, i, j, i], np.float32)
            b[:, 0::2] = b[:, 0::2].clip(0, tw)
            b[:, 1::2] = b[:, 1::2].clip(0, th)
            target["boxes"] = b
            # Check() semantics: a box that collapsed is invalid
            areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            if "valid" in target:
                target["valid"] = (target["valid"].astype(bool) & (areas > 0)).astype(
                    target["valid"].dtype
                )
        if "masks" in target:
            target["masks"] = target["masks"][..., i : i + th, j : j + tw]
        target["size"] = np.array([th, tw], np.int64)
        return frames, target


_LIGHTING_PERMS = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)
)


class PhotometricDistort(ClipTransform):
    """Per-frame brightness/contrast/saturation/hue jitter + channel-swap
    lighting noise, matching the reference's stochastic structure
    (transforms_video.py:396-421): every parameter is drawn FRESH for each
    frame, each sub-op fires with independent p=0.5, one of the two contrast
    ops (before vs after the HSV block) is chosen at random per frame, and
    RandomLightingNoise applies a random channel permutation.

    Deliberate deviations from the reference (documented, not silent):
      * we operate on float RGB in [0, 1] end to end — the reference
        round-trips through uint8 (``astype('uint8')``), whose numpy cast
        WRAPS out-of-range values modulo 256 (a defect, not a feature);
        we clip instead;
      * the reference converts with cv2.COLOR_BGR2HSV while its arrays are
        actually RGB (PIL order), silently computing hue on swapped
        channels; we use the correct RGB<->HSV conversion.
    """

    def __init__(self, rng: Optional[random.Random] = None):
        self.rng = rng or random

    def _distort_frame(self, x: np.ndarray) -> np.ndarray:
        import cv2

        r = self.rng
        # RandomBrightness (delta scaled from the reference's 0..255 range)
        if r.random() < 0.5:
            x = x + r.uniform(-32.0 / 255, 32.0 / 255)
        contrast_first = r.random() < 0.5
        if contrast_first and r.random() < 0.5:
            x = x * r.uniform(0.5, 1.5)
        hsv = cv2.cvtColor(x.clip(0.0, 1.0), cv2.COLOR_RGB2HSV)
        if r.random() < 0.5:  # RandomSaturation
            hsv[..., 1] *= r.uniform(0.5, 1.5)
        if r.random() < 0.5:  # RandomHue
            hsv[..., 0] = (hsv[..., 0] + r.uniform(-18.0, 18.0)) % 360.0
        x = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        if (not contrast_first) and r.random() < 0.5:
            x = x * r.uniform(0.5, 1.5)
        if r.random() < 0.5:  # RandomLightingNoise
            swap = _LIGHTING_PERMS[r.randrange(len(_LIGHTING_PERMS))]
            x = x[:, :, swap]
        return x.clip(0.0, 1.0)

    def __call__(self, frames, target):
        return [self._distort_frame(f.astype(np.float32)) for f in frames], target


class Normalize(ClipTransform):
    """ImageNet-normalize frames; convert boxes xyxy(abs) -> cxcywh(norm)
    (transforms_video.py:529-547)."""

    def __call__(self, frames, target):
        frames = [(f - IMAGENET_MEAN) / IMAGENET_STD for f in frames]
        h, w = frames[0].shape[:2]
        if "boxes" in target and len(target["boxes"]):
            b = target["boxes"].astype(np.float32)
            cx = (b[:, 0] + b[:, 2]) / 2 / w
            cy = (b[:, 1] + b[:, 3]) / 2 / h
            bw = (b[:, 2] - b[:, 0]) / w
            bh = (b[:, 3] - b[:, 1]) / h
            target["boxes"] = np.stack([cx, cy, bw, bh], axis=1)
        return frames, target


def make_train_transform(max_size: int = 640, rng: Optional[random.Random] = None):
    """Parity with the reference train pipeline (ytvos.py:250-284)."""
    rng = rng or random
    multi = RandomResize(TRAIN_SCALES, max_size=max_size, rng=rng)
    crop_path = Compose([
        RandomResize([400, 500, 600], rng=rng),
        RandomSizeCrop(384, 600, rng=rng),
        RandomResize(TRAIN_SCALES, max_size=max_size, rng=rng),
    ])

    class _Select(ClipTransform):
        def __call__(self, frames, target):
            if rng.random() < 0.5:
                return multi(frames, target)
            return crop_path(frames, target)

    return Compose([
        RandomHorizontalFlip(0.5, rng=rng),
        PhotometricDistort(rng=rng),
        _Select(),
        Normalize(),
    ])


def make_val_transform(size: int = 360, max_size: int = 640):
    """Reference val pipeline: T.RandomResize([360], max_size=640) +
    normalize. A single size makes RandomResize deterministic, and —
    unlike a frames-only resize — it rescales the BOXES with the frames,
    so Normalize's abs->cxcywh conversion sees coordinates at the resized
    resolution."""
    return Compose([RandomResize([size], max_size=max_size), Normalize()])
