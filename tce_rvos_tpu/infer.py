"""Inference pipelines: Ref-YouTube-VOS / Ref-DAVIS17 / MeViS.

Protocol parity with the reference entry points:
  * ytvos (inference_ytvos.py): 202-video valid split (valid minus test
    expression dicts, :71-86); per expression, run the video, pick ONE query
    for all frames by sigmoid(logits).mean(t).max(class).argmax(q)
    (:302-308), upsample to original size, threshold 0.5, save binary PNGs
    under <out>/valid/<video>/<exp_id>/; optional keep_fps windowing with
    f_extra context frames whose outputs are discarded (:198-264).
  * davis (inference_davis.py): expressions grouped by 4 annotators
    (:184-194), clip windows (:209-213 — the reference's 32-frame cap was a
    CUDA im2col_step constraint; here it's a tunable), multi-object merge by
    argmax over [0.1 background, per-object scores] (:293-298), palette PNGs
    per annotator.
  * mevis (inference_mevis.py): the ytvos windowed protocol over the MeViS
    valid split (the reference's own body is commented out/broken —
    SURVEY.md §5; this is the fixed behaviour).

TPU-native replacements for the reference's engineering:
  * the mp.Process-per-GPU fan-out (:88-113) becomes device fan-out: videos
    round-robin over jax.devices();
  * static shapes via (H, W) padding buckets and fixed-length frame windows
    (pad-repeat the last frame, trim outputs) — one compile per bucket.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax

from tce_rvos_tpu.config import ModelConfig
from tce_rvos_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, get_size_with_aspect_ratio
from tce_rvos_tpu.models.build import build_model
from tce_rvos_tpu.models.text_encoder import tokenize


def davis_palette() -> List[int]:
    """Standard VOC/DAVIS 256-color palette."""
    palette = []
    for i in range(256):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= (c & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        palette += [r, g, b]
    return palette


def _load_frame(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


# ---------------------------------------------------------------------------
# serving trunk envelope: how many (expression x frame) frames fit one
# text-conditioned trunk dispatch (VERDICT r4 items 7/8 — replaces the
# round-4 hard-coded ``40 // win`` whole-video cap).
#
# Memory model — XLA's own buffer assignment, measured on v5e by
# scripts/derive_memory_envelope.py at 384x640 bf16 (BASELINE.md round 5,
# 9 (E, T) points, E*T in [8, 80]):
#     trunk_peak_gib ~= 0.43 + 0.085 * (E*T), max |resid| 0.31
# The base below folds the fit residual in as margin. Activation bytes scale
# with the padded pixel count, so other buckets scale the slope by
# (h*w)/(384*640).
#
# Perf: the batch-scaling curve (scripts/bench_batch_scaling.py, BASELINE.md
# round 5) is FLAT through 40 frames/forward (41.6-42.9 ms/clip at 5..40),
# so memory is the ONLY bound. (An apparent 2.6x "cliff" at 40 frames was a
# measurement artifact: a CPU-pegged concurrent process starving the host
# dispatch loop; the device timeline of the same executable and a clean
# re-run both show ~42.6 ms/clip.)
# ---------------------------------------------------------------------------

_MEM_BASE_GIB = 0.75        # fit intercept 0.43 + max residual 0.31
_MEM_PER_FRAME_GIB = 0.085  # fit slope at 384x640 bf16
_DEFAULT_HBM_GIB = 16.0     # v5e
_HBM_SAFETY = 0.85


def trunk_frame_envelope(
    hw: Tuple[int, int] = (384, 640),
    hbm_gib: Optional[float] = None,
) -> int:
    """Max E*T frames per trunk dispatch under the XLA peak-memory fit."""
    if hbm_gib is None:
        hbm_gib = _DEFAULT_HBM_GIB
        try:  # honor the real device when its stats are exposed
            stats = jax.local_devices()[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                hbm_gib = stats["bytes_limit"] / 2**30
        except Exception:
            pass
    scale = (hw[0] * hw[1]) / (384.0 * 640.0)
    avail = hbm_gib * _HBM_SAFETY - _MEM_BASE_GIB
    return max(1, int(avail / (_MEM_PER_FRAME_GIB * scale)))


class InferenceEngine:
    """Jitted, shape-bucketed forward over padded clips. ``device`` pins the
    engine to one accelerator (the variables are committed there, so every
    jitted call executes on it) — the unit of the video fan-out below."""

    def __init__(
        self,
        cfg: ModelConfig,
        variables,
        size: int = 360,
        max_size: int = 640,
        pad_mult: int = 64,
        window: Optional[int] = None,
        device=None,
        t_bucket: int = 8,
    ):
        """``t_bucket``: whole-video mode pads the frame count up to a
        multiple of this, so a dataset with many distinct video lengths
        compiles one program per bucket instead of one per length. 8 (the
        reference protocol's spirit: the whole video in one forward) means
        a 202-video ytvos valid split compiles ~5-8 programs; raise it to
        trade pad compute for fewer compiles, or use windowed mode
        (whole_video=False) for a single fixed-shape program."""
        self.cfg = cfg
        self.model = build_model(cfg)
        if cfg.compute_dtype != "float32":
            from tce_rvos_tpu.utils.precision import cast_floating

            variables = cast_floating(variables, cfg.compute_dtype)
        self.device = device
        if device is not None:
            variables = jax.device_put(variables, device)
        self.variables = variables
        self.size = size
        self.max_size = max_size
        self.pad_mult = pad_mult
        self.window = window or cfg.num_frames
        self.t_bucket = t_bucket
        self._fwd = jax.jit(self._forward)
        self._bb = jax.jit(self._backbone_forward)
        self._trunk = jax.jit(self._trunk_forward)

    def _forward(self, variables, video, video_mask, text_ids, text_attn, sizes):
        if self.cfg.compute_dtype != "float32":
            from tce_rvos_tpu.utils.precision import resolve_dtype

            video = video.astype(resolve_dtype(self.cfg.compute_dtype))
        out = self.model.apply(
            variables,
            video=video,
            video_mask=video_mask,
            text_ids=text_ids,
            text_attn_mask=text_attn,
            sizes=sizes,
        )
        return {
            "pred_logits": out["pred_logits"],
            "pred_masks": out["pred_masks"],
            "pred_boxes": out["pred_boxes"],
            "reference_points": out["reference_points"],
            "inter_samples": out["inter_samples"],
        }

    def _cast_video(self, video):
        if self.cfg.compute_dtype != "float32":
            from tce_rvos_tpu.utils.precision import resolve_dtype

            video = video.astype(resolve_dtype(self.cfg.compute_dtype))
        return video

    def _backbone_forward(self, variables, video, video_mask):
        """Text-independent half: the backbone feature pyramid, computed
        ONCE per clip window and reused for every expression of the video
        (the reference recomputes it per expression —
        inference_ytvos.py:186,294; fusion only enters after input_proj,
        models/tce_rvos.py:258-307)."""
        return tuple(
            self.model.apply(
                variables,
                video=self._cast_video(video),
                video_mask=video_mask,
                backbone_only=True,
            )
        )

    def _trunk_forward(self, variables, feats, video_mask, text_ids, text_attn, sizes):
        """Text-conditioned trunk over precomputed features; text batch E
        tiles the video axis inside the model (expression batching)."""
        out = self.model.apply(
            variables,
            video=None,
            video_mask=video_mask,
            text_ids=text_ids,
            text_attn_mask=text_attn,
            sizes=sizes,
            precomputed_feats=feats,
        )
        return {
            "pred_logits": out["pred_logits"],
            "pred_masks": out["pred_masks"],
            "pred_boxes": out["pred_boxes"],
            "reference_points": out["reference_points"],
            "inter_samples": out["inter_samples"],
        }

    def preprocess(self, frames: List[np.ndarray]):
        """Resize (val protocol: short side `size`, long side <= max_size),
        normalize, pad to the (pad_mult) bucket."""
        import cv2

        h, w = frames[0].shape[:2]
        oh, ow = get_size_with_aspect_ratio((h, w), self.size, self.max_size)
        resized = [
            cv2.resize(f, (ow, oh), interpolation=cv2.INTER_LINEAR) for f in frames
        ]
        normed = [(f - IMAGENET_MEAN) / IMAGENET_STD for f in resized]
        hp, wp = _pad_to(oh, self.pad_mult), _pad_to(ow, self.pad_mult)
        t = len(frames)
        video = np.zeros((1, t, hp, wp, 3), np.float32)
        mask = np.ones((1, t, hp, wp), bool)
        for i, f in enumerate(normed):
            video[0, i, :oh, :ow] = f
            mask[0, i, :oh, :ow] = False
        return video, mask, (oh, ow)

    def run_window(self, video, mask, text_ids, text_attn, model_size):
        # numpy arrays go straight into the jitted fn (no eager device ops —
        # eager dispatch is pathological on remote-compile backends)
        sizes = np.asarray([model_size], np.int32)
        return self._fwd(self.variables, video, mask, text_ids, text_attn, sizes)

    def run_video(
        self, frames: List[np.ndarray], caption: str,
        f_extra: int = 0,
        whole_video: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Window the video into fixed `self.window`-frame clips (+f_extra
        context on both sides whose outputs are discarded), run each, concat.
        Last window pad-repeats the final frame; padded outputs trimmed.

        ``whole_video=True`` reproduces the reference's default ytvos
        protocol (inference_ytvos.py:280-295 — the entire video in one
        forward, so IQT/FTF attend across all frames): the window grows to
        the whole video, T padded to a bucket of 8 by repeating the last
        frame (outputs trimmed)."""
        t_total = len(frames)
        win = self.window
        if whole_video:
            win = max(-(-t_total // self.t_bucket) * self.t_bucket, self.t_bucket)
        # bucketed-longest tokenization, NO truncation: the reference pads
        # to the longest expression and never truncates
        # (models/tce_rvos.py:408) — a silent 24-token cap cut long MeViS /
        # Ref-YouTube-VOS expressions mid-sentence (incl. EOS) and diverged
        # the masks. Lengths are padded to a multiple of 8, so each length
        # bucket is one jit compile (bounded).
        text_ids, text_attn = tokenize([caption])

        logits_all, masks_all, boxes_all, refs_all, samples_all = [], [], [], [], []
        for start in range(0, t_total, win):
            core = list(range(start, min(start + win, t_total)))
            n_core = len(core)
            ext = [max(core[0] - k, 0) for k in range(f_extra, 0, -1)] + core + [
                min(core[-1] + k, t_total - 1) for k in range(1, f_extra + 1)
            ]
            # pad-repeat to the static window length
            while len(ext) < win + 2 * f_extra:
                ext.append(ext[-1])
            clip = [frames[i] for i in ext]
            video, mask, model_size = self.preprocess(clip)
            out = self.run_window(video, mask, text_ids, text_attn, model_size)
            sl = slice(f_extra, f_extra + n_core)
            logits_all.append(np.asarray(out["pred_logits"])[0, sl])
            masks_all.append(np.asarray(out["pred_masks"])[0, sl])
            boxes_all.append(np.asarray(out["pred_boxes"])[0, sl])
            refs_all.append(np.asarray(out["reference_points"])[0, sl])
            # [l, b*t, q, 30, 2] -> last decoder layer, this window's frames
            samples_all.append(np.asarray(out["inter_samples"])[-1][sl])
        return {
            "pred_logits": np.concatenate(logits_all),  # [T, q, K]
            "pred_masks": np.concatenate(masks_all),    # [T, q, h, w]
            "pred_boxes": np.concatenate(boxes_all),    # [T, q, 4]
            "reference_points": np.concatenate(refs_all),  # [T, q, 2]
            "inter_samples": np.concatenate(samples_all),  # [T, q, 30, 2]
            "model_size": model_size,
        }

    def run_video_batch(
        self,
        frames: List[np.ndarray],
        captions: Sequence[str],
        f_extra: int = 0,
        whole_video: bool = False,
        exp_batch: int = 8,
    ) -> List[Dict[str, np.ndarray]]:
        """Serving path for a video with E expressions: per clip window the
        text-independent backbone runs ONCE, then the text-conditioned trunk
        runs with the expressions stacked on the batch axis (``exp_batch``
        at a time, last chunk padded up to a power of two so compiles stay
        bounded). Returns one ``run_video``-format dict per caption; masks
        match the serial per-expression path (tests/test_infer_e2e.py).

        The reference protocols re-run the FULL model once per
        (expression x window) over identical frames (inference_ytvos.py:186,
        294; inference_davis.py:184-295 — x4 annotators); the backbone is
        text-independent so that work is pure recompute, and batching the
        trunk additionally lifts the kernels' batch axis (MFU).
        """
        t_total = len(frames)
        E = len(captions)
        win = self.window
        if whole_video:
            win = max(-(-t_total // self.t_bucket) * self.t_bucket, self.t_bucket)
        # cap E per trunk dispatch by the measured memory envelope at the
        # engine's padded bucket — BOTH modes: round 4's hard-coded
        # whole-video-only ``40 // win`` left the windowed protocols free to
        # build arbitrarily large (E * win)-frame trunk programs, and was
        # itself 4x too conservative (the fit says ~150 frames at 384x640)
        h0, w0 = frames[0].shape[:2]
        oh, ow = get_size_with_aspect_ratio((h0, w0), self.size, self.max_size)
        bucket_hw = (_pad_to(oh, self.pad_mult), _pad_to(ow, self.pad_mult))
        cap = trunk_frame_envelope(bucket_hw) // (win + 2 * f_extra)
        # chunks below pad E up to a power of two (bounds compile count), so
        # the memory bound must hold at the PADDED width: floor to pow2
        p2 = 1
        while p2 * 2 <= cap:
            p2 *= 2
        exp_batch = max(1, min(exp_batch, p2))
        text_ids, text_attn = tokenize([str(c) for c in captions])

        # expression chunks: full exp_batch blocks + a pow2-padded tail
        chunks: List[Tuple[int, int, int]] = []  # (offset, n_real, n_padded)
        off = 0
        while off < E:
            n = min(exp_batch, E - off)
            npad = 1
            while npad < n:
                npad *= 2
            chunks.append((off, n, npad))
            off += n

        keys = ("pred_logits", "pred_masks", "pred_boxes", "reference_points")
        acc: List[Dict[str, List[np.ndarray]]] = [
            {k: [] for k in keys + ("inter_samples",)} for _ in range(E)
        ]
        model_size = None
        for start in range(0, t_total, win):
            core = list(range(start, min(start + win, t_total)))
            n_core = len(core)
            ext = [max(core[0] - k, 0) for k in range(f_extra, 0, -1)] + core + [
                min(core[-1] + k, t_total - 1) for k in range(1, f_extra + 1)
            ]
            while len(ext) < win + 2 * f_extra:
                ext.append(ext[-1])
            clip = [frames[i] for i in ext]
            video, mask, model_size = self.preprocess(clip)
            sizes = np.asarray([model_size], np.int32)
            feats = self._bb(self.variables, video, mask)
            sl = slice(f_extra, f_extra + n_core)
            for c_off, n_real, n_pad in chunks:
                ids = text_ids[c_off : c_off + n_real]
                attn = text_attn[c_off : c_off + n_real]
                if n_pad != n_real:  # pad rows are duplicates, discarded
                    pad = n_pad - n_real
                    ids = np.concatenate([ids, np.repeat(ids[:1], pad, 0)])
                    attn = np.concatenate([attn, np.repeat(attn[:1], pad, 0)])
                out = self._trunk(self.variables, feats, mask, ids, attn, sizes)
                t_clip = win + 2 * f_extra
                samples = np.asarray(out["inter_samples"])[-1]
                samples = samples.reshape((n_pad, t_clip) + samples.shape[1:])
                for e in range(n_real):
                    a = acc[c_off + e]
                    for k in keys:
                        a[k].append(np.asarray(out[k])[e, sl])
                    a["inter_samples"].append(samples[e, sl])
        return [
            {
                **{k: np.concatenate(a[k]) for k in keys + ("inter_samples",)},
                "model_size": model_size,
            }
            for a in acc
        ]


def make_engines(
    cfg: ModelConfig,
    variables,
    num_devices: int = 0,
    **engine_kw,
) -> List[InferenceEngine]:
    """One pinned engine per device — the TPU-native replacement for the
    reference's mp.Process-per-GPU fan-out (inference_ytvos.py:88-113).
    num_devices=0 uses every local device; 1 keeps the default device."""
    devices = jax.local_devices()
    if num_devices:
        devices = devices[:num_devices]
    if len(devices) == 1:
        return [InferenceEngine(cfg, variables, **engine_kw)]
    return [
        InferenceEngine(cfg, variables, device=d, **engine_kw) for d in devices
    ]


def _fanout(engines: Sequence[InferenceEngine], jobs: Sequence, fn) -> None:
    """Round-robin ``jobs`` over per-device engines. Threads suffice: each
    worker keeps one in-flight dispatch on its own device; the host work
    (decode, PNG encode) overlaps device compute across workers."""
    if len(engines) == 1:
        for job in jobs:
            fn(engines[0], job)
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue()
    for job in jobs:
        q.put(job)
    errors: List[BaseException] = []

    def worker(engine):
        while not errors:
            try:
                job = q.get_nowait()
            except queue.Empty:
                return
            try:
                fn(engine, job)
            except BaseException as e:  # surface in the caller
                errors.append(e)
                return

    threads = [
        threading.Thread(target=worker, args=(e,), daemon=True) for e in engines
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def select_query(pred_logits: np.ndarray) -> int:
    """One query for the whole video: sigmoid -> mean over frames -> max
    over classes -> argmax over queries (inference_ytvos.py:302-308)."""
    scores = 1.0 / (1.0 + np.exp(-pred_logits))  # [T, q, K]
    per_query = scores.mean(axis=0).max(axis=-1)  # [q]
    return int(per_query.argmax())


@functools.lru_cache(maxsize=None)
def _jitted_upsample(h4: int, w4: int, oh: int, ow: int, device):
    from tce_rvos_tpu.utils.interpolate import resize_bilinear

    @jax.jit
    def f(x):
        up = resize_bilinear(x[:, :h4, :w4, None], (oh, ow), align_corners=False)
        return jax.nn.sigmoid(up[..., 0])

    return f


def masks_to_original(
    mask_logits: np.ndarray,
    model_size: Tuple[int, int],
    orig_size: Tuple[int, int],
    device=None,
) -> np.ndarray:
    """[T, h, w] stride-4 logits -> sigmoid scores at the original
    resolution (bilinear, align_corners=False), matching
    inference_ytvos.py:311-312. Jitted per shape (no eager dispatch);
    ``device`` keeps the upsample on the fan-out worker's own chip."""
    mh, mw = model_size
    h4, w4 = -(-mh // 4), -(-mw // 4)
    oh, ow = int(orig_size[0]), int(orig_size[1])
    x = mask_logits if device is None else jax.device_put(
        np.asarray(mask_logits), device
    )
    return np.asarray(_jitted_upsample(h4, w4, oh, ow, device)(x))


def save_visualization(
    frames: List[np.ndarray],       # raw RGB floats in [0, 1], original size
    frame_names: Sequence[str],
    scores: np.ndarray,             # [T, H, W] sigmoid mask scores
    boxes: np.ndarray,              # [T, 4] normalized cxcywh
    ref_points: np.ndarray,         # [T, 2] normalized (x, y)
    samples: np.ndarray,            # [T, S, 2] normalized sampling locations
    out_dir: str,
    color=(255, 144, 30),
    threshold: float = 0.5,
) -> None:
    """Qualitative overlay (reference inference_ytvos.py:318-363 with
    --visualize): mask blend + predicted box + decoder reference-point
    crosshair + the exported top-30 deformable sampling locations."""
    from PIL import Image, ImageDraw

    os.makedirs(out_dir, exist_ok=True)
    col = np.asarray(color, np.float32)
    for t, (frame, name) in enumerate(zip(frames, frame_names)):
        h, w = frame.shape[:2]
        img = (frame * 255).astype(np.uint8).copy()
        m = scores[t] > threshold
        img[m] = (0.5 * img[m] + 0.5 * col).astype(np.uint8)
        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        cx, cy, bw, bh = boxes[t]
        x0, y0 = (cx - bw / 2) * w, (cy - bh / 2) * h
        x1, y1 = (cx + bw / 2) * w, (cy + bh / 2) * h
        draw.rectangle((x0, y0, x1, y1), outline=tuple(color), width=2)
        rx, ry = ref_points[t][0] * w, ref_points[t][1] * h
        draw.line((rx - 10, ry, rx + 10, ry), fill=tuple(color), width=4)
        draw.line((rx, ry - 10, rx, ry + 10), fill=tuple(color), width=4)
        for sx, sy in samples[t]:
            px, py = sx * w, sy * h
            draw.ellipse((px - 2, py - 2, px + 2, py + 2), fill=tuple(color))
        pil.save(os.path.join(out_dir, name + ".png"))


# ---------------------------------------------------------------------------
# protocols
# ---------------------------------------------------------------------------


def ytvos_video_list(ytvos_path: str, split: str = "valid") -> Tuple[List[str], Dict]:
    meta_file = os.path.join(ytvos_path, "meta_expressions", split, "meta_expressions.json")
    with open(meta_file) as fh:
        data = json.load(fh)["videos"]
    test_meta = os.path.join(ytvos_path, "meta_expressions", "test", "meta_expressions.json")
    if os.path.exists(test_meta):
        with open(test_meta) as fh:
            test_videos = set(json.load(fh)["videos"].keys())
        videos = sorted(set(data.keys()) - test_videos)
    else:
        videos = sorted(data.keys())
    return videos, data


def _as_engines(engine) -> List[InferenceEngine]:
    return [engine] if isinstance(engine, InferenceEngine) else list(engine)


def run_ytvos(
    engine,
    ytvos_path: str,
    output_dir: str,
    split: str = "valid",
    threshold: float = 0.5,
    f_extra: int = 0,
    videos: Optional[Sequence[str]] = None,
    whole_video: bool = True,
    visualize: bool = False,
    exp_batch: int = 8,
):
    """Write per-frame binary PNGs to <out>/<split>/<video>/<exp_id>/.
    ``whole_video`` defaults True (the reference's default protocol); set
    False for the keep_fps windowed protocol. ``engine`` may be a single
    InferenceEngine or a list from ``make_engines`` — videos round-robin
    over the per-device engines (reference inference_ytvos.py:88-113).
    ``visualize`` additionally writes qualitative overlays (mask + box +
    reference point + sampling locations) under <out>/<split>_vis/."""
    from PIL import Image

    engines = _as_engines(engine)
    video_list, data = ytvos_video_list(ytvos_path, split)
    if videos is not None:
        allowed = set(videos)
        video_list = [v for v in video_list if v in allowed]
    img_root = os.path.join(ytvos_path, split, "JPEGImages")
    save_root = os.path.join(output_dir, split)
    t0 = time.time()
    n_frames = [0]

    def one_video(eng, video):
        frames_names = data[video]["frames"]
        frames = [
            _load_frame(os.path.join(img_root, video, f + ".jpg"))
            for f in frames_names
        ]
        orig_h, orig_w = frames[0].shape[:2]
        exps = list(data[video]["expressions"].items())
        # serving path: backbone once per window, expressions batched
        # (masks match the per-expression path — test_infer_e2e.py)
        outs = eng.run_video_batch(
            frames, [" ".join(d["exp"].lower().split()) for _, d in exps],
            f_extra=f_extra, whole_video=whole_video, exp_batch=exp_batch,
        )
        for (exp_id, exp_dict), out in zip(exps, outs):
            q = select_query(out["pred_logits"])
            scores = masks_to_original(
                out["pred_masks"][:, q], out["model_size"], (orig_h, orig_w),
                device=eng.device,
            )
            save_dir = os.path.join(save_root, video, exp_id)
            os.makedirs(save_dir, exist_ok=True)
            for i, name in enumerate(frames_names):
                m = (scores[i] > threshold).astype(np.uint8) * 255
                Image.fromarray(m).save(os.path.join(save_dir, name + ".png"))
            if visualize:
                from tce_rvos_tpu.tools.colormap import colormap

                colors = colormap(rgb=True)
                ci = int(exp_id) if exp_id.isdigit() else abs(hash(exp_id))
                save_visualization(
                    frames, frames_names, scores,
                    out["pred_boxes"][:, q],
                    out["reference_points"][:, q],
                    out["inter_samples"][:, q],
                    os.path.join(output_dir, f"{split}_vis", video, exp_id),
                    color=tuple(int(c) for c in colors[ci % len(colors)]),
                    threshold=threshold,
                )
            n_frames[0] += len(frames_names)

    _fanout(engines, video_list, one_video)
    print(f"Total inference time: {time.time() - t0:.4f} s ({n_frames[0]} frames)")


def run_davis(
    engine: InferenceEngine,
    davis_path: str,
    output_dir: str,
    split: str = "valid",
    threshold: float = 0.5,
    videos: Optional[Sequence[str]] = None,
    exp_batch: int = 8,
):
    """4-annotator protocol: per annotator, run every object expression, merge
    objects by argmax over [0.1 bg, scores], save palette PNGs under
    <out>/<split>/anno_<k>/<video>/ (inference_davis.py:184-311)."""
    from PIL import Image

    meta_file = os.path.join(davis_path, "meta_expressions", split, "meta_expressions.json")
    with open(meta_file) as fh:
        data = json.load(fh)["videos"]
    engines = _as_engines(engine)
    video_list = sorted(data.keys()) if videos is None else sorted(videos)
    img_root = os.path.join(davis_path, split, "JPEGImages")
    palette = davis_palette()
    t0 = time.time()

    def one_video(eng, video):
        frames_names = data[video]["frames"]
        frames = [
            _load_frame(os.path.join(img_root, video, f + ".jpg"))
            for f in frames_names
        ]
        orig_h, orig_w = frames[0].shape[:2]
        expressions = data[video]["expressions"]
        exp_ids = sorted(expressions.keys(), key=int)
        num_obj = len(exp_ids) // 4
        # serving path: ONE batched pass over all num_obj*4 annotator
        # expressions — the reference re-runs the full model per expression
        # per annotator over identical frames (inference_davis.py:184-295)
        outs = eng.run_video_batch(
            frames,
            [" ".join(expressions[eid]["exp"].lower().split()) for eid in exp_ids],
            exp_batch=exp_batch,
        )
        for anno_id in range(4):
            obj_scores = []
            for obj_id in range(num_obj):
                out = outs[obj_id * 4 + anno_id]
                q = select_query(out["pred_logits"])
                scores = masks_to_original(
                    out["pred_masks"][:, q], out["model_size"], (orig_h, orig_w),
                    device=eng.device,
                )
                obj_scores.append(scores)
            anno = np.stack(obj_scores)  # [num_obj, T, H, W]
            anno[anno < threshold] = 0.0
            bg = np.full((1,) + anno.shape[1:], 0.1, anno.dtype)
            merged = np.argmax(np.concatenate([bg, anno]), axis=0).astype(np.uint8)
            save_dir = os.path.join(output_dir, split, f"anno_{anno_id}", video)
            os.makedirs(save_dir, exist_ok=True)
            for i in range(merged.shape[0]):
                img = Image.fromarray(merged[i])
                img.putpalette(palette)
                # the reference writes sequential '{:05d}'.format(i)
                # (inference_davis.py:311) — identical on the standard
                # 00000-based DAVIS layout; using the real frame name also
                # survives converted/subsampled frame lists, which the
                # davis_eval reader looks up by GT mask id
                img.save(os.path.join(save_dir, f"{frames_names[i]}.png"))

    _fanout(engines, video_list, one_video)
    print(f"Total inference time: {time.time() - t0:.4f} s")


def run_mevis(
    engine: InferenceEngine,
    mevis_path: str,
    output_dir: str,
    split: str = "valid",
    threshold: float = 0.5,
    videos: Optional[Sequence[str]] = None,
    exp_batch: int = 8,
):
    """MeViS valid-split inference with the ytvos windowed protocol (fixes
    the reference's gutted inference_mevis.py body)."""
    from PIL import Image

    meta_file = os.path.join(mevis_path, split, "meta_expressions.json")
    with open(meta_file) as fh:
        data = json.load(fh)["videos"]
    engines = _as_engines(engine)
    video_list = sorted(data.keys()) if videos is None else sorted(videos)
    img_root = os.path.join(mevis_path, split, "JPEGImages")
    t0 = time.time()

    def one_video(eng, video):
        frames_names = data[video]["frames"]
        frames = [
            _load_frame(os.path.join(img_root, video, f + ".jpg"))
            for f in frames_names
        ]
        orig_h, orig_w = frames[0].shape[:2]
        exps = list(data[video]["expressions"].items())
        outs = eng.run_video_batch(
            frames, [" ".join(d["exp"].lower().split()) for _, d in exps],
            exp_batch=exp_batch,
        )
        for (exp_id, exp_dict), out in zip(exps, outs):
            q = select_query(out["pred_logits"])
            scores = masks_to_original(
                out["pred_masks"][:, q], out["model_size"], (orig_h, orig_w),
                device=eng.device,
            )
            save_dir = os.path.join(output_dir, split, video, exp_id)
            os.makedirs(save_dir, exist_ok=True)
            for i, name in enumerate(frames_names):
                m = (scores[i] > threshold).astype(np.uint8) * 255
                Image.fromarray(m).save(os.path.join(save_dir, name + ".png"))

    _fanout(engines, video_list, one_video)
    print(f"Total inference time: {time.time() - t0:.4f} s")


def main(argv=None):
    import argparse

    from tce_rvos_tpu.cli import add_model_args, model_config_from_args

    p = argparse.ArgumentParser("tce_rvos_tpu inference")
    add_model_args(p)
    p.add_argument("--dataset_file", default="ytvos",
                   choices=["ytvos", "davis", "mevis"])
    p.add_argument("--ytvos_path", default="data/Refer_YouTube_VOS/rvos")
    p.add_argument("--davis_path", default="/data/davis17")
    p.add_argument("--mevis_path", default="data/MeViS")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--split", default="valid")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--resume", default="")
    p.add_argument("--window", type=int, default=0,
                   help="frames per clip window (0 = num_frames; davis default 32)")
    p.add_argument("--num_devices", "--ngpu", type=int, default=0, dest="num_devices",
                   help="devices to fan videos out over (0 = all local)")
    p.add_argument("--visualize", action="store_true",
                   help="save qualitative overlays (mask/box/ref/sampling points)")
    p.add_argument("--exp_batch", type=int, default=8,
                   help="expressions batched per trunk forward (backbone runs "
                        "once per window either way); 1 disables batching")
    args = p.parse_args(argv)

    cfg = model_config_from_args(args)
    model = build_model(cfg)
    from tce_rvos_tpu.models.build import example_inputs

    inputs = example_inputs(cfg, b=1, t=cfg.num_frames, hw=(64, 64))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    if args.resume:
        from tce_rvos_tpu.models.text_encoder import require_real_tokenizer
        from tce_rvos_tpu.utils.checkpoint import convert_state_dict, load_torch_file

        require_real_tokenizer("--resume checkpoint")
        sd = load_torch_file(args.resume)
        variables, _, _ = convert_state_dict(sd, variables)

    window = args.window or (32 if args.dataset_file == "davis" else cfg.num_frames)
    engines = make_engines(cfg, variables, args.num_devices, window=window)
    if args.dataset_file == "ytvos":
        run_ytvos(engines, args.ytvos_path, args.output_dir, args.split,
                  args.threshold, cfg.f_extra, visualize=args.visualize,
                  exp_batch=args.exp_batch)
    elif args.dataset_file == "davis":
        run_davis(engines, args.davis_path, args.output_dir, args.split,
                  args.threshold, exp_batch=args.exp_batch)
    else:
        run_mevis(engines, args.mevis_path, args.output_dir, args.split,
                  args.threshold, exp_batch=args.exp_batch)


if __name__ == "__main__":
    main()
