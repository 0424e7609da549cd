"""Dataset/transform tests over synthetic on-disk fixtures (no real data,
no device compiles needed)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ytvos_root(tmp_path_factory):
    """Synthetic Ref-YouTube-VOS layout: 2 videos x 6 frames, one object."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ytvos")
    rng = np.random.RandomState(0)
    meta = {"videos": {}}
    meta_exp = {"videos": {}}
    for v in ("vid_a", "vid_b"):
        frames = [f"{i:05d}" for i in range(6)]
        os.makedirs(root / "train" / "JPEGImages" / v)
        os.makedirs(root / "train" / "Annotations" / v)
        for f in frames:
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "train" / "JPEGImages" / v / f"{f}.jpg")
            mask = np.zeros((48, 64), np.uint8)
            mask[10:30, 20:40] = 2  # object id 2
            pal_img = Image.fromarray(mask, mode="P")
            palette = []
            for i in range(256):
                palette += [i, i, i]
            pal_img.putpalette(palette)
            pal_img.save(root / "train" / "Annotations" / v / f"{f}.png", bits=8)
        meta["videos"][v] = {"objects": {"2": {"category": "cat"}}}
        meta_exp["videos"][v] = {
            "frames": frames,
            "expressions": {"0": {"exp": "the cat on the left", "obj_id": "2"}},
        }
    with open(root / "train" / "meta.json", "w") as fh:
        json.dump(meta, fh)
    os.makedirs(root / "meta_expressions" / "train")
    with open(root / "meta_expressions" / "train" / "meta_expressions.json", "w") as fh:
        json.dump(meta_exp, fh)
    return root


def test_ytvos_dataset_samples_clip(ytvos_root):
    from tce_rvos_tpu.data.transforms import make_val_transform
    from tce_rvos_tpu.data.ytvos import YTVOSDataset

    ds = YTVOSDataset(
        str(ytvos_root / "train"),
        str(ytvos_root / "meta_expressions" / "train" / "meta_expressions.json"),
        transforms=make_val_transform(size=64, max_size=96),
        num_frames=3,
    )
    assert len(ds) > 0
    clip, target = ds[0]
    assert clip.shape[0] == 3 and clip.shape[-1] == 3
    assert target["masks"].shape[0] == 3
    assert target["valid"].sum() == 3  # object visible in every frame
    assert target["boxes"].shape == (3, 4)
    assert (target["boxes"] >= 0).all() and (target["boxes"] <= 1).all()  # cxcywh norm
    assert target["caption"] == "the cat on the left"


def test_ytvos_keep_fps_phase(ytvos_root):
    from tce_rvos_tpu.data.ytvos import YTVOSDataset

    ds = YTVOSDataset(
        str(ytvos_root / "train"),
        str(ytvos_root / "meta_expressions" / "train" / "meta_expressions.json"),
        transforms=None,
        num_frames=3,
        keep_fps=True,
    )
    n0 = len(ds)
    first_anchor_before = ds.metas[0]["frame_id"]
    ds.refresh_metas()
    assert ds.counter == 0
    ds.refresh_metas()
    assert ds.counter == 1
    assert ds.metas[0]["frame_id"] == 1  # phase shifted


def test_hflip_swaps_caption_words():
    from tce_rvos_tpu.data.transforms import RandomHorizontalFlip
    import random

    t = RandomHorizontalFlip(p=1.0, rng=random.Random(0))
    frames = [np.zeros((8, 8, 3), np.float32)]
    target = {"caption": "left of the right person"}
    _, target = t(frames, target)
    assert target["caption"] == "right of the left person"


def test_normalize_box_conversion():
    from tce_rvos_tpu.data.transforms import Normalize

    frames = [np.zeros((10, 20, 3), np.float32)]
    target = {"boxes": np.array([[5.0, 2.0, 15.0, 8.0]], np.float32)}
    _, target = Normalize()(frames, target)
    np.testing.assert_allclose(target["boxes"], [[0.5, 0.5, 0.5, 0.6]], atol=1e-6)


def test_collate_batch_shapes(ytvos_root):
    from tce_rvos_tpu.data.registry import collate_batch
    from tce_rvos_tpu.data.transforms import make_val_transform
    from tce_rvos_tpu.data.ytvos import YTVOSDataset

    ds = YTVOSDataset(
        str(ytvos_root / "train"),
        str(ytvos_root / "meta_expressions" / "train" / "meta_expressions.json"),
        transforms=make_val_transform(size=64, max_size=96),
        num_frames=2,
    )
    batch = collate_batch([ds[0], ds[1]])
    b, t, h, w, c = batch["video"].shape
    assert (b, t, c) == (2, 2, 3)
    assert h % 32 == 0 and w % 32 == 0
    assert batch["video_mask"].shape == (b, t, h, w)
    assert batch["targets"]["masks"].shape == (b, t, h, w)
    assert batch["text_ids"].shape[0] == 2


def test_sampler_shards_and_seeds():
    from tce_rvos_tpu.data.loader import ShardedSampler

    s0 = ShardedSampler(10, seed=1, num_replicas=2, rank=0)
    s1 = ShardedSampler(10, seed=1, num_replicas=2, rank=1)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 5
    assert set(i0).isdisjoint(set(i1)) or len(set(i0 + i1)) == 10
    s0.set_epoch(1)
    assert list(s0) != i0  # epoch reshuffles


def test_prefetch_loader_delivers_all_batches():
    from tce_rvos_tpu.data.loader import PrefetchLoader, ShardedSampler

    data = list(range(20))

    class DS:
        def __len__(self):
            return len(data)

        def __getitem__(self, i):
            return data[i]

    sampler = ShardedSampler(20, shuffle=False, num_replicas=1, rank=0)
    loader = PrefetchLoader(DS(), sampler, 4, lambda xs: xs, num_workers=3)
    batches = list(loader)
    assert len(batches) == 5
    assert sorted(x for b in batches for x in b) == data


def test_val_transform_rescales_boxes_with_frames():
    """make_val_transform must resize boxes along with the frames (the
    reference's T.RandomResize([360], max_size=640)); otherwise Normalize
    divides original-resolution coords by the resized dims."""
    from tce_rvos_tpu.data.transforms import make_val_transform

    h, w = 720, 1280
    frames = [np.zeros((h, w, 3), np.float32)]
    box = np.array([[320.0, 180.0, 960.0, 540.0]], np.float32)  # xyxy abs
    target = {"boxes": box.copy(),
              "masks": np.zeros((1, h, w), np.float32)}
    out_frames, out = make_val_transform()(frames, target)
    assert out_frames[0].shape[:2] == (360, 640)
    cx, cy, bw, bh = out["boxes"][0]
    # the box occupied the central 50% of the image in both axes
    assert np.allclose([cx, cy, bw, bh], [0.5, 0.5, 0.5, 0.5], atol=1e-3)


def test_prefetch_loader_drop_last_semantics():
    """torch parity (reference main.py:128,148): train drops the ragged
    tail, eval keeps it so every val sample is scored."""
    from tce_rvos_tpu.data.loader import PrefetchLoader, ShardedSampler

    data = list(range(10))

    class DS:
        def __len__(self):
            return len(data)

        def __getitem__(self, i):
            return data[i]

    sampler = ShardedSampler(10, shuffle=False, num_replicas=1, rank=0)
    train = PrefetchLoader(DS(), sampler, 4, lambda xs: xs, num_workers=2)
    assert len(train) == 2
    assert sorted(x for b in train for x in b) == list(range(8))

    val = PrefetchLoader(DS(), sampler, 4, lambda xs: xs, num_workers=2,
                         drop_last=False)
    assert len(val) == 3
    batches = list(val)
    assert [len(b) for b in batches] == [4, 4, 2]
    assert sorted(x for b in batches for x in b) == data


def test_prefetch_loader_early_abandon_stops_workers():
    """A consumer that breaks out mid-epoch (max_steps probes) must not
    leave worker threads parked forever in a blocking queue put."""
    import threading
    import time

    from tce_rvos_tpu.data.loader import PrefetchLoader, ShardedSampler

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return i

    sampler = ShardedSampler(64, shuffle=False, num_replicas=1, rank=0)
    loader = PrefetchLoader(DS(), sampler, 1, lambda xs: xs,
                            num_workers=2, prefetch=2)
    before = threading.active_count()
    it = iter(loader)
    next(it), next(it)
    it.close()  # abandon: generator finally sets stop
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "loader workers leaked"


def test_davis_eval_metrics_roundtrip():
    from tce_rvos_tpu.eval.davis_eval import (
        db_eval_boundary,
        db_eval_iou,
        db_statistics,
        evaluate_unsupervised,
    )

    gt = np.zeros((1, 4, 32, 32))
    gt[0, :, 8:24, 8:24] = 1
    perfect = gt.copy()
    j, f = evaluate_unsupervised(gt, perfect)
    assert np.allclose(j, 1.0) and np.allclose(f, 1.0)
    # half-overlap proposal scores below the perfect one
    half = np.zeros_like(gt)
    half[0, :, 8:24, 8:16] = 1
    j2, _ = evaluate_unsupervised(gt, np.concatenate([half, perfect]))
    assert np.allclose(j2, 1.0)  # hungarian picks the perfect proposal
    m, r, d = db_statistics(np.array([1.0, 0.8, 0.6, 0.4]))
    assert 0.69 < m < 0.71 and r == 0.75


def test_a2d_eval_metrics():
    from tce_rvos_tpu.eval.a2d_eval import (
        calculate_map,
        calculate_precision_at_k_and_iou_metrics,
    )
    from tce_rvos_tpu.utils import rle

    gt_mask = np.zeros((16, 16), np.uint8)
    gt_mask[4:12, 4:12] = 1
    gt = {"img0": rle.encode(gt_mask)}
    preds = [{"image_id": "img0", "score": 0.9, "rle": rle.encode(gt_mask)}]
    p_at_k, overall, mean = calculate_precision_at_k_and_iou_metrics(gt, preds)
    assert p_at_k == [1.0] * 5 and overall == 1.0 and mean == 1.0
    m = calculate_map(gt, preds)
    assert m["mAP 0.5:0.95"] > 0.99


def test_node_sharded_sampler_per_node_ownership():
    """NodeShardedSampler (reference NodeDistributedSampler semantics,
    datasets/samplers.py:75-139): a process only ever draws indices owned by
    its NODE (index % local_size == local_rank), the node's processes
    partition the node shard, and the union covers every index."""
    from tce_rvos_tpu.data.loader import NodeShardedSampler

    n, world, local_size = 37, 4, 2  # 2 nodes x 2 processes
    all_idx = []
    for rank in range(world):
        s = NodeShardedSampler(
            n, shuffle=True, seed=3, num_replicas=world, rank=rank,
            local_rank=rank % local_size, local_size=local_size,
        )
        idx = list(s)
        assert len(idx) == len(s)
        # node ownership: this process's node caches exactly these indices
        assert all(i % local_size == rank % local_size for i in idx), rank
        all_idx.extend(idx)
    # padded union covers the dataset
    assert set(all_idx) == set(range(n))
    # epoch reshuffles deterministically
    s0 = NodeShardedSampler(n, seed=3, num_replicas=world, rank=0,
                            local_rank=0, local_size=local_size)
    a = list(s0)
    s0.set_epoch(1)
    assert list(s0) != a


def test_photometric_distort_structure():
    """Reference stochastic structure (transforms_video.py:396-421): jitter
    parameters are drawn fresh PER FRAME (not once per clip), and the
    lighting-noise channel permutation actually fires. Seeded, so the
    assertions are deterministic."""
    import random as _random

    from tce_rvos_tpu.data.transforms import PhotometricDistort

    rng = _random.Random(0)
    t = PhotometricDistort(rng=rng)
    # constant grey clip: any applied jitter shows up as a per-frame shift
    frames = [np.full((8, 8, 3), 0.5, np.float32) for _ in range(16)]
    out, _ = t(frames, {})
    assert all(f.shape == (8, 8, 3) for f in out)
    assert all(f.min() >= 0.0 and f.max() <= 1.0 for f in out)
    # per-frame draws: with 16 frames and p=0.5 brightness/contrast, the
    # per-frame means must NOT all be equal (a clip-level draw would shift
    # every frame identically)
    means = np.array([f.mean() for f in out])
    assert means.std() > 1e-4, means
    # channel-swap lighting noise: distinguishable on a channel-asymmetric
    # frame — over 64 seeded frames at p=0.5 some permutation must fire
    base = np.zeros((4, 4, 3), np.float32)
    base[..., 0] = 0.9  # red-dominant
    rng2 = _random.Random(1)
    t2 = PhotometricDistort(rng=rng2)
    out2, _ = t2([base.copy() for _ in range(64)], {})
    swapped = sum(1 for f in out2 if f[..., 0].mean() < f[..., 1:].mean(axis=(0, 1)).max())
    assert swapped > 0
