"""train.main() end-to-end on a synthetic Ref-YouTube-VOS root: CLI ->
configs -> dataset/loader -> jitted train step on the 8-device CPU mesh ->
checkpoint save -> --resume picks up at the next epoch (reference
main.py:213-275 loop semantics). The only test that drives the training
ENTRY POINT rather than its pieces."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full (tiny) train-step compile on 1-core CPU

TINY_TEXT = dict(
    text_encoder_layers=1,
    text_encoder_hidden=32,
    text_encoder_heads=2,
    text_encoder_intermediate=64,
)


@pytest.fixture(scope="module")
def ytvos_root(tmp_path_factory):
    """Synthetic Ref-YouTube-VOS train split: 2 videos x 4 frames."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ytvos_main")
    rng = np.random.RandomState(0)
    meta = {"videos": {}}
    meta_exp = {"videos": {}}
    for v in ("vid_a", "vid_b"):
        frames = [f"{i:05d}" for i in range(4)]
        os.makedirs(root / "train" / "JPEGImages" / v)
        os.makedirs(root / "train" / "Annotations" / v)
        for f in frames:
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "train" / "JPEGImages" / v / f"{f}.jpg")
            mask = np.zeros((48, 64), np.uint8)
            mask[10:30, 20:40] = 2
            pal = Image.fromarray(mask, mode="P")
            pal.putpalette([c for i in range(256) for c in (i, i, i)])
            pal.save(root / "train" / "Annotations" / v / f"{f}.png", bits=8)
        meta["videos"][v] = {"objects": {"2": {"category": "cat"}}}
        meta_exp["videos"][v] = {
            "frames": frames,
            "expressions": {"0": {"exp": "the cat on the left", "obj_id": "2"}},
        }
    with open(root / "train" / "meta.json", "w") as fh:
        json.dump(meta, fh)
    os.makedirs(root / "meta_expressions" / "train")
    with open(root / "meta_expressions" / "train" /
              "meta_expressions.json", "w") as fh:
        json.dump(meta_exp, fh)
    return root


def test_train_main_one_epoch_then_resume(ytvos_root, tmp_path, monkeypatch):
    import dataclasses

    import tce_rvos_tpu.cli as cli
    from tce_rvos_tpu.train import main

    orig = cli.model_config_from_args
    monkeypatch.setattr(
        cli, "model_config_from_args",
        lambda args: dataclasses.replace(orig(args), **TINY_TEXT),
    )

    out = tmp_path / "out"
    argv = [
        "--dataset_file", "ytvos", "--ytvos_path", str(ytvos_root),
        "--output_dir", str(out), "--batch_size", "1", "--num_frames", "2",
        "--enc_layers", "1", "--dec_layers", "1", "--dim_feedforward", "32",
        "--hidden_dim", "64", "--nheads", "2", "--binary",
        "--max_size", "96", "--num_workers", "0", "--lr_drop", "100",
    ]

    main(argv + ["--epochs", "1"])

    ckpt = out / "checkpoint0000"
    assert (ckpt / "variables.msgpack").exists()
    assert (ckpt / "opt_state.msgpack").exists()
    with open(out / "log.txt") as fh:
        logs = [json.loads(line) for line in fh]
    assert logs[-1]["epoch"] == 0
    assert np.isfinite(logs[-1]["train_loss"])
    # the live base-group LR (reference logs param_groups[0]['lr']): lr_drop
    # is far away, so this must be the undropped base LR, not a stale 0
    assert logs[-1]["train_lr"] == pytest.approx(1e-4)
    with open(out / "checkpoint0000" / "meta.json") as fh:
        steps_per_epoch = json.load(fh)["step"]
    assert steps_per_epoch > 0

    # resume: exactly one more epoch (1), appended to the same log
    main(argv + ["--epochs", "2", "--resume", str(out / "checkpoint")])
    with open(out / "log.txt") as fh:
        logs = [json.loads(line) for line in fh]
    assert [l["epoch"] for l in logs] == [0, 1]
    assert logs[-1]["train_lr"] == pytest.approx(1e-4)
    assert (out / "checkpoint0001" / "variables.msgpack").exists()
    with open(out / "checkpoint0001" / "meta.json") as fh:
        meta = json.load(fh)
    # resumed step counting continues from the restored state
    assert meta["epoch"] == 1 and meta["step"] == 2 * steps_per_epoch
