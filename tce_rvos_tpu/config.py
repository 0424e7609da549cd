"""Typed configuration for TCE-RVOS-TPU.

Mirrors every flag of the reference argparse tree (/root/reference/opts.py:3-156)
as frozen dataclasses, with the reference's footguns fixed:
  * ``f_extra`` is defined here (the reference reads it in
    inference_ytvos.py:136 / datasets/refexp2seq.py:31 but never defines it);
    default 0.
  * ``vlblock`` keeps the reference's *effective* default (ON — opts.py:154 is
    a store_false flag) but is an honest boolean here.

Frozen + hashable so a config can be closed over by jitted functions as a
static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def _num_classes_for(dataset_file: str, binary: bool) -> int:
    # mirrors /root/reference/models/tce_rvos.py:639-649
    if binary:
        return 1
    if dataset_file == "ytvos":
        return 65
    if dataset_file == "davis":
        return 78
    if dataset_file in ("a2d", "jhmdb"):
        return 1
    return 91  # coco


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference: opts.py:24-75, 147-154)."""

    # Backbone
    backbone: str = "resnet50"
    backbone_pretrained: Optional[str] = None
    use_checkpoint: bool = False          # activation rematerialisation
    dilation: bool = False                # DC5
    position_embedding: str = "sine"
    num_feature_levels: int = 4

    # Transformer
    enc_layers: int = 4
    dec_layers: int = 4
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 8
    num_frames: int = 5
    num_queries: int = 5
    dec_n_points: int = 4
    enc_n_points: int = 4
    pre_norm: bool = False
    two_stage: bool = False               # must stay False (reference asserts)
    with_box_refine: bool = False

    # Text encoder
    freeze_text_encoder: bool = False
    text_encoder_type: str = "roberta-base"
    # architecture knobs (defaults = roberta-base; shrink for unit tests)
    text_encoder_layers: int = 12
    text_encoder_hidden: int = 768
    text_encoder_heads: int = 12
    text_encoder_intermediate: int = 3072

    # Segmentation
    masks: bool = True
    mask_dim: int = 256
    controller_layers: int = 3
    dynamic_mask_channels: int = 8
    rel_coord: bool = True

    # Losses wired into the architecture
    aux_loss: bool = True
    vis_loss: bool = False
    contrastive: bool = False

    # TCE variants
    qtrans: bool = False                  # IQT: decoder self-attn across time
    f_token: int = 0                      # FTF: >0 learnable frame tokens; <0 LastLayerAsToken
    vlblock: bool = True                  # V-L blocks in the FPN decoder (reference default ON)

    # Dataset-derived
    dataset_file: str = "ytvos"
    binary: bool = False

    # Missing-in-reference flag, defined here (SURVEY.md §5 config footguns)
    f_extra: int = 0

    # TPU-specific
    compute_dtype: str = "float32"        # "bfloat16" for the fast path
    msda_impl: str = "xla"                # "xla" gather | "pallas" MXU kernel
    # temporal-trilinear MSDA (the reference CUDA's is_3d branch /
    # MSDeformAttnFunction3D export, never wired into a reference module):
    # encoder self-attn + decoder cross-attn sample a third fractional-frame
    # coordinate (models/transformer.py MSDeformAttnLayer.is_3d)
    msda_3d: bool = False

    @property
    def num_classes(self) -> int:
        return _num_classes_for(self.dataset_file, self.binary)

    @property
    def transformer_ffn_dim(self) -> int:
        # the deformable transformer uses dim_feedforward=1024 internally in the
        # reference default ctor but build() passes args.dim_feedforward (2048)
        return self.dim_feedforward


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / loss weights (reference: opts.py:5-17, 77-106)."""

    lr: float = 1e-4
    lr_backbone: float = 2e-5
    lr_backbone_names: Tuple[str, ...] = ("backbone.0",)
    lr_text_encoder: float = 1e-5
    lr_text_encoder_names: Tuple[str, ...] = ("text_encoder",)
    lr_linear_proj_names: Tuple[str, ...] = ("reference_points", "sampling_offsets")
    lr_linear_proj_mult: float = 1.0
    batch_size: int = 1
    weight_decay: float = 5e-4
    epochs: int = 10
    lr_drop: Tuple[int, ...] = (6, 8)
    clip_max_norm: float = 0.1

    # Matcher costs
    set_cost_class: float = 2.0
    set_cost_vis: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0
    set_cost_mask: float = 2.0
    set_cost_dice: float = 5.0

    # Loss coefficients
    mask_loss_coef: float = 2.0
    dice_loss_coef: float = 5.0
    cls_loss_coef: float = 2.0
    vis_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    eos_coef: float = 0.1
    focal_alpha: float = 0.25

    # --pretrain_enc: freeze everything except the deformable encoder
    # (reference main.py:57-61)
    pretrain_enc: bool = False
    # CyclicLR for the keep_fps protocol (reference main.py:241-249;
    # --cyclic_lr/--cyclic_lr_boundary are read by the reference's main.py
    # but missing from its opts.py — defined here, like the f_extra fix)
    cyclic_lr: bool = False
    cyclic_lr_boundary: Tuple[float, float] = (1e-5, 1e-4)

    # Fused flat AdamW (parallel/flat_adamw.py): same update math as the
    # per-leaf optax chain (parity-tested), ~10 ms/step less kernel-launch
    # overhead on TPU. Set False to use the optax reference chain.
    flat_opt: bool = True

    # mirror of ModelConfig.freeze_text_encoder for the optimizer: the
    # reference builds its param groups from requires_grad params only
    # (main.py:91-111), so a frozen text encoder receives NO update —
    # in particular no decoupled weight decay (grads are already zero via
    # stop_gradient in the model)
    freeze_text_encoder: bool = False

    seed: int = 42

    # PRNG implementation for the training-time dropout stream.
    # "unsafe_rbg" routes mask generation through the TPU's hardware
    # RngBitGenerator instead of computing threefry2x32 in VPU ops — the
    # flagship step generates ~200M dropout bits (FFN masks are
    # [25600, 2048] per encoder layer) and with remat the threefry work is
    # re-executed in the backward. Statistically identical dropout;
    # trajectories differ from threefry only in which bits are dropped.
    # Set "threefry2x32" for jax's default key-derived determinism.
    dropout_rng_impl: str = "unsafe_rbg"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset paths and sampling options (reference: opts.py:108-132, 147-152)."""

    dataset_file: str = "ytvos"
    coco_path: str = "data/coco"
    ytvos_path: str = "data/Refer_YouTube_VOS/rvos"
    mevis_path: str = "data/MeViS"
    davis_path: str = "/data/davis17"
    a2d_path: str = "/data/a2d_sentences"
    jhmdb_path: str = "data/jhmdb_sentences"
    max_skip: int = 3
    max_size: int = 640
    remove_difficult: bool = False
    num_workers: int = 4
    keep_fps: bool = False
    vid_aug: bool = False
    pretrain_enc: bool = False
    pretrain_coco: bool = False
    # per-node dataset sharding (reference --cache_mode +
    # NodeDistributedSampler, datasets/samplers.py:75-139)
    cache_mode: bool = False


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Test-time options (reference: opts.py:134-139)."""

    threshold: float = 0.5
    split: str = "valid"
    visualize: bool = False
    output_dir: str = "output"
    resume: str = ""
    # device fan-out replaces the reference's mp.Process-per-GPU sharding
    num_devices: int = 0   # 0 = all local devices


def flagship_config(**overrides) -> ModelConfig:
    """The WACV flagship training configuration
    (scripts/dist_train_test_ytvos_new.sh:21-24 in the reference):
    --with_box_refine --binary --f_token 8 --qtrans."""
    base = dict(with_box_refine=True, binary=True, f_token=8, qtrans=True)
    base.update(overrides)
    return ModelConfig(**base)
