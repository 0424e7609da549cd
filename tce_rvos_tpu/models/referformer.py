"""ReferFormer/TCE-RVOS model assembly — the full referring-VOS network.

Parity with reference models/tce_rvos.py:35-521 (class ReferFormer), built
TPU-first: one jittable pure function of (params, video, text, sizes), all
shapes static, channel-last features, the time axis folded into the batch
axis exactly where the reference folds it.

Pipeline (reference call stack SURVEY.md §3.2):
  backbone (b·t folded) -> per-level input_proj + early V-L fusion ->
  deformable transformer (FTF encoder / IQT decoder) -> class/box heads per
  decoder layer -> cross-modal FPN -> dynamic-conv mask head.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tce_rvos_tpu.config import ModelConfig
from tce_rvos_tpu.models import backbone_resnet
from tce_rvos_tpu.models.dynamic_head import (
    dynamic_head_param_counts,
    dynamic_mask_with_coords,
)
from tce_rvos_tpu.models.layers import MLP, FeatureResizer, GroupNorm
from tce_rvos_tpu.models.position_encoding import sine_pos_1d, sine_pos_2d
from tce_rvos_tpu.models.segmentation import (
    CrossModalFPNDecoder,
    VisionLanguageFusionModule,
)
from tce_rvos_tpu.models.text_encoder import RobertaModel
from tce_rvos_tpu.models.transformer import DeformableTransformer, MLPHead
from tce_rvos_tpu.utils.boxes import inverse_sigmoid
from tce_rvos_tpu.utils.interpolate import resize_mask_nearest

xavier = nn.initializers.xavier_uniform()


def _class_bias_init(num_classes: int):
    # focal-loss prior (reference tce_rvos.py:105-107)
    prior_prob = 0.01
    bias_value = -math.log((1 - prior_prob) / prior_prob)
    return nn.initializers.constant(bias_value)


class InputProj(nn.Module):
    """1x1 (or 3x3 stride-2 for the extra level) conv + GroupNorm(32)
    (reference tce_rvos.py:74-95)."""

    hidden_dim: int
    extra: bool = False

    @nn.compact
    def __call__(self, x):
        if self.extra:
            x = nn.Conv(
                self.hidden_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                kernel_init=xavier, name="conv",
            )(x)
        else:
            x = nn.Conv(self.hidden_dim, (1, 1), kernel_init=xavier, name="conv")(x)
        return GroupNorm(num_groups=32, name="norm")(x)


def build_backbone_module(cfg: ModelConfig):
    name = cfg.backbone
    if "video_swin" in name:
        from tce_rvos_tpu.models.video_swin import VideoSwinBackbone, video_swin_spec

        spec = video_swin_spec(name)
        return (
            VideoSwinBackbone(
                spec=spec, use_checkpoint=cfg.use_checkpoint, name="backbone"
            ),
            spec["strides"],
            spec["channels"],
            True,  # temporal backbone: takes [b, t, H, W, 3]
        )
    if "swin" in name:
        from tce_rvos_tpu.models.swin import SwinBackbone, swin_spec

        spec = swin_spec(name)
        return (
            SwinBackbone(
                spec=spec, use_checkpoint=cfg.use_checkpoint, name="backbone"
            ),
            spec["strides"],
            spec["channels"],
            False,
        )
    if "x3d" in name:
        from tce_rvos_tpu.models.x3d import X3DBackbone, x3d_spec

        spec = x3d_spec(name)
        return (
            X3DBackbone(spec=spec, name="backbone"),
            spec["strides"],
            spec["channels"],
            True,
        )
    spec = backbone_resnet.RESNET_SPECS[name]
    strides, channels = backbone_resnet.resnet_strides_channels(name, cfg.dilation)
    return (
        backbone_resnet.ResNet(layers=spec["layers"], dilation=cfg.dilation, name="backbone"),
        strides,
        channels,
        False,
    )


class ReferFormer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        video: Optional[jnp.ndarray],  # [bv, t, H, W, 3] normalized frames
        video_mask: jnp.ndarray,   # [bv, t, H, W] True=pad
        text_ids: Optional[jnp.ndarray] = None,     # [b, S] int32
        text_attn_mask: Optional[jnp.ndarray] = None,  # [b, S] 1=token 0=pad
        sizes: Optional[jnp.ndarray] = None,  # [bv, 2] (h, w) unpadded size
        valid_indices: Optional[jnp.ndarray] = None,  # [b] (a2d: t -> 1)
        deterministic: bool = True,
        precomputed_feats: Optional[Sequence[jnp.ndarray]] = None,
        backbone_only: bool = False,
    ):
        """Serving split: the backbone (+nothing else) is text-INDEPENDENT —
        fusion enters only after input_proj (reference tce_rvos.py:258-307) —
        so inference can run it once per clip window and reuse the features
        for every expression of the video:

          * ``backbone_only=True``: run just the backbone, return the feature
            pyramid (list of [(bv t), h, w, c]).
          * ``precomputed_feats=...``: skip the backbone, consume a pyramid
            from a previous ``backbone_only`` call. When the text batch b is
            a multiple of the video batch bv (expression batching: E
            expressions over the same frames), the features/masks/sizes are
            tiled b//bv times so the text-conditioned trunk runs all
            expressions in one batched program.
        """
        cfg = self.cfg
        c = cfg.hidden_dim
        bv, t_in = video_mask.shape[0], video_mask.shape[1]
        b = bv if text_ids is None else text_ids.shape[0]

        # ---- backbone (res2..res5) ----
        if precomputed_feats is None:
            backbone, strides, channels, is_temporal = build_backbone_module(cfg)
            if is_temporal:
                feats = backbone(video, deterministic=deterministic)
            else:
                frames = video.reshape((bv * t_in,) + video.shape[2:])
                feats = backbone(frames, deterministic=deterministic)
            if backbone_only:
                return feats
        else:
            feats = list(precomputed_feats)

        if b != bv:
            # expression batching: tile the video-side tensors E=b//bv times.
            # (b t) flattening is b-major, so tiling the (bv t) axis yields
            # exactly the layout a b-batch forward would produce.
            assert b % bv == 0, (b, bv)
            e = b // bv
            feats = [jnp.tile(f, (e,) + (1,) * (f.ndim - 1)) for f in feats]
            video_mask = jnp.tile(video_mask, (e, 1, 1, 1))
            sizes = jnp.tile(sizes, (e, 1))
        frame_mask = video_mask.reshape((b * t_in,) + video_mask.shape[2:])
        feat_masks = [
            resize_mask_nearest(frame_mask, (f.shape[1], f.shape[2])) for f in feats
        ]
        poses = [sine_pos_2d(m, num_pos_feats=c // 2) for m in feat_masks]

        t = t_in
        if valid_indices is not None:
            # A2D/JHMDB: keep only the single annotated frame per clip
            # (reference tce_rvos.py:234-243)
            sel = jnp.arange(b) * t_in + valid_indices  # into the (b t) axis
            feats = [f[sel] for f in feats]
            feat_masks = [m[sel] for m in feat_masks]
            poses = [p[sel] for p in poses]
            frame_mask = frame_mask[sel]
            t = 1

        # ---- text ----
        text_hidden, text_pooled = RobertaModel(
            hidden=cfg.text_encoder_hidden,
            layers=cfg.text_encoder_layers,
            heads=cfg.text_encoder_heads,
            intermediate=cfg.text_encoder_intermediate,
            name="text_encoder",
        )(text_ids, text_attn_mask, deterministic=deterministic)
        if cfg.freeze_text_encoder:
            text_hidden = jax.lax.stop_gradient(text_hidden)
            text_pooled = jax.lax.stop_gradient(text_pooled)
        resizer = FeatureResizer(c, dropout=0.1, name="resizer")
        text_features = resizer(text_hidden, deterministic=deterministic)  # [b, S, c]
        text_sentence = resizer(text_pooled, deterministic=deterministic)  # [b, c]
        text_pad_mask = text_attn_mask == 0
        text_pos = sine_pos_1d(text_pad_mask, num_pos_feats=c)  # [b, S, c]

        fusion = VisionLanguageFusionModule(d_model=c, nhead=8, name="fusion_module")

        def fuse(x):  # x: [(b t), h, w, c]
            n, h, w, _ = x.shape
            x = x.reshape(b, t * h * w, x.shape[-1])
            x = fusion(
                x, text_features, memory_key_padding_mask=text_pad_mask,
                pos=text_pos, deterministic=deterministic,
            )
            return x.reshape(n, h, w, -1)

        # ---- per-level projection + early fusion (res3..res5 + extra) ----
        srcs, masks_l = [], []
        for l, feat in enumerate(feats[-3:]):
            proj = InputProj(c, name=f"input_proj_{l}")(feat)
            srcs.append(fuse(proj))
            masks_l.append(feat_masks[len(feats) - 3 + l])
        if cfg.num_feature_levels > 3:
            for l in range(3, cfg.num_feature_levels):
                src_in = feats[-1] if l == 3 else srcs[-1]
                proj = InputProj(c, extra=True, name=f"input_proj_{l}")(src_in)
                m = resize_mask_nearest(frame_mask, (proj.shape[1], proj.shape[2]))
                srcs.append(fuse(proj))
                masks_l.append(m)
                poses.append(sine_pos_2d(m, num_pos_feats=c // 2))

        # ---- transformer ----
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, c)
        )
        text_embed = jnp.broadcast_to(
            text_sentence[:, None, None, :], (b, t, cfg.num_queries, c)
        )
        tr = DeformableTransformer(
            d_model=c,
            nhead=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points,
            enc_n_points=cfg.enc_n_points,
            q_trans=cfg.qtrans,
            f_token=cfg.f_token,
            with_box_refine=cfg.with_box_refine,
            use_checkpoint=cfg.use_checkpoint,
            msda_impl=cfg.msda_impl,
            msda_3d=cfg.msda_3d,
            name="transformer",
        )(
            srcs, text_embed, masks_l, poses[len(feats) - 3 :][: cfg.num_feature_levels],
            query_embed, deterministic=deterministic,
        )
        hs = tr["hs"]  # [l, (b t), q, c]
        num_pred = cfg.dec_layers

        # ---- class / box / visibility heads (reference tce_rvos.py:326-363) ----
        # with_box_refine clones heads per layer; otherwise one shared module
        # is called for every layer (reference tce_rvos.py:116-131)
        if cfg.with_box_refine:
            class_heads = [
                nn.Dense(
                    cfg.num_classes, bias_init=_class_bias_init(cfg.num_classes),
                    name=f"class_embed_{lvl}",
                )
                for lvl in range(num_pred)
            ]
            vis_heads = [
                nn.Dense(1, bias_init=_class_bias_init(1), name=f"visible_embed_{lvl}")
                for lvl in range(num_pred)
            ] if cfg.vis_loss else None
            bbox_head = None
        else:
            shared_cls = nn.Dense(
                cfg.num_classes, bias_init=_class_bias_init(cfg.num_classes),
                name="class_embed",
            )
            class_heads = [shared_cls] * num_pred
            if cfg.vis_loss:
                shared_vis = nn.Dense(
                    1, bias_init=_class_bias_init(1), name="visible_embed"
                )
                vis_heads = [shared_vis] * num_pred
            else:
                vis_heads = None
            bbox_head = MLPHead(c, 4, 3, last_bias_low_wh=True, name="bbox_embed")

        outputs_classes, outputs_coords, outputs_vis = [], [], []
        for lvl in range(num_pred):
            outputs_classes.append(class_heads[lvl](hs[lvl]))
            if cfg.vis_loss:
                outputs_vis.append(vis_heads[lvl](hs[lvl]))
            if cfg.with_box_refine:
                outputs_coords.append(tr["coords"][lvl])
            else:
                tmp = bbox_head(hs[lvl])
                ref = inverse_sigmoid(tr["init_reference"])
                coord = jnp.concatenate([tmp[..., :2] + ref, tmp[..., 2:]], axis=-1)
                outputs_coords.append(nn.sigmoid(coord))

        def to_btq(x):
            return x.reshape((x.shape[0], b, t) + x.shape[2:])

        outputs_class = to_btq(jnp.stack(outputs_classes))  # [l, b, t, q, K]
        outputs_coord = to_btq(jnp.stack(outputs_coords))   # [l, b, t, q, 4]

        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
        }
        if cfg.vis_loss:
            outputs_visible = to_btq(jnp.stack(outputs_vis))
            out["pred_visible"] = outputs_visible[-1]
        if cfg.contrastive:
            mem = tr["memory"].reshape(b, t, tr["memory"].shape[1], c).mean(axis=2)
            sim = jnp.sum(mem * text_sentence[:, None, :], axis=-1) / (
                jnp.linalg.norm(mem, axis=-1)
                * jnp.linalg.norm(text_sentence, axis=-1)[:, None]
                + 1e-6
            )
            out["contrastive"] = sim  # [b, t]

        # ---- segmentation ----
        mask_features = CrossModalFPNDecoder(
            conv_dim=c, mask_dim=cfg.mask_dim,
            dim_feedforward=cfg.dim_feedforward, vlblock=cfg.vlblock,
            name="pixel_decoder",
        )(
            list(zip(feats, feat_masks)),
            text_features, text_pad_mask, text_pos,
            poses[:4],
            tr["memory_features"],
            t,
            deterministic=deterministic,
        )
        hmf, wmf = mask_features.shape[1], mask_features.shape[2]
        mask_features = mask_features.reshape(b, t, hmf, wmf, cfg.mask_dim)

        weight_nums, bias_nums = dynamic_head_param_counts(
            cfg.mask_dim, cfg.dynamic_mask_channels, cfg.controller_layers,
            cfg.rel_coord,
        )
        num_gen_params = sum(weight_nums) + sum(bias_nums)
        controller = MLP(c, num_gen_params, 3, name="controller")

        outputs_seg_masks = []
        for lvl in range(num_pred):
            params_lvl = controller(hs[lvl]).reshape(b, t, cfg.num_queries, -1)
            refs = tr["inter_references"][lvl][..., :2].reshape(
                b, t, cfg.num_queries, 2
            )
            seg = dynamic_mask_with_coords(
                mask_features, params_lvl, refs, sizes,
                channels=cfg.dynamic_mask_channels,
                num_layers=cfg.controller_layers,
                rel_coord=cfg.rel_coord,
            )
            outputs_seg_masks.append(seg)  # [b, t, q, h, w]
        out["pred_masks"] = outputs_seg_masks[-1]

        if cfg.aux_loss:
            aux = []
            for i in range(num_pred - 1):
                d = {
                    "pred_logits": outputs_class[i],
                    "pred_boxes": outputs_coord[i],
                    "pred_masks": outputs_seg_masks[i],
                }
                if cfg.vis_loss:
                    d["pred_visible"] = outputs_visible[i]
                aux.append(d)
            out["aux_outputs"] = aux

        # reference points of the last layer's input, for visualization
        # (reference tce_rvos.py:387-391)
        ref_vis = tr["inter_references"][-2][..., :2] if num_pred > 1 else tr[
            "init_reference"
        ]
        out["reference_points"] = ref_vis.reshape(b, t, cfg.num_queries, 2)
        out["inter_samples"] = tr["inter_samples"]
        out["memory"] = tr["memory"]
        return out
