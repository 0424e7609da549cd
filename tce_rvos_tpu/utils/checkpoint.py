"""PyTorch-checkpoint ingestion: reference state_dicts -> flax variables.

The compatibility contract (SURVEY.md §5 checkpoint/resume): reference
checkpoints store keys like ``backbone.0.body.layer1.0.conv1.weight``,
``transformer.encoder.layers.0.self_attn.sampling_offsets.weight``,
``text_encoder.encoder.layer.3.attention.self.query.weight``. This module
maps every flax parameter leaf to its torch key + layout transform, loads
with strict=False semantics (missing/unexpected keys reported, like
main.py:161-180), and handles:

  * Linear:  [out, in]      -> kernel [in, out]       (transpose)
  * Conv2d:  [out,in,kh,kw] -> kernel [kh,kw,in,out]
  * torch MultiheadAttention packed in_proj_weight/bias -> q/k/v Dense
  * LayerNorm/GroupNorm weight -> scale
  * FrozenBatchNorm buffers -> the 'frozen' variable collection
  * Embedding weight -> embedding

Loading torch ``.pth`` files requires torch (CPU) on the host; tensors are
converted to numpy immediately.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import traverse_util

Transform = Callable[[np.ndarray], np.ndarray]


def _t(x):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(x.T)


def _conv(x):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _id(x):
    return np.asarray(x)


def _conv3d(x):  # OIDHW -> DHWIO
    return np.ascontiguousarray(np.transpose(x, (2, 3, 4, 1, 0)))


def _conv3d_tsum(x):
    """Conv3d weight with temporal-sum surgery: loading a (2,4,4)-patch
    Kinetics checkpoint into our (1,4,4) patch embed sums the temporal dim
    (reference video_swin_transformer.py:656-659)."""
    if x.shape[2] != 1:
        x = x.sum(axis=2, keepdims=True)
    return _conv3d(x)


def load_torch_file(path: str, with_meta: bool = False):
    import torch

    if path.startswith(("http://", "https://")):
        # URL checkpoints via the torch.hub cache, matching the reference's
        # --resume handling (main.py:184-186)
        ckpt = torch.hub.load_state_dict_from_url(
            path, map_location="cpu", check_hash=False
        )
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    # the reference stores the finished epoch alongside the weights
    # (main.py:271-275)
    meta = (
        {"epoch": int(ckpt["epoch"])}
        if isinstance(ckpt, dict) and "epoch" in ckpt
        else {}
    )
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}
    return (sd, meta) if with_meta else sd


# ---------------------------------------------------------------------------
# flax path -> (torch key, transform).  Paths are '/'-joined strings of the
# flattened variables dict, prefixed with the collection ('params' or
# 'frozen').
# ---------------------------------------------------------------------------


def _mha(flax_prefix: str, torch_prefix: str, leaf: str) -> Optional[Tuple[str, Transform]]:
    """Map one leaf of our q/k/v/out MultiheadAttention to torch's packed
    layout. Returns (torch_key, transform-with-slice)."""
    m = re.match(rf"{re.escape(flax_prefix)}/(q|k|v|out)_proj/(kernel|bias)$", leaf)
    if not m:
        return None
    which, kind = m.groups()
    if which == "out":
        if kind == "kernel":
            return f"{torch_prefix}.out_proj.weight", _t
        return f"{torch_prefix}.out_proj.bias", _id
    idx = {"q": 0, "k": 1, "v": 2}[which]

    if kind == "kernel":
        def tr(x, idx=idx):
            c = x.shape[0] // 3
            return _t(x[idx * c : (idx + 1) * c])

        return f"{torch_prefix}.in_proj_weight", tr

    def tr(x, idx=idx):
        c = x.shape[0] // 3
        return np.asarray(x[idx * c : (idx + 1) * c])

    return f"{torch_prefix}.in_proj_bias", tr


def _norm_leaf(kind: str) -> Tuple[str, Transform]:
    return ("weight", _id) if kind == "scale" else ("bias", _id)


def flax_to_torch_key(path: str) -> Optional[Tuple[str, Transform]]:
    """Translate one flattened flax variable path to (torch_key, transform).
    Returns None for params with no reference counterpart."""

    # ---------------- frozen batchnorm buffers ----------------
    m = re.match(r"frozen/backbone/(.+)$", path)
    if m:
        rest = m.group(1)
        mm = re.match(r"layer(\d)_(\d+)/(bn\d|downsample_bn)/(\w+)$", rest)
        if mm:
            l, b, bn, leaf = mm.groups()
            tbn = "downsample.1" if bn == "downsample_bn" else bn
            return f"backbone.0.body.layer{l}.{b}.{tbn}.{leaf}", _id
        mm = re.match(r"bn1/(\w+)$", rest)
        if mm:
            return f"backbone.0.body.bn1.{mm.group(1)}", _id
        return None

    # x3d BatchNorm running stats
    m = re.match(r"batch_stats/backbone/(.+)$", path)
    if m:
        res = _x3d_bn_base(m.group(1))
        if res:
            base, leaf = res
            return f"backbone.0.body.{base}.{leaf}", _id
        return None

    if not path.startswith("params/"):
        return None
    p = path[len("params/") :]

    # ---------------- resnet backbone ----------------
    m = re.match(r"backbone/conv1/kernel$", p)
    if m:
        return "backbone.0.body.conv1.weight", _conv
    m = re.match(r"backbone/layer(\d)_(\d+)/(conv\d|downsample_conv)/kernel$", p)
    if m:
        l, b, conv = m.groups()
        tconv = "downsample.0" if conv == "downsample_conv" else conv
        return f"backbone.0.body.layer{l}.{b}.{tconv}.weight", _conv

    # ---------------- swin / video-swin backbone ----------------
    m = re.match(r"backbone/(.+)$", p)
    if m:
        r = m.group(1)
        bb = "backbone.0.body"
        if r == "patch_embed_proj/kernel":
            # 2D swin -> Conv2d; video swin -> Conv3d with temporal surgery;
            # disambiguated by rank at transform time
            def tr(x):
                return _conv3d_tsum(x) if x.ndim == 5 else _conv(x)

            return f"{bb}.patch_embed.proj.weight", tr
        if r == "patch_embed_proj/bias":
            return f"{bb}.patch_embed.proj.bias", _id
        m2 = re.match(r"patch_embed_norm/(scale|bias)$", r)
        if m2:
            leaf, t = _norm_leaf(m2.group(1))
            return f"{bb}.patch_embed.norm.{leaf}", t
        m2 = re.match(r"out_norm_(\d)/(scale|bias)$", r)
        if m2:
            i, k = m2.groups()
            leaf, t = _norm_leaf(k)
            return f"{bb}.norm{i}.{leaf}", t
        m2 = re.match(r"layers_(\d)_blocks_(\d+)/(.+)$", r)
        if m2:
            i, j, rest = m2.groups()
            base = f"{bb}.layers.{i}.blocks.{j}"
            table = {
                "attn/relative_position_bias_table": (
                    f"{base}.attn.relative_position_bias_table", _id),
                "attn/qkv/kernel": (f"{base}.attn.qkv.weight", _t),
                "attn/qkv/bias": (f"{base}.attn.qkv.bias", _id),
                "attn/proj/kernel": (f"{base}.attn.proj.weight", _t),
                "attn/proj/bias": (f"{base}.attn.proj.bias", _id),
                "mlp_fc1/kernel": (f"{base}.mlp.fc1.weight", _t),
                "mlp_fc1/bias": (f"{base}.mlp.fc1.bias", _id),
                "mlp_fc2/kernel": (f"{base}.mlp.fc2.weight", _t),
                "mlp_fc2/bias": (f"{base}.mlp.fc2.bias", _id),
            }
            if rest in table:
                return table[rest]
            m3 = re.match(r"norm(\d)/(scale|bias)$", rest)
            if m3:
                n_, k = m3.groups()
                leaf, t = _norm_leaf(k)
                return f"{base}.norm{n_}.{leaf}", t
            return None
        m2 = re.match(r"layers_(\d)_downsample/(norm|reduction)/(scale|bias|kernel)$", r)
        if m2:
            i, mod, k = m2.groups()
            base = f"{bb}.layers.{i}.downsample"
            if mod == "reduction":
                return f"{base}.reduction.weight", _t
            leaf, t = _norm_leaf(k)
            return f"{base}.norm.{leaf}", t
        # video swin: the reference wrapper HOISTS each stage's downsample
        # into a `downsamples` ModuleList (video_swin_transformer.py:666-670),
        # so checkpoints spell them `...body.downsamples.{i}.*`; our flax
        # module mirrors that layout (models/video_swin.py)
        m2 = re.match(r"downsamples_(\d)/(norm|reduction)/(scale|bias|kernel)$", r)
        if m2:
            i, mod, k = m2.groups()
            base = f"{bb}.downsamples.{i}"
            if mod == "reduction":
                return f"{base}.reduction.weight", _t
            leaf, t = _norm_leaf(k)
            return f"{base}.norm.{leaf}", t

        # ---------------- x3d backbone ----------------
        res = _x3d_leaf(bb, r)
        if res:
            return res
        return None

    # ---------------- text encoder (HF roberta layout) ----------------
    m = re.match(r"text_encoder/(.+)$", p)
    if m:
        r = m.group(1)
        te = "text_encoder"
        simple = {
            "word_embeddings/embedding": (f"{te}.embeddings.word_embeddings.weight", _id),
            "position_embeddings/embedding": (
                f"{te}.embeddings.position_embeddings.weight", _id),
            "token_type_embeddings/embedding": (
                f"{te}.embeddings.token_type_embeddings.weight", _id),
            "embeddings_norm/scale": (f"{te}.embeddings.LayerNorm.weight", _id),
            "embeddings_norm/bias": (f"{te}.embeddings.LayerNorm.bias", _id),
            "pooler_dense/kernel": (f"{te}.pooler.dense.weight", _t),
            "pooler_dense/bias": (f"{te}.pooler.dense.bias", _id),
        }
        if r in simple:
            return simple[r]
        mm = re.match(r"layer_(\d+)/(.+)$", r)
        if mm:
            i, rest = mm.groups()
            base = f"{te}.encoder.layer.{i}"
            table = {
                "attention_self/query/kernel": (f"{base}.attention.self.query.weight", _t),
                "attention_self/query/bias": (f"{base}.attention.self.query.bias", _id),
                "attention_self/key/kernel": (f"{base}.attention.self.key.weight", _t),
                "attention_self/key/bias": (f"{base}.attention.self.key.bias", _id),
                "attention_self/value/kernel": (f"{base}.attention.self.value.weight", _t),
                "attention_self/value/bias": (f"{base}.attention.self.value.bias", _id),
                "attention_output_dense/kernel": (f"{base}.attention.output.dense.weight", _t),
                "attention_output_dense/bias": (f"{base}.attention.output.dense.bias", _id),
                "attention_output_norm/scale": (f"{base}.attention.output.LayerNorm.weight", _id),
                "attention_output_norm/bias": (f"{base}.attention.output.LayerNorm.bias", _id),
                "intermediate_dense/kernel": (f"{base}.intermediate.dense.weight", _t),
                "intermediate_dense/bias": (f"{base}.intermediate.dense.bias", _id),
                "output_dense/kernel": (f"{base}.output.dense.weight", _t),
                "output_dense/bias": (f"{base}.output.dense.bias", _id),
                "output_norm/scale": (f"{base}.output.LayerNorm.weight", _id),
                "output_norm/bias": (f"{base}.output.LayerNorm.bias", _id),
            }
            if rest in table:
                return table[rest]
        return None

    # ---------------- resizer ----------------
    m = re.match(r"resizer/fc/(kernel|bias)$", p)
    if m:
        return ("resizer.fc.weight", _t) if m.group(1) == "kernel" else ("resizer.fc.bias", _id)
    m = re.match(r"resizer/layer_norm/(scale|bias)$", p)
    if m:
        leaf, tr = _norm_leaf(m.group(1))
        return f"resizer.layer_norm.{leaf}", tr

    # ---------------- fusion module ----------------
    r = _mha("fusion_module/multihead_attn", "fusion_module.multihead_attn", p)
    if r:
        return r

    # ---------------- input projections ----------------
    m = re.match(r"input_proj_(\d)/conv/(kernel|bias)$", p)
    if m:
        l, k = m.groups()
        return (
            (f"input_proj.{l}.0.weight", _conv)
            if k == "kernel"
            else (f"input_proj.{l}.0.bias", _id)
        )
    m = re.match(r"input_proj_(\d)/norm/(scale|bias)$", p)
    if m:
        l, k = m.groups()
        leaf, tr = _norm_leaf(k)
        return f"input_proj.{l}.1.{leaf}", tr

    # ---------------- query embed / heads ----------------
    if p == "query_embed":
        return "query_embed.weight", _id
    m = re.match(r"class_embed(?:_(\d+))?/(kernel|bias)$", p)
    if m:
        l, k = m.groups()
        l = l or "0"
        return (
            (f"class_embed.{l}.weight", _t)
            if k == "kernel"
            else (f"class_embed.{l}.bias", _id)
        )
    m = re.match(r"visible_embed(?:_(\d+))?/(kernel|bias)$", p)
    if m:
        l, k = m.groups()
        l = l or "0"
        return (
            (f"visible_embed.{l}.weight", _t)
            if k == "kernel"
            else (f"visible_embed.{l}.bias", _id)
        )
    m = re.match(r"bbox_embed/layers_(\d)/(kernel|bias)$", p)
    if m:
        i, k = m.groups()
        return (
            (f"bbox_embed.0.layers.{i}.weight", _t)
            if k == "kernel"
            else (f"bbox_embed.0.layers.{i}.bias", _id)
        )
    m = re.match(r"controller/layers_(\d)/(kernel|bias)$", p)
    if m:
        i, k = m.groups()
        return (
            (f"controller.layers.{i}.weight", _t)
            if k == "kernel"
            else (f"controller.layers.{i}.bias", _id)
        )

    # ---------------- transformer ----------------
    m = re.match(r"transformer/(.+)$", p)
    if m:
        r = m.group(1)
        if r == "level_embed":
            return "transformer.level_embed", _id
        if r == "memory_bus":
            return "transformer.encoder.memory_bus", _id
        if r == "memory_pos":
            return "transformer.encoder.memory_pos", _id
        m2 = re.match(r"reference_points/(kernel|bias)$", r)
        if m2:
            return (
                ("transformer.reference_points.weight", _t)
                if m2.group(1) == "kernel"
                else ("transformer.reference_points.bias", _id)
            )
        m2 = re.match(r"bbox_embed_(\d+)/layers_(\d)/(kernel|bias)$", r)
        if m2:
            l, i, k = m2.groups()
            return (
                (f"bbox_embed.{l}.layers.{i}.weight", _t)
                if k == "kernel"
                else (f"bbox_embed.{l}.layers.{i}.bias", _id)
            )
        m2 = re.match(r"(encoder|decoder)_layers_(\d+)/(.+)$", r)
        if m2:
            side, i, rest = m2.groups()
            base = f"transformer.{side}.layers.{i}"
            return _transformer_layer_leaf(base, rest)
        return None

    # ---------------- pixel decoder ----------------
    m = re.match(r"pixel_decoder/(.+)$", p)
    if m:
        r = m.group(1)
        m2 = re.match(r"(adapter|layer)_(\d)/conv/(kernel|bias)$", r)
        if m2:
            kind, s, k = m2.groups()
            key = f"pixel_decoder.{kind}_{s}.weight"
            return (key, _conv) if k == "kernel" else (f"pixel_decoder.{kind}_{s}.bias", _id)
        m2 = re.match(r"(adapter|layer)_(\d)/norm/(scale|bias)$", r)
        if m2:
            kind, s, k = m2.groups()
            leaf, tr = _norm_leaf(k)
            return f"pixel_decoder.{kind}_{s}.norm.{leaf}", tr
        m2 = re.match(r"mask_features/conv/(kernel|bias)$", r)
        if m2:
            return (
                ("pixel_decoder.mask_features.weight", _conv)
                if m2.group(1) == "kernel"
                else ("pixel_decoder.mask_features.bias", _id)
            )
        m2 = re.match(r"cross_attn_(\d)/(.+)$", r)
        if m2:
            s, rest = m2.groups()
            base = f"pixel_decoder.cross_attn_{s}"
            for name in ("self_attn", "multihead_attn"):
                res = _mha(name, f"{base}.{name}", rest)
                if res:
                    return res
            table = {
                "linear1/kernel": (f"{base}.linear1.weight", _t),
                "linear1/bias": (f"{base}.linear1.bias", _id),
                "linear2/kernel": (f"{base}.linear2.weight", _t),
                "linear2/bias": (f"{base}.linear2.bias", _id),
            }
            if rest in table:
                return table[rest]
            m3 = re.match(r"norm(\d)/(scale|bias)$", rest)
            if m3:
                n, k = m3.groups()
                leaf, tr = _norm_leaf(k)
                return f"{base}.norm{n}.{leaf}", tr
        return None

    return None


def _x3d_torch_base(r: str) -> Optional[Tuple[str, str]]:
    """Map an x3d flax sub-path to (torch module base, remaining leaf)."""
    m = re.match(r"stem_conv_xy/kernel$", r)
    if m:  # Conv2plus1d stores the spatial conv under the 'conv_t' name
        return "blocks.0.conv.conv_t", "weight"
    m = re.match(r"stem_conv_t/kernel$", r)
    if m:
        return "blocks.0.conv.conv_xy", "weight"
    m = re.match(r"stage(\d)_block(\d+)/(.+)$", r)
    if m:
        s, i, rest = m.groups()
        base = f"blocks.{s}.res_blocks.{i}"
        table = {
            "branch1_conv/kernel": (f"{base}.branch1_conv", "weight"),
            "conv_a/kernel": (f"{base}.branch2.conv_a", "weight"),
            "conv_b/kernel": (f"{base}.branch2.conv_b", "weight"),
            "conv_c/kernel": (f"{base}.branch2.conv_c", "weight"),
            "se/fc1/kernel": (f"{base}.branch2.norm_b.1.block.0", "weight"),
            "se/fc1/bias": (f"{base}.branch2.norm_b.1.block.0", "bias"),
            "se/fc2/kernel": (f"{base}.branch2.norm_b.1.block.2", "weight"),
            "se/fc2/bias": (f"{base}.branch2.norm_b.1.block.2", "bias"),
        }
        if rest in table:
            return table[rest]
    return None


_X3D_BN = {
    "scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var",
}


def _x3d_bn_base(r: str) -> Optional[Tuple[str, str]]:
    """x3d BatchNorm path -> torch bn module base + leaf kind."""
    m = re.match(r"stem_norm/bn/(\w+)$", r)
    if m:
        return "blocks.0.norm", _X3D_BN[m.group(1)]
    m = re.match(r"stage(\d)_block(\d+)/(norm_[abc]|branch1_norm)/bn/(\w+)$", r)
    if m:
        s, i, norm, leaf = m.groups()
        base = f"blocks.{s}.res_blocks.{i}"
        tmod = {
            "norm_a": f"{base}.branch2.norm_a",
            "norm_b": f"{base}.branch2.norm_b.0",
            "norm_c": f"{base}.branch2.norm_c",
            "branch1_norm": f"{base}.branch1_norm",
        }[norm]
        return tmod, _X3D_BN[leaf]
    return None


def _x3d_leaf(bb: str, r: str) -> Optional[Tuple[str, Transform]]:
    res = _x3d_torch_base(r)
    if res:
        base, leaf = res
        tr = _conv3d if r.endswith("/kernel") else _id
        return f"{bb}.{base}.{leaf}", tr
    res = _x3d_bn_base(r)
    if res:
        base, leaf = res
        return f"{bb}.{base}.{leaf}", _id
    return None


def _msda_leaf(base: str, rest: str) -> Optional[Tuple[str, Transform]]:
    m = re.match(
        r"(sampling_offsets|attention_weights|value_proj|output_proj)/(kernel|bias)$",
        rest,
    )
    if not m:
        return None
    name, k = m.groups()
    return (
        (f"{base}.{name}.weight", _t) if k == "kernel" else (f"{base}.{name}.bias", _id)
    )


def _transformer_layer_leaf(base: str, rest: str) -> Optional[Tuple[str, Transform]]:
    """Leaves inside one encoder/decoder layer (incl. FTF / LastLayerAsToken
    sublayers)."""
    # deformable attention modules
    for name in ("self_attn", "cross_attn"):
        if rest.startswith(name + "/"):
            res = _msda_leaf(f"{base}.{name}", rest[len(name) + 1 :])
            if res:
                return res
            # decoder/FTF MHA self_attn
            res = _mha(name, f"{base}.{name}", rest)
            if res:
                return res
    res = _mha("self_attn", f"{base}.self_attn", rest)
    if res:
        return res

    # FFN block (torch: linear1/linear2 + final norm index differs per side)
    m = re.match(r"ffn/(linear1|linear2)/(kernel|bias)$", rest)
    if m:
        name, k = m.groups()
        return (
            (f"{base}.{name}.weight", _t) if k == "kernel" else (f"{base}.{name}.bias", _id)
        )
    m = re.match(r"ffn/norm/(scale|bias)$", rest)
    if m:
        leaf, tr = _norm_leaf(m.group(1))
        # encoder FFN norm is norm2, decoder FFN norm is norm3
        n = "norm2" if ".encoder." in base else "norm3"
        return f"{base}.{n}.{leaf}", tr
    m = re.match(r"norm(\d)/(scale|bias)$", rest)
    if m:
        n, k = m.groups()
        leaf, tr = _norm_leaf(k)
        return f"{base}.norm{n}.{leaf}", tr

    # FTF sublayer
    m = re.match(r"ftoken_layers/(.+)$", rest)
    if m:
        r = m.group(1)
        fbase = f"{base}.ftoken_layers"
        res = _msda_leaf(f"{fbase}.token_frame_atten", r.replace("token_frame_atten/", "")) if r.startswith("token_frame_atten/") else None
        if res:
            return res
        for name in ("token_self_atten", "frame_token_atten"):
            res = _mha(name, f"{fbase}.{name}", r)
            if res:
                return res
        table = {
            "reference_points/kernel": (f"{fbase}.reference_points.weight", _t),
            "reference_points/bias": (f"{fbase}.reference_points.bias", _id),
            "linear1/kernel": (f"{fbase}.linear1.weight", _t),
            "linear1/bias": (f"{fbase}.linear1.bias", _id),
            "linear2/kernel": (f"{fbase}.linear2.weight", _t),
            "linear2/bias": (f"{fbase}.linear2.bias", _id),
        }
        if r in table:
            return table[r]
        m3 = re.match(r"norm(\d)/(scale|bias)$", r)
        if m3:
            n, k = m3.groups()
            leaf, tr = _norm_leaf(k)
            return f"{fbase}.norm{n}.{leaf}", tr
        return None

    # LastLayerAsToken sublayer
    m = re.match(r"inter_frame_atten/(.+)$", rest)
    if m:
        r = m.group(1)
        fbase = f"{base}.inter_frame_atten"
        res = _mha("inter_frame_att", f"{fbase}.inter_frame_att", r)
        if res:
            return res
        table = {
            "linear1/kernel": (f"{fbase}.linear1.weight", _t),
            "linear1/bias": (f"{fbase}.linear1.bias", _id),
            "linear2/kernel": (f"{fbase}.linear2.weight", _t),
            "linear2/bias": (f"{fbase}.linear2.bias", _id),
        }
        if r in table:
            return table[r]
        m3 = re.match(r"norm(\d)/(scale|bias)$", r)
        if m3:
            n, k = m3.groups()
            leaf, tr = _norm_leaf(k)
            return f"{fbase}.norm{n}.{leaf}", tr
    return None


# ---------------------------------------------------------------------------


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = False,
    verbose: bool = True,
):
    """Overlay a torch state_dict onto flax ``variables``. Returns
    (new_variables, missing_keys, unexpected_keys) with the reference's
    strict=False semantics (main.py:172-180)."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    used = set()
    missing: List[str] = []
    new_flat = {}
    for path, leaf in flat.items():
        res = flax_to_torch_key(path)
        if res is None:
            missing.append(path)
            new_flat[path] = leaf
            continue
        tkey, tr = res
        if tkey not in state_dict:
            missing.append(path)
            new_flat[path] = leaf
            continue
        arr = tr(state_dict[tkey])
        if arr.shape != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch {path} <- {tkey}: {arr.shape} vs {leaf.shape}"
            )
        new_flat[path] = jnp.asarray(arr, leaf.dtype)
        used.add(tkey)
    unexpected = [k for k in state_dict if k not in used]
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing}, unexpected={unexpected}")
    if verbose:
        print(f"checkpoint: loaded {len(used)} tensors, "
              f"{len(missing)} flax leaves left at init, "
              f"{len(unexpected)} torch keys unused")
    return traverse_util.unflatten_dict(new_flat, sep="/"), missing, unexpected


def export_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: flax variables -> a torch-layout
    state_dict (for cross-validating against the reference stack). MHA q/k/v
    leaves are re-packed into in_proj_weight/bias; layout transforms are
    inverted (kernel [in,out] -> weight [out,in], HWIO -> OIHW)."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    out: Dict[str, np.ndarray] = {}
    packing: Dict[str, Dict[int, np.ndarray]] = {}
    for path, leaf in flat.items():
        res = flax_to_torch_key(path)
        if res is None:
            continue
        tkey, tr = res
        arr = np.asarray(jax.device_get(leaf))
        name = tr.__name__
        if name == "_t":
            out[tkey] = np.ascontiguousarray(arr.T)
        elif name == "_conv":
            out[tkey] = np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
        elif name == "_id":
            out[tkey] = arr
        else:  # packed MHA slice ('tr' closures from _mha)
            which = {"q": 0, "k": 1, "v": 2}[
                re.search(r"/(q|k|v)_proj/", path).group(1)
            ]
            packing.setdefault(tkey, {})[which] = (
                np.ascontiguousarray(arr.T) if "weight" in tkey else arr
            )
    for tkey, parts in packing.items():
        out[tkey] = np.concatenate([parts[i] for i in range(3)], axis=0)
    return out


def drop_class_heads(state_dict: Dict[str, np.ndarray], num_layers: int = 4):
    """pre_trained_model_to_finetune semantics
    (reference tools/load_pretrained_weights.py:3-11)."""
    out = dict(state_dict)
    for l in range(num_layers):
        out.pop(f"class_embed.{l}.weight", None)
        out.pop(f"class_embed.{l}.bias", None)
    return out
