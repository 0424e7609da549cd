"""END-TO-END numerical parity against the reference PyTorch model.

Builds a tiny-config reference TCE-RVOS model on CPU torch (with the CUDA
MSDeformAttn extension replaced by the reference's own pure-PyTorch oracle,
/root/reference/models/ops/functions/ms_deform_attn_func.py:67-87), exports
its state_dict, converts it through utils/checkpoint.convert_state_dict,
and asserts pred_logits / pred_boxes / pred_masks agree on a fixed clip.

This is the compatibility contract for real released checkpoints: it covers
backbone (swin_t) -> text encoder (HF Roberta random weights) -> deformable
transformer (FTF + IQT + box refine) -> FPN decoder -> dynamic mask head in
ONE forward.

Reference deps not present in this sandbox (torchvision, timm, fvcore,
pycocotools, the compiled CUDA module) are stubbed with minimal functional
equivalents before import; the HF hub downloads are replaced with
random-weight tiny models.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

REFERENCE = "/root/reference"

pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)


# ---------------------------------------------------------------------------
# stubs for reference deps missing in this sandbox
# ---------------------------------------------------------------------------


def _install_stubs():
    import importlib.machinery

    import torch
    from torch import nn

    def _mod(name):
        m = types.ModuleType(name)
        # transformers probes optional deps via importlib.util.find_spec,
        # which raises on spec-less sys.modules entries
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    # ---- torchvision (only IntermediateLayerGetter is touched on import) --
    tv = _mod("torchvision")
    tv_models = _mod("torchvision.models")
    tv_utils = _mod("torchvision.models._utils")

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            layers = {}
            rl = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in rl:
                    del rl[name]
                if not rl:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    tv_utils.IntermediateLayerGetter = IntermediateLayerGetter

    # faithful torchvision-resnet50 reimplementation (v1.5: stride on the
    # 3x3), with torchvision's exact module names so state_dict keys match
    # real released checkpoints
    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     dilation=1, norm_layer=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = norm_layer(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=dilation, dilation=dilation, bias=False)
            self.bn2 = norm_layer(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = norm_layer(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers, replace_stride_with_dilation=None,
                     norm_layer=None):
            super().__init__()
            if replace_stride_with_dilation is None:
                replace_stride_with_dilation = [False, False, False]
            self.inplanes = 64
            self.dilation = 1
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0], 1, False, norm_layer)
            self.layer2 = self._make_layer(
                128, layers[1], 2, replace_stride_with_dilation[0], norm_layer)
            self.layer3 = self._make_layer(
                256, layers[2], 2, replace_stride_with_dilation[1], norm_layer)
            self.layer4 = self._make_layer(
                512, layers[3], 2, replace_stride_with_dilation[2], norm_layer)

        def _make_layer(self, planes, blocks, stride, dilate, norm_layer):
            downsample = None
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    norm_layer(planes * 4),
                )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                                 previous_dilation, norm_layer)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(self.inplanes, planes, 1, None,
                                         self.dilation, norm_layer))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    def resnet50(replace_stride_with_dilation=None, pretrained=False,
                 norm_layer=None, **kw):
        del pretrained  # never download
        return ResNet([3, 4, 6, 3], replace_stride_with_dilation, norm_layer)

    tv_models.resnet50 = resnet50
    tv_models._utils = tv_utils
    tv.models = tv_models
    tv_ops = _mod("torchvision.ops")
    tv_boxes = _mod("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_ops.boxes = tv_boxes

    class RoIAlign(nn.Module):  # x3d.py:18 module-level import; only used
        def __init__(self, *a, **k):  # by the (unbuilt) detection head
            super().__init__()

        def forward(self, *a, **k):
            raise RuntimeError("RoIAlign stub — not used by the backbone path")

    tv_ops.RoIAlign = RoIAlign
    tv.ops = tv_ops
    tv.__version__ = "0.15.0"  # util/misc.py:36 version probe
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)
    sys.modules.setdefault("torchvision.models._utils", tv_utils)
    sys.modules.setdefault("torchvision.ops", tv_ops)
    sys.modules.setdefault("torchvision.ops.boxes", tv_boxes)

    # ---- timm.models.layers ----------------------------------------------
    timm = _mod("timm")
    timm_models = _mod("timm.models")
    timm_layers = _mod("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity (timm semantics)
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = nn.init.trunc_normal_
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    # ---- fvcore.nn.weight_init -------------------------------------------
    fv = _mod("fvcore")
    fvnn = _mod("fvcore.nn")
    fvwi = _mod("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    fvwi.c2_xavier_fill = c2_xavier_fill
    fvwi.c2_msra_fill = c2_msra_fill

    # faithful fvcore.nn.squeeze_excitation.SqueezeExcitation (x3d.py:16):
    # block = Sequential(conv1, act, conv2, sigmoid) over the global
    # spatial(-temporal) mean — key names block.{0,2}.{weight,bias} match
    # real fvcore checkpoints (the converter maps them,
    # utils/checkpoint.py::_x3d_torch_base)
    fvse = _mod("fvcore.nn.squeeze_excitation")

    class SqueezeExcitation(nn.Module):
        def __init__(self, num_channels, num_channels_reduced=None,
                     reduction_ratio=2.0, is_3d=False, activation=None):
            super().__init__()
            if num_channels_reduced is None:
                num_channels_reduced = int(num_channels // reduction_ratio)
            if activation is None:
                activation = nn.ReLU()
            conv = nn.Conv3d if is_3d else nn.Conv2d
            self.is_3d = is_3d
            self.block = nn.Sequential(
                conv(num_channels, num_channels_reduced, kernel_size=1, bias=True),
                activation,
                conv(num_channels_reduced, num_channels, kernel_size=1, bias=True),
                nn.Sigmoid(),
            )

        def forward(self, x):
            dims = [2, 3, 4] if self.is_3d else [2, 3]
            return x * self.block(x.mean(dim=dims, keepdim=True))

    fvse.SqueezeExcitation = SqueezeExcitation
    fvnn.weight_init = fvwi
    fvnn.squeeze_excitation = fvse
    fv.nn = fvnn
    sys.modules.setdefault("fvcore", fv)
    sys.modules.setdefault("fvcore.nn", fvnn)
    sys.modules.setdefault("fvcore.nn.weight_init", fvwi)
    sys.modules.setdefault("fvcore.nn.squeeze_excitation", fvse)

    # ---- pycocotools (imported by postprocessors, unused in forward) ------
    pyc = _mod("pycocotools")
    pyc_mask = _mod("pycocotools.mask")
    pyc_mask.encode = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
    pyc_mask.decode = pyc_mask.encode
    pyc_mask.area = pyc_mask.encode
    pyc.mask = pyc_mask
    sys.modules.setdefault("pycocotools", pyc)
    sys.modules.setdefault("pycocotools.mask", pyc_mask)

    # ---- the compiled CUDA extension: filled with the torch oracle after
    # the reference functions module is imported -----------------------------
    msda_stub = _mod("MultiScaleDeformableAttention_update")
    sys.modules.setdefault("MultiScaleDeformableAttention_update", msda_stub)
    return msda_stub


class _FakeTokenized(dict):
    """Mimics transformers.BatchEncoding for forward_text's usage."""

    def __init__(self, input_ids, attention_mask):
        super().__init__(input_ids=input_ids, attention_mask=attention_mask)
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def to(self, device):
        return self

    def keys(self):
        return ("input_ids", "attention_mask")


class _FakeTokenizer:
    """Deterministic token ids (real BPE files are unreachable offline); the
    JAX side is fed the SAME ids, so the text encoders see identical input."""

    def batch_encode_plus(self, captions, padding=None, return_tensors=None):
        import torch

        ids = []
        for cap in captions:
            toks = [0] + [3 + (hash(w) % 1000) for w in cap.lower().split()] + [2]
            ids.append(toks)
        longest = max(len(x) for x in ids)
        input_ids = torch.ones((len(ids), longest), dtype=torch.long)  # pad=1
        mask = torch.zeros((len(ids), longest), dtype=torch.long)
        for i, seq in enumerate(ids):
            input_ids[i, : len(seq)] = torch.tensor(seq)
            mask[i, : len(seq)] = 1
        return _FakeTokenized(input_ids, mask)


@pytest.fixture(scope="module")
def reference_env(tmp_path_factory):
    import torch

    torch.manual_seed(0)
    msda_stub = _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # HF-hub replacements: random tiny-but-dimensionally-roberta-base models
    import transformers

    real_model_fp = transformers.RobertaModel.from_pretrained
    real_tok_fp = transformers.RobertaTokenizerFast.from_pretrained

    def fake_model_fp(name, *a, **k):
        cfg = transformers.RobertaConfig(
            vocab_size=50265, hidden_size=768, num_hidden_layers=2,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        return transformers.RobertaModel(cfg)

    transformers.RobertaModel.from_pretrained = staticmethod(fake_model_fp)
    transformers.RobertaTokenizerFast.from_pretrained = staticmethod(
        lambda *a, **k: _FakeTokenizer()
    )
    try:
        import models.ops.functions.ms_deform_attn_func as ref_func

        def ms_deform_attn_forward(value, shapes, level_start_index, loc, attn,
                                   im2col_step, *extra):
            del level_start_index, im2col_step, extra
            return ref_func.ms_deform_attn_core_pytorch(value, shapes, loc, attn)

        msda_stub.ms_deform_attn_forward = ms_deform_attn_forward

        import models.tce_rvos as ref_tce

        yield ref_tce
    finally:
        transformers.RobertaModel.from_pretrained = real_model_fp
        transformers.RobertaTokenizerFast.from_pretrained = real_tok_fp


def _reference_args():
    import opts

    parser = opts.get_args_parser()
    args = parser.parse_args([])
    args.device = "cpu"
    args.backbone = "swin_t_p4w7"
    args.backbone_pretrained = None
    args.binary = True
    args.with_box_refine = True
    args.f_token = 2
    args.qtrans = True
    args.enc_layers = 2
    args.dec_layers = 2
    args.dim_feedforward = 64
    args.num_frames = 2
    args.num_queries = 5
    args.masks = True
    args.aux_loss = False
    args.dataset_file = "ytvos"
    if not hasattr(args, "f_extra"):
        args.f_extra = 0
    return args


def _run_parity(reference_env, backbone: str):
    import torch

    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model
    from tce_rvos_tpu.utils.checkpoint import convert_state_dict

    ref_tce = reference_env
    args = _reference_args()
    args.backbone = backbone
    torch.manual_seed(0)
    model, _, _ = ref_tce.build(args)
    if backbone in ("resnet50", "x3d_s"):
        # resnet's FrozenBatchNorm / x3d's BatchNorm are built with default
        # stats (mean 0 / var 1) — randomize them so the converter's
        # buffer handling is actually exercised
        gen = torch.Generator().manual_seed(7)
        for k, v in model.state_dict().items():
            if "backbone" in k and k.endswith("running_mean"):
                v.copy_(torch.randn(v.shape, generator=gen) * 0.3)
            if "backbone" in k and k.endswith("running_var"):
                v.copy_(torch.rand(v.shape, generator=gen) * 2 + 0.1)
    model.eval()

    b, t, H, W = 1, 2, 128, 128
    rng = np.random.RandomState(42)
    clip = rng.randn(t, 3, H, W).astype(np.float32)
    captions = ["the red ball rolling"]
    targets = [{"size": torch.tensor([H, W])}]
    with torch.no_grad():
        out_ref = model([torch.from_numpy(clip)], captions, targets)

    ref_logits = out_ref["pred_logits"].numpy()  # [b, t, q, K]
    ref_boxes = out_ref["pred_boxes"].numpy()
    ref_masks = out_ref["pred_masks"].numpy()

    # the exact token ids the fake tokenizer produced
    tokked = _FakeTokenizer().batch_encode_plus(captions)
    text_ids = np.asarray(tokked.input_ids, np.int32)
    text_attn = np.asarray(tokked.attention_mask, np.int32)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = ModelConfig(
        backbone=backbone, binary=True, with_box_refine=True,
        f_token=2, qtrans=True, enc_layers=2, dec_layers=2,
        dim_feedforward=64, num_frames=2, num_queries=5,
        text_encoder_layers=2, text_encoder_hidden=768,
        text_encoder_heads=12, text_encoder_intermediate=3072,
    )
    jmodel = build_model(cfg)
    video = np.transpose(clip, (0, 2, 3, 1))[None]  # [1, t, H, W, 3]
    inputs = dict(
        video=video,
        video_mask=np.zeros((b, t, H, W), bool),
        text_ids=text_ids,
        text_attn_mask=text_attn,
        sizes=np.asarray([[H, W]], np.int32),
    )
    variables = jax.jit(jmodel.init)(jax.random.PRNGKey(0), **inputs)
    variables, missing, unexpected = convert_state_dict(sd, variables)
    # every torch weight must land somewhere, EXCEPT two benign groups:
    #  * transformer.decoder.bbox_embed.* — the reference's box-refine hack
    #    aliases the model-level bbox_embed modules into the decoder
    #    (tce_rvos.py build), so the state_dict carries each tensor twice;
    #  * Swin relative_position_index — a deterministic registered buffer
    #    our implementation recomputes from the window size.
    for k in list(unexpected):
        if ".decoder.bbox_embed." in k:
            np.testing.assert_array_equal(
                sd[k], sd[k.replace("transformer.decoder.", "")]
            )
        else:
            # relative_position_index: deterministic swin buffer we recompute;
            # num_batches_tracked: torch BN step counters, unused in eval
            assert (
                "relative_position_index" in k or "num_batches_tracked" in k
            ), f"unconverted torch key: {k}"

    out = jax.jit(lambda v, **kw: jmodel.apply(v, **kw))(variables, **inputs)
    logits = np.asarray(out["pred_logits"])
    boxes = np.asarray(out["pred_boxes"])
    masks = np.asarray(out["pred_masks"])

    assert logits.shape == ref_logits.shape, (logits.shape, ref_logits.shape)
    assert boxes.shape == ref_boxes.shape
    assert masks.shape == ref_masks.shape

    np.testing.assert_allclose(logits, ref_logits, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(boxes, ref_boxes, atol=2e-3, rtol=1e-3)
    # mask logits span a wide range; compare with a scale-aware tolerance
    scale = np.abs(ref_masks).max()
    assert np.abs(masks - ref_masks).max() < 5e-3 * max(scale, 1.0), (
        np.abs(masks - ref_masks).max(), scale
    )


def test_reference_forward_parity_swin(reference_env):
    _run_parity(reference_env, "swin_t_p4w7")


def test_reference_forward_parity_resnet50(reference_env):
    """Flagship backbone: faithful torchvision-named ResNet-50 (v1.5) with
    RANDOMIZED FrozenBatchNorm running stats, end to end through the same
    converted pipeline."""
    _run_parity(reference_env, "resnet50")


def test_reference_forward_parity_video_swin(reference_env):
    """The DAVIS/A2D flagship backbone family
    (/root/reference/scripts/dist_test_davis.sh:22, inf_a2d.sh:1-5): full
    converted pipeline with video_swin_t_p4w7 — covers the (1,4,4) 3D patch
    embed, 3D shifted-window attention with its (2t-1)(2w-1)^2 relative
    position bias, per-stage pre-downsample outputs, and temporal window
    padding at T < window_t (reference video_swin_transformer.py:638-697)."""
    _run_parity(reference_env, "video_swin_t_p4w7")


def test_reference_forward_parity_x3d(reference_env):
    """x3d_s end to end through the converted pipeline: round_width /
    round_repeats arithmetic, SE-on-alternate-blocks, BatchNorm running
    stats (randomized below so buffer conversion is actually exercised),
    and the b c t h w layout into the 3D convs (reference x3d.py:1498-1537)."""
    _run_parity(reference_env, "x3d_s")


def test_reference_criterion_parity(reference_env):
    """Loss-side parity: run the reference SetCriterion + min-cost matcher
    (/root/reference/models/criterion.py:216-262, matcher.py:78-240) and
    this repo's models/criterion.py on the SAME model outputs and targets,
    and assert every weighted loss term (class/bbox/giou/mask/dice, main +
    aux layers) matches within fp tolerance. This closes the 'train to the
    same optimum' contract: forward parity is covered by the tests above,
    and the matcher choice + loss values are covered here."""
    import torch

    ref_tce = reference_env
    args = _reference_args()
    args.aux_loss = True  # exercise per-decoder-layer aux losses too
    torch.manual_seed(0)
    model, ref_criterion, _ = ref_tce.build(args)
    model.eval()

    b, t, H, W = 1, 2, 128, 128
    rng = np.random.RandomState(42)
    clip = rng.randn(t, 3, H, W).astype(np.float32)
    captions = ["the red ball rolling"]
    with torch.no_grad():
        out_ref = model(
            [torch.from_numpy(clip)], captions, [{"size": torch.tensor([H, W])}]
        )

    # one GT object; second frame marked invisible to exercise the
    # valid-frame index arithmetic (criterion.py:60-64)
    gt_mask = np.zeros((t, H, W), np.float32)
    gt_mask[:, 32:96, 16:80] = 1.0
    boxes = np.tile(
        np.asarray(
            [[(16 + 80) / 2 / W, (32 + 96) / 2 / H, 64 / W, 64 / H]],
            np.float32,
        ),
        (t, 1),
    )
    labels = np.zeros((t,), np.int64)
    valid = np.asarray([1, 0], np.int64)
    ref_targets = [
        dict(
            labels=torch.from_numpy(labels),
            boxes=torch.from_numpy(boxes),
            masks=torch.from_numpy(gt_mask),
            valid=torch.from_numpy(valid),
        )
    ]
    with torch.no_grad():
        ref_losses = ref_criterion(out_ref, ref_targets)
    weight_dict = ref_criterion.weight_dict

    from tce_rvos_tpu.models.criterion import CriterionConfig, criterion

    def np_of(x):
        return np.asarray(x.detach().numpy(), np.float32)

    outputs = {
        "pred_logits": np_of(out_ref["pred_logits"]),
        "pred_boxes": np_of(out_ref["pred_boxes"]),
        "pred_masks": np_of(out_ref["pred_masks"]),
        "aux_outputs": [
            {
                "pred_logits": np_of(a["pred_logits"]),
                "pred_boxes": np_of(a["pred_boxes"]),
                "pred_masks": np_of(a["pred_masks"]),
            }
            for a in out_ref["aux_outputs"]
        ],
    }
    targets = dict(
        labels=labels[None].astype(np.int32),
        boxes=boxes[None],
        masks=gt_mask[None],
        valid=valid[None].astype(np.int32),
    )
    mine = jax.jit(
        lambda o, tg: criterion(CriterionConfig(num_classes=1), o, tg)
    )(outputs, targets)

    checked = 0
    for k, w in weight_dict.items():
        if k not in ref_losses:
            continue
        expected = float(ref_losses[k]) * w  # reference weights at sum time
        got = float(mine[k])  # ours are pre-weighted
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-4), k
        checked += 1
    # main + one aux layer, five loss families each
    assert checked >= 10, (checked, sorted(ref_losses), sorted(mine))
