"""Dynamic-convolution mask head (CondInst-style).

Parity with reference models/tce_rvos.py:162-191 (controller),
:426-510 (dynamic_mask_with_coords / mask_heads_forward), :536-599
(parse_dynamic_params / compute_locations), rebuilt as batched einsums —
the reference's grouped conv2d with groups=num_instances is exactly a
per-instance 1x1 conv, i.e. one einsum over the channel axis per layer
(MXU-friendly; no groups, no reshapes to a giant [1, N*C, H, W] tensor).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tce_rvos_tpu.utils.interpolate import aligned_bilinear


def dynamic_head_param_counts(
    in_channels: int, channels: int, num_layers: int, rel_coord: bool
) -> Tuple[List[int], List[int]]:
    """Per-layer weight/bias element counts (reference tce_rvos.py:169-186)."""
    weight_nums, bias_nums = [], []
    for l in range(num_layers):
        if l == 0:
            inc = in_channels + 2 if rel_coord else in_channels
            weight_nums.append(inc * channels)
            bias_nums.append(channels)
        elif l == num_layers - 1:
            weight_nums.append(channels * 1)
            bias_nums.append(1)
        else:
            weight_nums.append(channels * channels)
            bias_nums.append(channels)
    return weight_nums, bias_nums


def compute_locations(h: int, w: int, stride: int = 1) -> jnp.ndarray:
    """Feature-pixel center locations in input coordinates [h, w, 2] (x, y)
    (reference tce_rvos.py:586-599)."""
    shift_x = jnp.arange(0, w * stride, stride, dtype=jnp.float32) + stride // 2
    shift_y = jnp.arange(0, h * stride, stride, dtype=jnp.float32) + stride // 2
    ys, xs = jnp.meshgrid(shift_y, shift_x, indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def dynamic_mask_with_coords(
    mask_features: jnp.ndarray,     # [b, t, h, w, C]
    params: jnp.ndarray,            # [b, t, q, num_gen_params]
    reference_points: jnp.ndarray,  # [b, t, q, 2] normalized cxcy
    sizes: jnp.ndarray,             # [b, 2] (img_h, img_w) model-input size
    channels: int,
    num_layers: int,
    rel_coord: bool = True,
    mask_feat_stride: int = 4,
    mask_out_stride: int = 4,
) -> jnp.ndarray:
    """Run per-query dynamic convs over the shared mask features.

    Returns mask logits [b, t, q, H_out, W_out] at mask_out_stride.
    """
    b, t, h, w, c = mask_features.shape
    q = params.shape[2]

    in_ch = c + 2 if rel_coord else c
    weight_nums, bias_nums = dynamic_head_param_counts(c, channels, num_layers, rel_coord)

    rel = None
    if rel_coord:
        scale = jnp.stack([sizes[:, 1], sizes[:, 0]], axis=-1).astype(jnp.float32)
        ref_abs = reference_points * scale[:, None, None, :]  # [b,t,q,2] in px
        locations = compute_locations(h, w, stride=mask_feat_stride)  # [h,w,2]
        rel = ref_abs[:, :, :, None, None, :] - locations[None, None, None]
        rel = rel.astype(mask_features.dtype)  # [b, t, q, h, w, 2]

    # split the controller output into per-layer weights/biases
    # (reference parse_dynamic_params tce_rvos.py:536-559)
    splits = np.cumsum(np.array(weight_nums + bias_nums))[:-1].tolist()
    pieces = jnp.split(params, splits, axis=-1)
    ws, bs = pieces[:num_layers], pieces[num_layers:]

    # layer 0 as SPLIT einsums: the feature part of the layer-0 input is the
    # same for every query, so contract the shared [b,t,h,w,C] map directly
    # against each query's weights instead of materializing the q-fold
    # [b,t,q,h,w,C+2] broadcast+concat (~q x the mask-head working set; at
    # flagship size a ~0.7 GB buffer per prediction level). Identical logits:
    # einsum(concat(f, rel), w) == einsum(f, w[:C]) + einsum(rel, w[C:]).
    # layer 0 always emits `channels` (dynamic_head_param_counts; the
    # reference's controller has >= 2 layers in every config)
    assert num_layers >= 2, "dynamic mask head needs >= 2 layers"
    # torch conv weight layout [cout, cin, 1, 1] flattened row-major; the
    # cin axis orders the concat inputs as [C features, 2 rel coords]
    w0 = ws[0].reshape(b, t, q, channels, in_ch)
    x = jnp.einsum("bthwc,btqoc->btqhwo", mask_features, w0[..., :c])
    if rel_coord:
        x = x + jnp.einsum("btqhwr,btqor->btqhwo", rel, w0[..., c:])
    x = nn.relu(x + bs[0].reshape(b, t, q, channels)[:, :, :, None, None, :])

    cin = channels
    for l in range(1, num_layers):
        cout = 1 if l == num_layers - 1 else channels
        wl = ws[l].reshape(b, t, q, cout, cin)
        bl = bs[l].reshape(b, t, q, cout)
        x = jnp.einsum("btqhwi,btqoi->btqhwo", x, wl) + bl[:, :, :, None, None, :]
        if l < num_layers - 1:
            x = nn.relu(x)
        cin = cout

    logits = x[..., 0]  # [b, t, q, h, w]
    assert mask_feat_stride >= mask_out_stride and mask_feat_stride % mask_out_stride == 0
    factor = mask_feat_stride // mask_out_stride
    if factor > 1:
        logits = aligned_bilinear(logits[..., None], factor)[..., 0]
    return logits
