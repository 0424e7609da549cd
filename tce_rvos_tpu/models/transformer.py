"""TCE deformable transformer — encoder with Frame Token Fusion (FTF),
decoder with the Instance Query Transformer (IQT).

Behavioural parity with reference models/tce_deformable_transformer.py,
redesigned for XLA:

  * level spatial shapes are static Python tuples — no device-side
    ``spatial_shapes``/``level_start_index`` tensors;
  * the time axis is explicit: the flattened batch of every call is
    ``N = b*t``; the three cross-frame ops (FTF token self-attention
    :462-477, LastLayerAsToken :369-383, IQT decoder self-attention
    :675-687) are pure axis rearrangements around a standard attention —
    exactly the spots that become single all-gathers when the frame axis is
    sharded across chips (see parallel/);
  * iterative box refinement runs inside the decoder loop with
    ``stop_gradient`` replacing ``.detach()``.

Axis conventions: all attention is batch-first [B, S, C]; masks True=pad.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tce_rvos_tpu.models.layers import FFN, MultiheadAttention, get_activation, with_pos
from tce_rvos_tpu.ops.msda import ms_deform_attn
from tce_rvos_tpu.utils.boxes import inverse_sigmoid

xavier = nn.initializers.xavier_uniform()


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional sampling-offset bias (reference
    models/ops/modules/ms_deform_attn.py:63-71): head h points at angle
    2πh/M, normalized to the unit box, scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # [M, 2]
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class _HeadMajorDense(nn.Module):
    """nn.Dense-compatible linear (same param tree: kernel [C, F], bias
    [F]) whose output is emitted HEAD-MAJOR [N, M, S, F/M] — the layout the
    Pallas MSDA kernels consume (value, sampling locations and attention
    weights alike) — so no [N,S,M,*] -> [N,M,S,*] relayout survives any of
    the per-head projections."""

    features: int
    n_heads: int
    kernel_init: nn.initializers.Initializer = xavier
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):  # x: [N, S, C]
        c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (c, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        d = self.features // self.n_heads
        k = kernel.reshape(c, self.n_heads, d).astype(x.dtype)
        b = bias.reshape(self.n_heads, d).astype(x.dtype)
        return jnp.einsum("nsc,cmd->nmsd", x, k) + b[None, :, None, :]


class MSDeformAttnLayer(nn.Module):
    """Multi-scale deformable attention module (parameter layout and
    semantics of reference models/ops/modules/ms_deform_attn.py:31-117;
    the core op replaces the CUDA extension). ``impl`` selects the XLA
    gather path or the Pallas MXU kernel (ops/pallas_msda.py)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"
    # True iff the queries are the flattened level pixels in row-major
    # order (encoder self-attention) — lets the Pallas kernel use banded
    # value windows (ops/pallas_msda.py); semantics are unchanged
    pixel_queries: bool = False
    # temporal-trilinear sampling (the reference CUDA's is_3d branch,
    # ms_deform_im2col_cuda.cuh:366-420, exported as MSDeformAttnFunction3D
    # but never module-wired there): each point carries a third (fractional
    # frame) coordinate; the temporal reference is the query's own frame
    # ((n + 0.5)/N along the batch-as-time axis), so zero temporal offsets
    # reduce exactly to the 2D op. Routed to ops/msda.ms_deform_attn_3d
    # (impl=xla) or the Pallas 3D kernels fwd+bwd (impl=pallas).
    is_3d: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                 # [N, Q, C]
        reference_points: jnp.ndarray,      # [N, Q, L, 2] or [N, Q, L, 4]
        input_flatten: jnp.ndarray,         # [N, S, C]
        spatial_shapes: Tuple[Tuple[int, int], ...],
        padding_mask: Optional[jnp.ndarray] = None,  # [N, S] True=pad
    ):
        m, l, p = self.n_heads, self.n_levels, self.n_points
        n, q_len, _ = query.shape
        s = input_flatten.shape[1]

        if self.is_3d:
            return self._call_3d(
                query, reference_points, input_flatten, spatial_shapes,
                padding_mask,
            )

        if self.impl == "pallas":
            # head-major projection: the kernels consume value as
            # [N, M, S, D], so emit it directly from the projection
            # (einsum with the Dense-compatible [C, C] kernel reshaped
            # per-head) instead of projecting to [N, S, C] and paying a
            # relayout. Identical parameters/semantics to nn.Dense.
            value_nm = _HeadMajorDense(self.d_model, m, name="value_proj")(
                input_flatten
            )
            if padding_mask is not None:
                value_nm = jnp.where(
                    padding_mask[:, None, :, None], 0.0, value_nm
                )
        else:
            value = nn.Dense(
                self.d_model, kernel_init=xavier, name="value_proj"
            )(input_flatten)
            if padding_mask is not None:
                value = jnp.where(padding_mask[..., None], 0.0, value)
            value = value.reshape(n, s, m, self.d_model // m)

        if self.impl == "pallas":
            # head-major (nmq) projections: loc/attn come out as
            # [N, M, Q, ...] so the kernel's Q-major pack is a minor-axis
            # concat — no relayout between the projections and the kernel
            offsets = _HeadMajorDense(
                m * l * p * 2, m,
                kernel_init=nn.initializers.zeros,
                bias_init=_offset_bias_init(m, l, p),
                name="sampling_offsets",
            )(query).reshape(n, m, q_len, l, p, 2)
            attn = _HeadMajorDense(
                m * l * p, m,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="attention_weights",
            )(query).reshape(n, m, q_len, l * p)
            attn = nn.softmax(attn, axis=-1).reshape(n, m, q_len, l, p)
            ref = reference_points[:, None]  # broadcast over the head axis
        else:
            offsets = nn.Dense(
                m * l * p * 2,
                kernel_init=nn.initializers.zeros,
                bias_init=_offset_bias_init(m, l, p),
                name="sampling_offsets",
            )(query).reshape(n, q_len, m, l, p, 2)
            attn = nn.Dense(
                m * l * p,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="attention_weights",
            )(query).reshape(n, q_len, m, l * p)
            attn = nn.softmax(attn, axis=-1).reshape(n, q_len, m, l, p)
            ref = reference_points[:, :, None]  # broadcast over heads

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype
            )  # [L, 2] (x, y)
            loc = (
                ref[:, :, :, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            loc = (
                ref[:, :, :, :, None, :2]
                + offsets / p * ref[:, :, :, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        if self.impl == "pallas":
            from tce_rvos_tpu.ops.pallas_msda import ms_deform_attn_pallas_nmq

            out = ms_deform_attn_pallas_nmq(
                value_nm, spatial_shapes, loc, attn,
                pixel_queries=self.pixel_queries,
            )
            # consumers (decoder top-30 visualization export) expect the
            # reference [N, Q, M, ...] layout; XLA dead-code-eliminates
            # these transposes at the call sites that discard them
            # (encoder self-attention, FTF)
            loc = loc.transpose(0, 2, 1, 3, 4, 5)
            attn = attn.transpose(0, 2, 1, 3, 4)
        else:
            out = ms_deform_attn(value, spatial_shapes, loc, attn)
        # named for the remat policy below: the MSDA output is saved across
        # the layer checkpoint boundary so the backward pass does not re-run
        # the (expensive) interpolation kernels — only cheap dense ops are
        # rematerialized ([N, Q, C] f32 per layer is ~26 MB at flagship size)
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out, "msda_out")
        out = nn.Dense(self.d_model, kernel_init=xavier, name="output_proj")(out)
        return out, loc, attn

    def _call_3d(
        self, query, reference_points, input_flatten, spatial_shapes,
        padding_mask,
    ):
        """Temporal-trilinear variant (see ``is_3d``). Same parameter names
        as the 2D path; ``sampling_offsets`` emits 3 coordinates per point
        (x, y, frame). Reference layouts ([N, Q, M, ...]) — the 3D kernels
        take them directly."""
        m, l, p = self.n_heads, self.n_levels, self.n_points
        n, q_len, _ = query.shape
        s = input_flatten.shape[1]

        value = nn.Dense(
            self.d_model, kernel_init=xavier, name="value_proj"
        )(input_flatten)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(n, s, m, self.d_model // m)

        def bias3d(key, shape, dtype=jnp.float32):
            b2 = _offset_bias_init(m, l, p)(key, (m * l * p * 2,), dtype)
            b3 = jnp.concatenate(
                [b2.reshape(m, l, p, 2),
                 jnp.zeros((m, l, p, 1), dtype)], axis=-1,
            )
            return b3.reshape(-1)

        offsets = nn.Dense(
            m * l * p * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=bias3d,
            name="sampling_offsets",
        )(query).reshape(n, q_len, m, l, p, 3)
        attn = nn.Dense(
            m * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(n, q_len, m, l * p)
        attn = nn.softmax(attn, axis=-1).reshape(n, q_len, m, l, p)

        ref = reference_points[:, :, None]  # broadcast over heads
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype
            )
            loc_xy = (
                ref[:, :, :, :, None, :]
                + offsets[..., :2] / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            loc_xy = (
                ref[:, :, :, :, None, :2]
                + offsets[..., :2] / p * ref[:, :, :, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")
        # temporal reference: the query's own frame along the batch-as-time
        # axis — (n + 0.5)/N puts f_im = loc_f*N - 0.5 exactly on frame n at
        # zero offset (hat weight 1: reduces to the 2D op)
        ref_f = (jnp.arange(n, dtype=loc_xy.dtype) + 0.5) / n
        loc_f = (
            ref_f[:, None, None, None, None]
            + offsets[..., 2] / n
        )[..., None]
        loc = jnp.concatenate([loc_xy, loc_f], axis=-1)  # [N,Q,M,L,P,3]

        if self.impl == "pallas":
            from tce_rvos_tpu.ops.pallas_msda_3d import ms_deform_attn_pallas_3d

            out = ms_deform_attn_pallas_3d(value, spatial_shapes, loc, attn)
        else:
            from tce_rvos_tpu.ops.msda import ms_deform_attn_3d

            out = ms_deform_attn_3d(value, spatial_shapes, loc, attn)
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out, "msda_out")
        out = nn.Dense(self.d_model, kernel_init=xavier, name="output_proj")(out)
        return out, loc[..., :2], attn


def get_encoder_reference_points(
    spatial_shapes: Tuple[Tuple[int, int], ...], valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """Per-pixel normalized reference grid (reference :571-589).
    valid_ratios: [N, L, 2] (w, h) -> [N, S, L, 2]."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([gx, gy], axis=-1))
    ref = jnp.concatenate(refs, axis=1)  # [N, S, 2]
    return ref[:, :, None] * valid_ratios[:, None]


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """mask: [N, H, W] True=pad -> [N, 2] (w_ratio, h_ratio)
    (reference :125-132)."""
    h, w = mask.shape[1], mask.shape[2]
    valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / w, valid_h / h], axis=-1)


class FrameTokenLayer(nn.Module):
    """FTF: per-frame learnable tokens gather frame info via deformable
    cross-attention, talk across frames via joint self-attention, then write
    back into the frame features (reference :385-493)."""

    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    msda_impl: str = "xla"
    # frames per clip (t): the joint token attention spans ONE clip's t*To
    # tokens. The reference reshapes to [(b t tok), 1, c] (:462-477), i.e.
    # its "clip" silently spans the whole batch — correct only at its b=1
    # deployment; batching clips (dp training, expression-batched serving)
    # must not let tokens of different clips/expressions attend to each
    # other, so the sequence is scoped per batch element here.
    clip_frames: int = 1

    @nn.compact
    def __call__(
        self,
        src,               # [N, S, C]  N = b*t
        pos,               # [N, S, C]
        token,             # [N, To, C]
        token_pos,         # [N, To, C]
        spatial_shapes,
        padding_mask,      # [N, S]
        valid_ratios,      # [N, L, 2]
        deterministic: bool = True,
    ):
        n, n_tok, c = token.shape
        t = self.clip_frames
        b = n // t
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        # 1) token <- frame features (deformable cross-attn); ref points are
        # predicted from the tokens themselves
        ref = nn.sigmoid(
            nn.Dense(2, kernel_init=xavier, name="reference_points")(token)
        )
        ref = ref[:, :, None] * valid_ratios[:, None]  # [N, To, L, 2]
        token2, _, _ = MSDeformAttnLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, name="token_frame_atten",
        )(with_pos(token, token_pos), ref, src, spatial_shapes, padding_mask)
        token = nn.LayerNorm(name="norm1")(token + drop(token2))

        # 2) joint self-attention across the CLIP's frames' tokens: fold
        # (t, To) into one sequence of length t*To per batch element
        # (reference :462-477; see ``clip_frames`` for the batch scoping)
        flat = token.reshape(b, t * n_tok, c)
        flat_pos = token_pos.reshape(b, t * n_tok, c)
        qk = with_pos(flat, flat_pos)
        token2 = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, name="token_self_atten"
        )(qk, qk, flat, deterministic=deterministic)
        token = nn.LayerNorm(name="norm2")(flat + drop(token2)).reshape(n, n_tok, c)

        # 3) frame features <- tokens (standard cross-attn per frame)
        q = with_pos(src, pos)
        k = with_pos(token, token_pos)
        src2 = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, name="frame_token_atten"
        )(q, k, token, deterministic=deterministic)
        src = nn.LayerNorm(name="norm3")(src + drop(src2))

        # 4) FFN
        y = nn.Dense(self.d_ffn, kernel_init=xavier, name="linear1")(src)
        y = get_activation(self.activation)(y)
        y = drop(y)
        y = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(y)
        src = nn.LayerNorm(name="norm4")(src + drop(y))
        return src, token


class LastLayerAsToken(nn.Module):
    """f_token<0 mode: the coarsest feature level acts as the inter-frame
    token set; one self-attention across all frames' coarse tokens
    (reference :341-383)."""

    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_heads: int = 8
    clip_frames: int = 1  # see FrameTokenLayer.clip_frames

    @nn.compact
    def __call__(self, src, pos, last_start: int, deterministic: bool = True):
        n, s, c = src.shape
        t = self.clip_frames
        b = n // t
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        dense, tok = src[:, :last_start], src[:, last_start:]
        tok_pos = pos[:, last_start:]
        n_tok = tok.shape[1]
        flat = tok.reshape(b, t * n_tok, c)
        flat_pos = tok_pos.reshape(b, t * n_tok, c)
        # NOTE: query gets pos, key/value don't (reference :378)
        tok2 = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, name="inter_frame_att"
        )(with_pos(flat, flat_pos), flat, flat, deterministic=deterministic)
        # the reference applies no norm after this residual (:379)
        flat = flat + drop(tok2)
        # ffn (norm2 only — norm1 is defined but unused in the reference)
        y = nn.Dense(self.d_ffn, kernel_init=xavier, name="linear1")(flat)
        y = get_activation(self.activation)(y)
        y = drop(y)
        y = nn.Dense(self.d_model, kernel_init=xavier, name="linear2")(y)
        flat = nn.LayerNorm(name="norm2")(flat + drop(y))
        tok = flat.reshape(n, n_tok, c)
        return jnp.concatenate([dense, tok], axis=1)


class EncoderLayer(nn.Module):
    """Deformable encoder layer (+ optional FTF / LastLayerAsToken prologue)
    (reference :495-553)."""

    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    f_token: int = 0
    msda_impl: str = "xla"
    msda_3d: bool = False
    clip_frames: int = 1  # see FrameTokenLayer.clip_frames

    @nn.compact
    def __call__(
        self,
        src,
        pos,
        reference_points,
        spatial_shapes,
        valid_ratios,
        padding_mask,
        memory_bus,
        memory_pos,
        deterministic: bool = True,
    ):
        if self.f_token < 0:
            last_start = sum(h * w for h, w in spatial_shapes[:-1])
            src = LastLayerAsToken(
                self.d_model, self.d_ffn, self.dropout, self.activation,
                self.n_heads, clip_frames=self.clip_frames,
                name="inter_frame_atten",
            )(src, pos, last_start, deterministic)
        if self.f_token > 0:
            src, memory_bus = FrameTokenLayer(
                self.d_model, self.d_ffn, self.dropout, self.activation,
                self.n_heads, self.n_levels, self.n_points,
                msda_impl=self.msda_impl, clip_frames=self.clip_frames,
                name="ftoken_layers",
            )(
                src, pos, memory_bus, memory_pos, spatial_shapes, padding_mask,
                valid_ratios, deterministic,
            )

        src2, _, _ = MSDeformAttnLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, pixel_queries=True, is_3d=self.msda_3d,
            name="self_attn",
        )(with_pos(src, pos), reference_points, src, spatial_shapes, padding_mask)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        src = FFN(
            self.d_ffn, self.d_model, self.dropout, self.activation, name="ffn"
        )(src, deterministic=deterministic)
        return src, memory_bus


class DecoderLayer(nn.Module):
    """Deformable decoder layer. ``is_query_atten`` selects IQT: self-attn
    runs over the frame axis per query slot instead of over query slots per
    frame (reference :675-687)."""

    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "relu"
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    is_query_atten: bool = False
    msda_impl: str = "xla"
    msda_3d: bool = False
    # frames per clip (t): IQT attends per query slot across ONE clip's t
    # frames. The reference's un-transposed call (:675-687) makes seq=b*t —
    # spanning the whole batch, correct only at its b=1 deployment; batched
    # clips/expressions are scoped per batch element here (see
    # FrameTokenLayer.clip_frames).
    clip_frames: int = 1

    @nn.compact
    def __call__(
        self,
        tgt,                # [N, Q, C], N = b*t
        query_pos,          # [N, Q, C]
        reference_points,   # [N, Q, L, 2|4]
        src,                # [N, S, C]
        spatial_shapes,
        padding_mask,
        deterministic: bool = True,
    ):
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        qk = with_pos(tgt, query_pos)
        attn = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, name="self_attn"
        )
        if self.is_query_atten:
            # IQT: each query slot attends across its clip's t frames:
            # [b*t, Q, C] -> [b*Q, t, C]
            n, q_len, c = tgt.shape
            t = self.clip_frames
            b = n // t

            def to_iqt(x):
                return (
                    x.reshape(b, t, q_len, c)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * q_len, t, c)
                )

            def from_iqt(x):
                return (
                    x.reshape(b, q_len, t, c)
                    .transpose(0, 2, 1, 3)
                    .reshape(n, q_len, c)
                )

            tgt2 = from_iqt(
                attn(to_iqt(qk), to_iqt(qk), to_iqt(tgt),
                     deterministic=deterministic)
            )
        else:
            tgt2 = attn(qk, qk, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt + drop(tgt2))

        tgt2, loc, attn_w = MSDeformAttnLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, is_3d=self.msda_3d, name="cross_attn",
        )(with_pos(tgt, query_pos), reference_points, src, spatial_shapes, padding_mask)
        tgt = nn.LayerNorm(name="norm1")(tgt + drop(tgt2))

        tgt = FFN(
            self.d_ffn, self.d_model, self.dropout, self.activation, name="ffn"
        )(tgt, deterministic=deterministic)
        return tgt, loc, attn_w


class MLPHead(nn.Module):
    """ReLU MLP with reference naming for bbox heads."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_bias_low_wh: bool = False  # init bias[2:] = -2.0 (box refine prior)

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.output_dim if last else self.hidden_dim
            kinit = nn.initializers.zeros if last else nn.initializers.lecun_normal()

            def binit(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                if last and self.last_bias_low_wh:
                    b = b.at[2:].set(-2.0)
                return b

            x = nn.Dense(out, kernel_init=kinit, bias_init=binit, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class DeformableTransformer(nn.Module):
    """Full encoder/decoder (reference :27-242). When ``with_box_refine`` the
    decoder owns the per-layer bbox MLPs (the reference shares them with the
    model head — here the decoder *returns* per-layer box predictions so the
    parameters exist once)."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    q_trans: bool = False
    f_token: int = 0
    with_box_refine: bool = False
    msda_impl: str = "xla"
    msda_3d: bool = False
    use_checkpoint: bool = False  # remat each enc/dec layer (training memory)

    @nn.compact
    def __call__(
        self,
        srcs: Sequence[jnp.ndarray],       # L x [N, H_l, W_l, C], N=b*t
        tgt: jnp.ndarray,                  # [b, t, q, C] (text embedding)
        masks: Sequence[jnp.ndarray],      # L x [N, H_l, W_l] True=pad
        pos_embeds: Sequence[jnp.ndarray], # L x [N, H_l, W_l, C]
        query_embed: jnp.ndarray,          # [q, C]
        deterministic: bool = True,
    ):
        c = self.d_model
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        n = srcs[0].shape[0]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, c),
        )

        src_flat = jnp.concatenate(
            [s.reshape(n, -1, c) for s in srcs], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(n, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(n, -1, c).astype(src_flat.dtype)
                + level_embed[lvl][None, None]
                for lvl, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)

        # ---- encoder ----
        b, t, q_per_frame, _ = tgt.shape
        enc_ref = get_encoder_reference_points(spatial_shapes, valid_ratios)
        memory_bus = memory_pos = None
        if self.f_token > 0:
            std = math.sqrt(2.0 / self.f_token)  # kaiming fan_out on [tok, C]
            bus = self.param(
                "memory_bus", nn.initializers.normal(std), (self.f_token, c)
            )
            bpos = self.param(
                "memory_pos", nn.initializers.normal(std), (self.f_token, c)
            )
            memory_bus = jnp.broadcast_to(bus[None], (n, self.f_token, c))
            memory_pos = jnp.broadcast_to(bpos[None], (n, self.f_token, c))

        output = src_flat
        # activation remat per layer: at 25k tokens the encoder's saved
        # intermediates dominate training HBM (the flagship train step OOMs
        # a 16G chip without it); statics = spatial_shapes / deterministic
        save_msda = jax.checkpoint_policies.save_only_these_names("msda_out")
        enc_cls = (
            nn.remat(EncoderLayer, static_argnums=(4, 9), policy=save_msda)
            if self.use_checkpoint else EncoderLayer
        )
        dec_cls = (
            nn.remat(DecoderLayer, static_argnums=(5, 7), policy=save_msda)
            if self.use_checkpoint else DecoderLayer
        )
        for i in range(self.num_encoder_layers):
            output, memory_bus = enc_cls(
                c, self.dim_feedforward, self.dropout, self.activation,
                self.num_feature_levels, self.nhead, self.enc_n_points,
                self.f_token, msda_impl=self.msda_impl, msda_3d=self.msda_3d,
                clip_frames=t, name=f"encoder_layers_{i}",
            )(
                output, pos_flat, enc_ref, spatial_shapes, valid_ratios,
                mask_flat, memory_bus, memory_pos, deterministic,
            )
        memory = output

        # ---- decoder prep (reference :203-215) ----
        tgt_dec = tgt.reshape(b * t, q_per_frame, c)
        query_pos = jnp.broadcast_to(
            query_embed[None], (b * t, q_per_frame, c)
        )
        # coordinate math is pinned to f32: on the bf16 compute path a [0,1]
        # box center quantised to bf16 (~0.4% rel) drifts pixels at 640px
        init_reference = nn.sigmoid(
            nn.Dense(2, kernel_init=xavier, name="reference_points")(query_pos)
        ).astype(jnp.float32)

        # ---- decoder ----
        reference_points = init_reference
        out = tgt_dec
        hs, inter_refs, coords, samples = [], [], [], []
        for i in range(self.num_decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (
                    reference_points[:, :, None]
                    * jnp.concatenate([valid_ratios] * 2, axis=-1)[:, None]
                )
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            out, loc, attn_w = dec_cls(
                c, self.dim_feedforward, self.dropout, self.activation,
                self.num_feature_levels, self.nhead, self.dec_n_points,
                self.q_trans, msda_impl=self.msda_impl, msda_3d=self.msda_3d,
                clip_frames=t, name=f"decoder_layers_{i}",
            )(
                out, query_pos, ref_input, memory, spatial_shapes, mask_flat,
                deterministic,
            )

            # top-30 sampling locations for visualization (reference :746-758)
            nq = loc.shape[1]
            loc_n = loc / valid_ratios[:, None, None, :, None, :]
            w_flat = attn_w.reshape(n, nq, -1)
            s_flat = loc_n.reshape(n, nq, -1, 2)
            top_w, top_i = jax.lax.top_k(w_flat, 30)
            top_s = jnp.take_along_axis(s_flat, top_i[..., None], axis=2)
            samples.append(top_s)

            if self.with_box_refine:
                tmp = MLPHead(c, 4, 3, last_bias_low_wh=(i == 0),
                              name=f"bbox_embed_{i}")(out)
                if reference_points.shape[-1] == 4:
                    new_ref = nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    new_ref = nn.sigmoid(
                        jnp.concatenate(
                            [
                                tmp[..., :2] + inverse_sigmoid(reference_points),
                                tmp[..., 2:],
                            ],
                            axis=-1,
                        )
                    )
                coords.append(new_ref)
                reference_points = jax.lax.stop_gradient(new_ref)

            hs.append(out)
            inter_refs.append(reference_points)

        memory_features = []
        start = 0
        for lvl in range(self.num_feature_levels - 1):
            h, w = spatial_shapes[lvl]
            memory_features.append(memory[:, start : start + h * w].reshape(n, h, w, c))
            start += h * w

        return dict(
            hs=jnp.stack(hs),                         # [l, N, q, C]
            memory_features=memory_features,          # 3 x [N, h, w, C] (8x,16x,32x)
            init_reference=init_reference,            # [N, q, 2]
            inter_references=jnp.stack(inter_refs),   # [l, N, q, 2|4]
            memory=memory,                            # [N, S, C]
            coords=jnp.stack(coords) if coords else None,  # [l, N, q, 4]
            inter_samples=jnp.stack(samples),         # [l, N, q, 30, 2]
        )
