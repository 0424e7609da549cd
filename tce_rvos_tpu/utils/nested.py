"""Padded-batch containers — the TPU replacement for the reference's
NestedTensor (util/misc.py:299-400).

XLA wants static shapes, so instead of a runtime-ragged container we carry an
explicit ``(data, mask)`` pair where ``mask`` is True on padded elements
(same polarity as the reference), and we provide *bucketing* so that a stream
of videos with varying resolutions compiles only a handful of programs.

Layout is channel-last: videos are ``[B, T, H, W, 3]``, masks ``[B, T, H, W]``.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import jax
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MaskedArray:
    """(data, pad-mask) pair. ``mask`` is True where padded."""

    data: jax.Array | np.ndarray
    mask: jax.Array | np.ndarray

    def tree_flatten(self):
        return (self.data, self.mask), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape


def _round_up(x: int, d: int) -> int:
    return ((x + d - 1) // d) * d


def pad_to(size: int, divisor: int, buckets: Sequence[int] | None = None) -> int:
    """Smallest padded size: next bucket if given, else next multiple of divisor."""
    padded = _round_up(size, divisor)
    if buckets:
        for b in sorted(buckets):
            if b >= padded:
                return b
        return _round_up(size, divisor)
    return padded


def batch_videos(
    videos: Iterable[np.ndarray],
    size_divisibility: int = 32,
    hw_buckets: Sequence[int] | None = None,
) -> MaskedArray:
    """Pad a list of ``[T, H, W, 3]`` float videos to a common
    ``[B, T, Hp, Wp, 3]`` batch with a ``[B, T, Hp, Wp]`` True-on-pad mask.

    Behavioural parity with the reference's
    ``nested_tensor_from_videos_list`` (util/misc.py:299-377): zero padding
    for pixels, size_divisibility=32, pad mask True outside the original
    extent. Bucketing (absent in the reference) keeps jit recompiles bounded.
    """
    videos = [np.asarray(v) for v in videos]
    t_max = max(v.shape[0] for v in videos)
    h_max = pad_to(max(v.shape[1] for v in videos), size_divisibility, hw_buckets)
    w_max = pad_to(max(v.shape[2] for v in videos), size_divisibility, hw_buckets)
    b = len(videos)
    data = np.zeros((b, t_max, h_max, w_max, 3), dtype=videos[0].dtype)
    mask = np.ones((b, t_max, h_max, w_max), dtype=bool)
    for i, v in enumerate(videos):
        t, h, w = v.shape[:3]
        data[i, :t, :h, :w] = v
        mask[i, :t, :h, :w] = False
    return MaskedArray(data, mask)


def batch_tensors(
    tensors: Iterable[np.ndarray], size_divisibility: int = 32
) -> MaskedArray:
    """Pad a list of ``[T, H, W]`` mask stacks (or ``[H, W]`` images) to a
    common shape; parity with nested_tensor_from_tensor_list(split=False)
    (util/misc.py:310-340)."""
    tensors = [np.asarray(x) for x in tensors]
    shapes = np.array([x.shape for x in tensors])
    maxes = shapes.max(axis=0)
    maxes[-2] = _round_up(int(maxes[-2]), size_divisibility)
    maxes[-1] = _round_up(int(maxes[-1]), size_divisibility)
    b = len(tensors)
    data = np.zeros((b, *maxes.tolist()), dtype=tensors[0].dtype)
    mask = np.ones((b, *maxes.tolist()), dtype=bool)
    for i, x in enumerate(tensors):
        sl = (i,) + tuple(slice(0, s) for s in x.shape)
        data[sl] = x
        mask[sl] = False
    return MaskedArray(data, mask)
