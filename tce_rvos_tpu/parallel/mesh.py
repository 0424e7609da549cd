"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL process groups (util/misc.py:447-488) and its
mp.Process-per-GPU inference fan-out (inference_ytvos.py:88-113).

Parallelism map (SURVEY.md §2.5):
  * training: data-parallel over the clip batch — batch axis sharded over the
    'data' mesh axis; XLA inserts the gradient psum over ICI (replaces DDP's
    bucketed all-reduce);
  * inference: clip fan-out over chips (each device gets whole clips) or
    frame-axis (sequence-parallel) sharding of one long video — the only
    cross-frame ops (FTF token attention, IQT query attention) become single
    all-gathers of tiny token/query tensors over ICI, which XLA derives from
    the sharding propagation; no hand-written collectives.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
same code path covers single-chip, one host × N chips, and M hosts (DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (default) or N-D mesh over local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every array's leading axis over ``axis``; arrays whose leading
    dim isn't divisible stay replicated."""
    size = mesh.shape[axis]

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % size == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def shard_time_axis(tree, mesh: Mesh, axis: str = "data"):
    """Sequence-parallel layout for single-video inference: shard axis 1
    (frames) over the mesh. Used when one clip is longer than a chip's
    appetite (replaces the reference's 32-frame chunking constraint,
    inference_davis.py:201-213)."""
    size = mesh.shape[axis]

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 2 and x.shape[1] % size == 0:
            spec = P(None, axis, *([None] * (x.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
