"""Host-level collective helpers — the TPU-native replacement for the
reference's pickled-bytes NCCL collectives (util/misc.py:103-186).

The reference pickles arbitrary Python objects, pads them to equal byte
length, and all_gathers over NCCL (util/misc.py:103-160) — with an optional
gloo CPU group (MDETR_CPU_REDUCE). Here:

  * in-graph reductions (loss logging, num_boxes) need nothing: under jit
    with sharded inputs XLA inserts the psum — see criterion.py;
  * host-side gathers of *structured arrays* (eval predictions) use
    jax.experimental.multihost_utils.process_allgather;
  * arbitrary-object gather (the RLE dicts of A2D eval) serializes to JSON
    bytes and gathers through a uint8 array — explicit, no pickle.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import numpy as np

import jax


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def encode_object(obj: Any) -> np.ndarray:
    """Object -> uint8 JSON payload (the wire format of the gather)."""
    return np.frombuffer(json.dumps(obj).encode("utf-8"), np.uint8)


def decode_object(row: np.ndarray, length: int) -> Any:
    """Inverse of encode_object on one (possibly padded) gathered row."""
    return json.loads(bytes(np.asarray(row, np.uint8)[:length]).decode("utf-8"))


def gather_encoded(payload: np.ndarray, gather_fn, n: int) -> List[Any]:
    """Shared pad/gather/decode core: ``gather_fn(arr [L]) -> [n, L]`` is the
    transport (multihost process_allgather in production; an XLA all_gather
    over a device mesh in the multichip dryrun)."""
    local_len = np.asarray([payload.size], np.int32)
    all_lens = np.asarray(gather_fn(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(gather_fn(padded))
    return [decode_object(gathered[i], int(all_lens[i])) for i in range(n)]


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one JSON-serializable object per process; returns the list of
    all processes' objects (single-process: [obj])."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return gather_encoded(
        encode_object(obj),
        lambda arr: np.asarray(multihost_utils.process_allgather(arr)),
        jax.process_count(),
    )


def reduce_dict_mean(d: Dict[str, float]) -> Dict[str, float]:
    """Average scalar metrics across processes (util/misc.py:162-186
    semantics; logging only)."""
    if jax.process_count() == 1:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d.keys())
    vals = np.asarray([float(d[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vals))
    mean = gathered.mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
