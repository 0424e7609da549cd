"""Native checkpoint save/resume (replaces torch.save/load of
{'model','optimizer','lr_scheduler','epoch','args'} — reference
main.py:262-275, util/misc.py:442-444).

Format: a directory with ``variables.msgpack`` (flax serialization of model
variables), ``opt_state.msgpack``, and ``meta.json`` (epoch, step, config).
Only process 0 writes (save_on_master semantics)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(
    path: str,
    variables: Dict,
    opt_state: Any = None,
    epoch: int = 0,
    step: int = 0,
    extra: Optional[Dict] = None,
):
    try:
        if jax.process_index() != 0:
            return
    except Exception:
        pass
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "variables.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(variables)))
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(jax.device_get(opt_state)))
    meta = {"epoch": epoch, "step": step}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(
    path: str, variables_template: Dict, opt_state_template: Any = None
) -> Tuple[Dict, Any, Dict]:
    with open(os.path.join(path, "variables.msgpack"), "rb") as fh:
        variables = serialization.from_bytes(variables_template, fh.read())
    opt_state = None
    opt_path = os.path.join(path, "opt_state.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as fh:
            opt_state = serialization.from_bytes(opt_state_template, fh.read())
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    return variables, opt_state, meta
