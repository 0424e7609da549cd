"""Native checkpoint save/resume (replaces torch.save/load of
{'model','optimizer','lr_scheduler','epoch','args'} — reference
main.py:262-275, util/misc.py:442-444).

Two backends:

  * msgpack (default) — a directory with ``variables.msgpack`` (flax
    serialization of model variables), ``opt_state.msgpack``, and
    ``meta.json`` (epoch, step, config). Only process 0 writes
    (save_on_master semantics). Single-host, simple, dependency-free.
  * orbax — ``OrbaxCheckpointManager`` below: the production path for
    multi-host / sharded training (each host writes its own shards,
    restore honors the target's shardings) with retention policy and
    step bookkeeping.
"""

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
            try:
                opt_state = serialization.from_bytes(
                    opt_state_template, fh.read())
            except ValueError as e:
                # the most common structure mismatch: the checkpoint was
                # written under the other optimizer layout (fused flat
                # AdamW vs the per-leaf optax chain — --flat_opt /
                # --no-flat_opt). Same update semantics, different state
                # pytree; tell the operator which switch to flip instead
                # of surfacing a raw flax deserialization error.
                raise ValueError(
                    f"optimizer state in {opt_path!r} does not match the "
                    "configured optimizer's layout. If this checkpoint was "
                    "saved before the fused flat AdamW became the default, "
                    "resume with --no-flat_opt (or with --flat_opt if it "
                    "was saved flat). Original error: " + str(e)
                ) from e
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    return variables, opt_state, meta


def load_any_checkpoint(
    path: str, variables_template: Dict, opt_state_template: Any = None
) -> Tuple[Dict, Any, Dict]:
    """Format-sniffing resume: accepts a native msgpack directory, OR a
    reference-format torch ``.pth`` file / ``https://`` URL (the reference
    resumes from torch checkpoints, incl. torch.hub URLs — main.py:180-196).
    Torch checkpoints carry no optimizer state we can restore (the tree
    layouts differ), so opt_state comes back None and training restarts
    the schedule from the checkpoint's epoch."""
    if os.path.isdir(path):
        return load_checkpoint(path, variables_template, opt_state_template)
    from tce_rvos_tpu.utils.checkpoint import convert_state_dict, load_torch_file

    sd, meta = load_torch_file(path, with_meta=True)
    variables, _, _ = convert_state_dict(sd, variables_template)
    return variables, None, meta


class OrbaxCheckpointManager:
    """Orbax-backed checkpointing for multi-host / sharded training.

    Thin wrapper over ``orbax.checkpoint.CheckpointManager``: saves
    ``{"variables", "opt_state", "meta"}`` per step, keeps ``max_to_keep``
    newest, restores onto templates so sharding annotations are honored
    (every host participates — unlike the msgpack path, do NOT gate on
    process_index).

    Replaces the reference's torch.save rotation of checkpoint{epoch}.pth
    (main.py:258-275) with atomic, async-capable step directories.
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, variables, opt_state=None, meta: Optional[Dict] = None):
        ocp = self._ocp
        items = {"variables": ocp.args.StandardSave(variables)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if meta:
            items["meta"] = ocp.args.JsonSave(meta)
        self.manager.save(step, args=ocp.args.Composite(**items))

    def restore(
        self, variables_template, opt_state_template=None, step: Optional[int] = None
    ) -> Tuple[Dict, Any, Dict]:
        ocp = self._ocp
        if step is None:
            step = self.manager.latest_step()
            if step is None:
                raise FileNotFoundError("no orbax checkpoint found")
        items = {"variables": ocp.args.StandardRestore(variables_template)}
        if opt_state_template is not None:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        restored = self.manager.restore(step, args=ocp.args.Composite(**items))
        meta = {}
        try:
            meta = self.manager.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
            )["meta"] or {}
        except Exception:
            pass
        return restored["variables"], restored.get("opt_state"), meta

    def wait(self):
        """Block until any in-flight async save completes."""
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()
