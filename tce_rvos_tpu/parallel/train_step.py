"""Training step: AdamW with the reference's name-keyed LR tiers, MultiStep
schedule, global-norm clipping, and a single jitted update.

Parity targets:
  * 4 param groups by name-substring (reference main.py:82-111):
    base lr / backbone lr / text-encoder lr / linear-proj (reference_points,
    sampling_offsets) lr × mult;
  * AdamW(weight_decay) + MultiStepLR(gamma=0.1 at lr_drop epochs)
    (main.py:133-135);
  * grad clip by global norm (engine.py:77);
  * loss = sum of weighted criterion losses (engine.py:57).

TPU-native: the whole step is one jit; with the batch sharded over the
'data' mesh axis the gradient all-reduce is XLA's psum over ICI — there is
no DDP wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from tce_rvos_tpu.config import TrainConfig
from tce_rvos_tpu.models.criterion import CriterionConfig, criterion


def _is_encoder_path(path: str) -> bool:
    """Params owned by the deformable encoder — the reference's
    ``model.transformer.encoder.parameters()`` (main.py:59-61) covers the
    encoder layers AND the FTF memory bus/pos (owned by the encoder there,
    tce_deformable_transformer.py:560-565)."""
    return any(n in path for n in ("encoder_layers_", "memory_bus", "memory_pos"))


def param_group(path: str, cfg: TrainConfig) -> str:
    """Classify a flattened param path into its LR tier, mirroring the
    name-substring matching of reference main.py:91-111. Our path spellings:
    'backbone/...', 'text_encoder/...', '.../reference_points/...',
    '.../sampling_offsets/...'. With ``pretrain_enc`` everything outside the
    deformable encoder is frozen (reference main.py:57-61)."""
    if cfg.pretrain_enc and not _is_encoder_path(path):
        return "frozen"
    if "text_encoder" in path:
        # frozen text encoder: the reference's optimizer only sees
        # requires_grad params (main.py:91-111) — no AdamW update AND no
        # decoupled weight decay may touch the pretrained RoBERTa weights
        return "frozen" if cfg.freeze_text_encoder else "text_encoder"
    if path.startswith("backbone/") or "/backbone/" in path:
        return "backbone"
    if any(n in path for n in ("reference_points", "sampling_offsets")):
        return "linear_proj"
    return "base"


def multistep_schedule(base_lr: float, cfg: TrainConfig, steps_per_epoch: int):
    boundaries = {e * steps_per_epoch: 0.1 for e in cfg.lr_drop}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def cyclic_schedule(lo: float, hi: float, half_period: int):
    """Per-step triangular CyclicLR (reference main.py:245-249: base->max
    over ``half_period`` steps, back down, repeat; mode='triangular',
    cycle-constant scale)."""
    half = max(int(half_period), 1)

    def schedule(step):
        phase = jnp.mod(step, 2 * half).astype(jnp.float32) / half
        tri = 1.0 - jnp.abs(phase - 1.0)
        return lo + (hi - lo) * tri

    return schedule


def make_optimizer(params, cfg: TrainConfig, steps_per_epoch: int = 1):
    flat = traverse_util.flatten_dict(params, sep="/")
    labels_flat = {k: param_group(k, cfg) for k in flat}
    labels = traverse_util.unflatten_dict(labels_flat, sep="/")

    lrs = {
        "base": cfg.lr,
        "backbone": cfg.lr_backbone,
        "text_encoder": cfg.lr_text_encoder,
        "linear_proj": cfg.lr * cfg.lr_linear_proj_mult,
    }

    def tier(lr):
        if cfg.cyclic_lr:
            # torch CyclicLR with scalar boundaries overrides every param
            # group's lr with the same triangular wave (main.py:245-249)
            lo, hi = cfg.cyclic_lr_boundary
            sched = cyclic_schedule(lo, hi, steps_per_epoch // 2)
        else:
            sched = multistep_schedule(lr, cfg, steps_per_epoch)
        return optax.adamw(sched, weight_decay=cfg.weight_decay)

    tiers = {k: tier(v) for k, v in lrs.items()}
    if cfg.pretrain_enc or cfg.freeze_text_encoder:
        tiers["frozen"] = optax.set_to_zero()
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.multi_transform(tiers, labels),
    )
    return tx


@struct.dataclass
class TrainState:
    params: Any
    frozen: Any            # FrozenBatchNorm buffers etc. (non-trainable)
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, cfg: TrainConfig, steps_per_epoch: int = 1):
    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}
    if cfg.flat_opt:
        from tce_rvos_tpu.parallel.flat_adamw import make_flat_adamw_fused
        tx = make_flat_adamw_fused(params, cfg, steps_per_epoch)
    else:
        tx = make_optimizer(params, cfg, steps_per_epoch)
    return TrainState(
        params=params,
        frozen=frozen,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    ), tx


def base_lr_schedule(cfg: TrainConfig, steps_per_epoch: int = 1):
    """The base param-group's LR as a function of the global step — what the
    reference logs as ``lr`` every iteration (engine.py's metric logger reads
    param_groups[0]); used for the train step's ``lr`` metric."""
    if cfg.cyclic_lr:
        lo, hi = cfg.cyclic_lr_boundary
        return cyclic_schedule(lo, hi, steps_per_epoch // 2)
    return multistep_schedule(cfg.lr, cfg, steps_per_epoch)


def seed_schedule_step(state: TrainState, step: int) -> TrainState:
    """Fast-forward ONLY the LR-schedule counters after a resume that
    carried no optimizer state (reference-format torch .pth checkpoints).
    The reference restores its lr_scheduler on resume (main.py:195-211) —
    MultiStep ``lr_drop`` boundaries are measured from epoch 0, not from
    the resume point — while its Adam starts FRESH (no optimizer state in
    the checkpoint). The Adam step counters (ScaleByAdamState.count,
    FlatAdamWState.count) must therefore stay 0: fast-forwarding the
    bias-correction counter with zero moments would scale the first
    post-resume updates by ~(1/(1-b1))/sqrt(1/(1-b2)) ≈ 3.2x. Only
    ScaleByScheduleState.count / FlatAdamWState.sched (and
    ``TrainState.step``) are seeded."""
    from tce_rvos_tpu.parallel.flat_adamw import FlatAdamWState

    s = jnp.asarray(step, jnp.int32)
    targets = (FlatAdamWState, optax.ScaleByScheduleState)

    def fix(node):
        if isinstance(node, FlatAdamWState):
            return node._replace(sched=s)
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(count=s.astype(node.count.dtype))
        return node

    new_opt = jax.tree.map(
        fix, state.opt_state, is_leaf=lambda n: isinstance(n, targets)
    )
    return state.replace(opt_state=new_opt, step=s)


def make_train_step(
    model_apply: Callable,
    tx,
    crit_cfg: CriterionConfig,
    compute_dtype: str | None = None,
    lr_fn: Callable | None = None,
) -> Callable:
    """Returns jittable step(state, batch, dropout_rng) -> (state, metrics).
    ``batch``: dict with model inputs + 'targets' dict for the criterion.

    ``compute_dtype="bfloat16"`` enables MIXED-PRECISION training (TPU-only
    design choice; the reference trains plain fp32 — main.py has no AMP):
    master params and optimizer state stay f32, the forward/backward run
    with bf16 params/activations (cast inside the loss so the cast's VJP
    returns f32 grads), and the criterion consumes f32-upcast outputs.
    bf16 has fp32's exponent range, so no loss scaling is needed."""
    cast = None
    if compute_dtype not in (None, "float32"):
        from tce_rvos_tpu.utils.precision import cast_floating, resolve_dtype

        cast = resolve_dtype(compute_dtype)

    def loss_fn(params, frozen, batch, rng):
        variables = {"params": params, **frozen}
        video = batch["video"]
        if cast is not None:
            variables = cast_floating(variables, cast)
            video = video.astype(cast)
        outputs = model_apply(
            variables,
            video=video,
            video_mask=batch["video_mask"],
            text_ids=batch["text_ids"],
            text_attn_mask=batch["text_attn_mask"],
            sizes=batch["sizes"],
            valid_indices=batch.get("valid_indices"),
            deterministic=False,
            rngs={"dropout": rng},
        )
        if cast is not None:
            outputs = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == cast else x,
                outputs,
            )
        losses = criterion(crit_cfg, outputs, batch["targets"])
        total = sum(losses.values())
        return total, losses

    def step(state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen, batch, rng
        )
        if hasattr(tx, "apply_params"):
            # fused flat AdamW: new params come out directly (weight decay
            # and per-tier LR folded into per-leaf fused kernels — no
            # full-width params flatten / update unflatten, see
            # flat_adamw.make_flat_adamw_fused)
            new_params, new_opt = tx.apply_params(
                grads, state.opt_state, state.params)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        # the flat optimizer already reduced the global norm in one
        # full-width pass; reuse it instead of optax.global_norm's
        # per-leaf kernels over the same grads
        gnorm = getattr(new_opt, "gnorm", None)
        metrics["grad_norm"] = (
            gnorm if gnorm is not None else optax.global_norm(grads)
        )
        if lr_fn is not None:
            # the base group's live LR (what the reference's iteration log
            # shows); schedules index by the pre-increment step count
            metrics["lr"] = lr_fn(state.step)
        new_state = TrainState(
            params=new_params,
            frozen=state.frozen,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return step
