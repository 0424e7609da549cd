"""Fused flat AdamW: the reference's optimizer semantics (param-group LRs
from name matching, AdamW + weight decay, MultiStep/Cyclic LR, global-norm
clipping — reference main.py:82-135, engine.py:77) executed as a handful of
full-width elementwise passes over ONE concatenated f32 vector.

Why: the per-leaf optax chain (`train_step.make_optimizer`) emits several
small kernels per parameter leaf; with ~300 leaves the train-step profile
books ~13 ms/step of "optimizer mults" against ~3 ms of actual HBM traffic
for a 60M-param update. Flattening params/moments into single vectors turns
the update into ~8 big vector ops (plus one concat/split pair), which is
bandwidth-bound instead of kernel-launch-bound.

Parity contract (tested in tests/test_flat_adamw.py against the optax
chain): identical updates to
``chain(clip_by_global_norm(c), multi_transform(adamw-tiers))`` —
  * global norm over ALL grads (incl. the frozen tier, which the chain
    clips before set_to_zero) — matches torch clip over model params;
  * per-tier base LR folded into a per-element ``rel`` vector; the shared
    schedule shape (0.1 MultiStep decay, or the CyclicLR triangle that the
    reference applies uniformly to every group) stays a scalar;
  * frozen tier (``--pretrain_enc``): grads masked to zero BEFORE the
    moment updates (mu/nu stay exactly 0) and rel=0 kills both the Adam
    and weight-decay terms;
  * optax step-count conventions: bias correction at count+1, schedule
    evaluated at pre-increment count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from tce_rvos_tpu.config import TrainConfig

_B1, _B2, _EPS = 0.9, 0.999, 1e-8  # optax.adamw defaults


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray  # [] int32 Adam step count (bias correction)
    # LR-schedule step count. Equal to ``count`` in normal operation, but
    # seeded SEPARATELY on a weights-only resume (seed_schedule_step):
    # torch restores the lr_scheduler at epoch E while Adam starts fresh —
    # fast-forwarding the bias-correction counter with zero moments would
    # make the first post-resume updates ~1/sqrt(1-b2)/(1-b1)-scale
    # (~3.2x) instead of 1x.
    sched: jnp.ndarray  # [] int32
    mu: jnp.ndarray     # [P_live] f32 (live params only — frozen moments
    nu: jnp.ndarray     # are identically zero and are not stored)
    # global grad norm of the LAST update (pre-clip, over all grads incl.
    # frozen — same value torch's clip_grad_norm_ returns, engine.py:77).
    # Exposed so the train step's grad_norm metric reuses this single
    # full-width reduction instead of re-running optax.global_norm's
    # per-leaf (~300 small kernels) pass over the same buffers.
    gnorm: jnp.ndarray  # [] f32


_TIER_ORDER = ("frozen", "base", "backbone", "text_encoder", "linear_proj")


def make_flat_adamw(params, cfg: TrainConfig, steps_per_epoch: int = 1
                    ) -> optax.GradientTransformation:
    """Build the fused transformation for a given params tree.

    The flat vector layout is TIER-SORTED: leaves are ordered
    [frozen | base | backbone | text_encoder | linear_proj] (stable within
    a tier), so the per-element LR-multiplier / frozen-mask vectors of the
    reference's param grouping collapse to STATIC slice boundaries plus
    per-tier scalars. The former full-width ``rel``/``wd``/``live``
    vectors were three [P]-sized captured constants — 2.2 GB of embedded
    HLO at flagship size, which broke remote compilation and bloated every
    compiled artifact. The sorted layout is deterministic given
    (params tree, TrainConfig); optimizer state round-trips through the
    template-based checkpoint path like any other pytree."""
    from tce_rvos_tpu.parallel.train_step import (
        cyclic_schedule, multistep_schedule, param_group)

    flat = traverse_util.flatten_dict(params, sep="/")
    paths = sorted(
        flat.keys(), key=lambda p: _TIER_ORDER.index(param_group(p, cfg))
    )
    shapes = [np.shape(flat[p]) for p in paths]
    sizes = [int(np.prod(s, dtype=np.int64)) for s in shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    total = int(offsets[-1])

    lrs = {
        "base": cfg.lr,
        "backbone": cfg.lr_backbone,
        "text_encoder": cfg.lr_text_encoder,
        "linear_proj": cfg.lr * cfg.lr_linear_proj_mult,
    }
    # contiguous [lo, hi) per tier (tier-sorted layout), frozen first
    tier_of = [param_group(p, cfg) for p in paths]
    frozen_len = sum(
        sz for t, sz in zip(tier_of, sizes) if t == "frozen"
    )
    live_total = total - frozen_len
    # live-tier slices in LIVE-vector coordinates (offset - frozen_len)
    tier_slices = []  # [(lo, hi, rel_scalar)]
    for tier in _TIER_ORDER[1:]:
        lo = hi = None
        for t, o, sz in zip(tier_of, offsets, sizes):
            if t == tier and sz:
                lo = int(o) if lo is None else lo
                hi = int(o) + sz
        if lo is not None:
            rel = 1.0 if cfg.cyclic_lr else lrs[tier]
            tier_slices.append((lo - frozen_len, hi - frozen_len, rel))

    if cfg.cyclic_lr:
        # reference main.py:245-249: CyclicLR overrides every group with the
        # same triangular wave
        common = cyclic_schedule(*cfg.cyclic_lr_boundary, steps_per_epoch // 2)
    else:
        common = multistep_schedule(1.0, cfg, steps_per_epoch)

    wd = cfg.weight_decay
    clip = cfg.clip_max_norm

    def _flatten(tree):
        f = traverse_util.flatten_dict(tree, sep="/")
        return jnp.concatenate(
            [jnp.ravel(f[p]).astype(jnp.float32) for p in paths])

    def _unflatten(vec, like):
        f = traverse_util.flatten_dict(like, sep="/")
        out = {
            p: vec[int(o):int(o) + sz].reshape(sh).astype(f[p].dtype)
            for p, o, sz, sh in zip(paths, offsets, sizes, shapes)
        }
        return traverse_util.unflatten_dict(out, sep="/")

    def init(params_):
        z = jnp.zeros((live_total,), jnp.float32)
        zi = jnp.zeros((), jnp.int32)
        return FlatAdamWState(zi, zi, z, z, jnp.zeros((), jnp.float32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat adamw requires params (weight decay)")
        g_all = _flatten(grads)
        # clip over ALL grads (optax chain clips before the frozen tier's
        # set_to_zero; torch clips every param's grad, engine.py:77)
        gnorm = jnp.sqrt(jnp.sum(g_all * g_all))
        # frozen prefix: zero update, moments not stored — slice it off
        g = g_all[frozen_len:] * jnp.where(gnorm < clip, 1.0, clip / gnorm)
        p = _flatten(params)[frozen_len:]
        c = state.count + 1
        mu = _B1 * state.mu + (1.0 - _B1) * g
        nu = _B2 * state.nu + (1.0 - _B2) * (g * g)
        cf = c.astype(jnp.float32)
        mhat = mu / (1.0 - _B1 ** cf)
        nhat = nu / (1.0 - _B2 ** cf)
        adam = mhat / (jnp.sqrt(nhat) + _EPS)
        lr_t = common(state.sched)  # pre-increment, optax scale_by_schedule
        aw = adam + wd * p
        # per-tier base LR: scalar * static contiguous slice (the former
        # full-width rel vector, without the [P] constant)
        upd_live = jnp.concatenate(
            [r * aw[lo:hi] for lo, hi, r in tier_slices]
        ) * (-lr_t)
        upd = (
            jnp.concatenate([jnp.zeros((frozen_len,), jnp.float32), upd_live])
            if frozen_len else upd_live
        )
        return _unflatten(upd, grads), FlatAdamWState(
            c, state.sched + 1, mu, nu, gnorm)

    return optax.GradientTransformation(init, update)
