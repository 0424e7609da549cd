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

Two entry points share one layout and one set of update semantics:

  * ``make_flat_adamw`` — optax ``GradientTransformation`` (updates tree
    out, ``optax.apply_updates`` applies it). The parity/compat surface.
  * ``make_flat_adamw_fused`` — ``apply_params(grads, state, params)``
    returns NEW PARAMS directly. Weight decay and the per-tier LR are
    folded into per-leaf fused slice-multiply-add kernels, so the
    full-width params flatten, the update concats, the update unflatten,
    and the separate apply pass all disappear (~18 ms/step of
    concat/copy traffic at flagship size — BASELINE.md round-3). An
    ``optimization_barrier`` forces the adam vector to materialize ONCE
    before the ~600 per-leaf slices (without it XLA duplicates the
    producer into every slice consumer — the measured 11.2 s/step
    fuse-duplication dead end).

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

from typing import Callable, NamedTuple

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


class FlatAdamWFused(NamedTuple):
    init: Callable
    apply_params: Callable  # (grads, state, params) -> (new_params, state)


_TIER_ORDER = ("frozen", "base", "backbone", "text_encoder", "linear_proj")


class _Layout(NamedTuple):
    """Tier-sorted flat layout + schedule shared by both builders.

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

    paths: tuple
    shapes: tuple
    sizes: tuple
    offsets: tuple          # into the full (frozen-inclusive) vector
    rels: tuple             # per-leaf LR multiplier scalar (0.0 = frozen)
    frozen_len: int
    live_total: int
    tier_slices: tuple      # [(lo, hi, rel)] in LIVE coords, contiguous
    common: Callable        # shared schedule scalar(step)
    wd: float
    clip: float


def _layout(params, cfg: TrainConfig, steps_per_epoch: int) -> _Layout:
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
    tier_of = [param_group(p, cfg) for p in paths]
    rels = [
        0.0 if t == "frozen" else (1.0 if cfg.cyclic_lr else lrs[t])
        for t in tier_of
    ]
    frozen_len = sum(sz for t, sz in zip(tier_of, sizes) if t == "frozen")
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

    return _Layout(
        paths=tuple(paths), shapes=tuple(shapes), sizes=tuple(sizes),
        offsets=tuple(int(o) for o in offsets), rels=tuple(rels),
        frozen_len=frozen_len, live_total=live_total,
        tier_slices=tuple(tier_slices), common=common,
        wd=cfg.weight_decay, clip=cfg.clip_max_norm,
    )


def _flatten(lay: _Layout, tree):
    f = traverse_util.flatten_dict(tree, sep="/")
    return jnp.concatenate(
        [jnp.ravel(f[p]).astype(jnp.float32) for p in lay.paths])


def _init(lay: _Layout):
    def init(params_):
        z = jnp.zeros((lay.live_total,), jnp.float32)
        zi = jnp.zeros((), jnp.int32)
        return FlatAdamWState(zi, zi, z, z, jnp.zeros((), jnp.float32))
    return init


def _moments(lay: _Layout, grads, state):
    """Shared front half: grads flatten, global-norm clip, moment update,
    bias-corrected adam direction (LIVE width). Returns
    (adam, lr_t, mu, nu, count, gnorm)."""
    g_all = _flatten(lay, grads)
    # clip over ALL grads (optax chain clips before the frozen tier's
    # set_to_zero; torch clips every param's grad, engine.py:77)
    gnorm = jnp.sqrt(jnp.sum(g_all * g_all))
    # frozen prefix: zero update, moments not stored — slice it off
    g = g_all[lay.frozen_len:] * jnp.where(
        gnorm < lay.clip, 1.0, lay.clip / gnorm)
    c = state.count + 1
    mu = _B1 * state.mu + (1.0 - _B1) * g
    nu = _B2 * state.nu + (1.0 - _B2) * (g * g)
    cf = c.astype(jnp.float32)
    mhat = mu / (1.0 - _B1 ** cf)
    nhat = nu / (1.0 - _B2 ** cf)
    adam = mhat / (jnp.sqrt(nhat) + _EPS)
    lr_t = lay.common(state.sched)  # pre-increment, optax scale_by_schedule
    return adam, lr_t, mu, nu, c, gnorm


def make_flat_adamw(params, cfg: TrainConfig, steps_per_epoch: int = 1
                    ) -> optax.GradientTransformation:
    """optax-interface builder (see module docstring and ``_Layout``)."""
    lay = _layout(params, cfg, steps_per_epoch)

    def _unflatten(vec, like):
        f = traverse_util.flatten_dict(like, sep="/")
        out = {
            p: vec[o:o + sz].reshape(sh).astype(f[p].dtype)
            for p, o, sz, sh in zip(lay.paths, lay.offsets, lay.sizes,
                                    lay.shapes)
        }
        return traverse_util.unflatten_dict(out, sep="/")

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat adamw requires params (weight decay)")
        adam, lr_t, mu, nu, c, gnorm = _moments(lay, grads, state)
        p = _flatten(lay, params)[lay.frozen_len:]
        aw = adam + lay.wd * p
        # per-tier base LR: scalar * static contiguous slice (the former
        # full-width rel vector, without the [P] constant)
        upd_live = jnp.concatenate(
            [r * aw[lo:hi] for lo, hi, r in lay.tier_slices]
        ) * (-lr_t)
        upd = (
            jnp.concatenate(
                [jnp.zeros((lay.frozen_len,), jnp.float32), upd_live])
            if lay.frozen_len else upd_live
        )
        return _unflatten(upd, grads), FlatAdamWState(
            c, state.sched + 1, mu, nu, gnorm)

    return optax.GradientTransformation(_init(lay), update)


def make_flat_adamw_fused(params, cfg: TrainConfig, steps_per_epoch: int = 1
                          ) -> FlatAdamWFused:
    """Fused-apply builder: same state, same math, new params out.

    new_p = p * (1 - lr_t*rel*wd) - lr_t*rel*adam_slice, one fused
    slice-multiply-add kernel per live leaf (frozen leaves pass through
    untouched — rel = 0 kills both terms exactly as in the optax chain)."""
    lay = _layout(params, cfg, steps_per_epoch)

    def apply_params(grads, state, params):
        adam, lr_t, mu, nu, c, gnorm = _moments(lay, grads, state)
        # ONE materialization of the adam vector; without this barrier XLA
        # duplicates the whole moments computation into each of the ~600
        # per-leaf slice consumers (the 11.2 s/step dead end, BASELINE.md)
        adam = jax.lax.optimization_barrier(adam)
        fp = traverse_util.flatten_dict(params, sep="/")
        new = {}
        for p_, o, sz, sh, r in zip(lay.paths, lay.offsets, lay.sizes,
                                    lay.shapes, lay.rels):
            leaf = fp[p_]
            if r == 0.0:  # frozen tier: passthrough, no decay, no update
                new[p_] = leaf
                continue
            lo = o - lay.frozen_len
            seg = adam[lo:lo + sz].reshape(sh)
            step_lr = lr_t * r
            new[p_] = (
                leaf * (1.0 - step_lr * lay.wd) - step_lr * seg
            ).astype(leaf.dtype)
        new_params = traverse_util.unflatten_dict(new, sep="/")
        return new_params, FlatAdamWState(c, state.sched + 1, mu, nu, gnorm)

    return FlatAdamWFused(_init(lay), apply_params)
