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
    count: jnp.ndarray  # [] int32
    mu: jnp.ndarray     # [P] f32
    nu: jnp.ndarray     # [P] f32
    # global grad norm of the LAST update (pre-clip, over all grads incl.
    # frozen — same value torch's clip_grad_norm_ returns, engine.py:77).
    # Exposed so the train step's grad_norm metric reuses this single
    # full-width reduction instead of re-running optax.global_norm's
    # per-leaf (~300 small kernels) pass over the same buffers.
    gnorm: jnp.ndarray  # [] f32


def make_flat_adamw(params, cfg: TrainConfig, steps_per_epoch: int = 1
                    ) -> optax.GradientTransformation:
    """Build the fused transformation for a given params tree. The tree's
    flattened key order fixes the vector layout; state round-trips through
    the template-based checkpoint path like any other pytree."""
    from tce_rvos_tpu.parallel.train_step import (
        cyclic_schedule, multistep_schedule, param_group)

    flat = traverse_util.flatten_dict(params, sep="/")
    paths = list(flat.keys())
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
    rel = np.zeros((total,), np.float32)   # per-element LR multiplier
    live = np.zeros((total,), np.float32)  # 0 where frozen
    for p, o, sz in zip(paths, offsets, sizes):
        group = param_group(p, cfg)
        if group == "frozen":
            continue
        live[o:o + sz] = 1.0
        rel[o:o + sz] = 1.0 if cfg.cyclic_lr else lrs[group]

    if cfg.cyclic_lr:
        # reference main.py:245-249: CyclicLR overrides every group with the
        # same triangular wave
        common = cyclic_schedule(*cfg.cyclic_lr_boundary, steps_per_epoch // 2)
    else:
        common = multistep_schedule(1.0, cfg, steps_per_epoch)

    rel_v = jnp.asarray(rel)
    wd_v = jnp.asarray(live * cfg.weight_decay)
    live_v = jnp.asarray(live)
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
        z = jnp.zeros((total,), jnp.float32)
        return FlatAdamWState(
            jnp.zeros((), jnp.int32), z, z, jnp.zeros((), jnp.float32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("flat adamw requires params (weight decay)")
        g_all = _flatten(grads)
        p = _flatten(params)
        # clip over ALL grads (optax chain clips before the frozen tier's
        # set_to_zero; torch clips every param's grad, engine.py:77)
        gnorm = jnp.sqrt(jnp.sum(g_all * g_all))
        g = g_all * jnp.where(gnorm < clip, 1.0, clip / gnorm) * live_v
        c = state.count + 1
        mu = _B1 * state.mu + (1.0 - _B1) * g
        nu = _B2 * state.nu + (1.0 - _B2) * (g * g)
        cf = c.astype(jnp.float32)
        mhat = mu / (1.0 - _B1 ** cf)
        nhat = nu / (1.0 - _B2 ** cf)
        adam = mhat / (jnp.sqrt(nhat) + _EPS)
        lr_t = common(state.count)  # pre-increment, optax scale_by_schedule
        upd = (-lr_t) * rel_v * (adam + wd_v * p)
        return _unflatten(upd, grads), FlatAdamWState(c, mu, nu, gnorm)

    return optax.GradientTransformation(init, update)
