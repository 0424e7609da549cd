"""Parity of the fused flat AdamW (parallel/flat_adamw.py) against the
per-leaf optax reference chain (parallel/train_step.make_optimizer):
identical parameter trajectories across MultiStep/Cyclic schedules, LR
tiers, clipping (above and below the norm threshold), and the
``--pretrain_enc`` frozen tier — plus checkpoint round-trip of the flat
state through the msgpack backend.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tce_rvos_tpu.config import TrainConfig
from tce_rvos_tpu.parallel.flat_adamw import make_flat_adamw
from tce_rvos_tpu.parallel.train_step import make_optimizer


def _params(rng):
    """Tree hitting every LR tier: backbone, text_encoder, linear_proj
    (inside an encoder layer so pretrain_enc keeps it live), base, and the
    FTF memory bus (encoder-owned base tier)."""
    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    return {
        "backbone": {"conv": {"kernel": arr(3, 4), "bias": arr(4)}},
        "text_encoder": {"proj": {"kernel": arr(4, 4)}},
        "transformer": {
            "encoder_layers_0": {
                "sampling_offsets": {"kernel": arr(4, 8), "bias": arr(8)},
                "ffn": {"kernel": arr(4, 4)},
            },
            "memory_bus": arr(2, 4),
        },
        "class_head": {"kernel": arr(4, 2), "bias": arr(2)},
    }


def _run(tx, params, grad_seq):
    state = tx.init(params)
    out = []
    for g in grad_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return out


def _grad_seq(params, rng, n, scale=1.0):
    leaves, treedef = jax.tree.flatten(params)
    seq = []
    for _ in range(n):
        gs = [jnp.asarray(rng.standard_normal(l.shape), jnp.float32) * scale
              for l in leaves]
        seq.append(jax.tree.unflatten(treedef, gs))
    return seq


def _assert_traj_close(a, b):
    for pa, pb in zip(a, b):
        flat_a = jax.tree.leaves(pa)
        flat_b = jax.tree.leaves(pb)
        for la, lb in zip(flat_a, flat_b):
            np.testing.assert_allclose(la, lb, rtol=2e-6, atol=2e-7)


@pytest.mark.parametrize(
    "cfg_kw, grad_scale",
    [
        # MultiStep schedule crossing an lr_drop boundary; grads small
        # enough that clipping is INACTIVE
        (dict(lr_drop=(1, 3)), 0.01),
        # clipping ACTIVE every step (global norm >> clip_max_norm)
        (dict(lr_drop=(1, 3)), 10.0),
        # CyclicLR: every tier shares the triangular wave
        (dict(cyclic_lr=True, cyclic_lr_boundary=(1e-5, 1e-4)), 0.01),
        # pretrain_enc: everything outside the encoder frozen, but its
        # grads still count toward the clip norm
        (dict(pretrain_enc=True, lr_drop=(1, 3)), 10.0),
        # frozen text encoder: excluded from the optimizer like the
        # reference's requires_grad filter (main.py:91-111)
        (dict(freeze_text_encoder=True, lr_drop=(1, 3)), 10.0),
    ],
    ids=["multistep", "clipped", "cyclic", "pretrain_enc", "freeze_text"],
)
def test_flat_matches_optax_chain(cfg_kw, grad_scale):
    cfg = TrainConfig(**cfg_kw)
    rng = np.random.default_rng(0)
    params = _params(rng)
    # steps_per_epoch=2 puts lr_drop boundaries (epochs 1,3 -> steps 2,6)
    # and the cyclic half-period inside the 8-step window
    steps_per_epoch = 2
    grads = _grad_seq(params, rng, 8, scale=grad_scale)

    ref = _run(make_optimizer(params, cfg, steps_per_epoch),
               params, grads)
    flat = _run(make_flat_adamw(params, cfg, steps_per_epoch),
                params, grads)
    _assert_traj_close(ref, flat)


def test_frozen_tier_stays_exactly_fixed():
    cfg = TrainConfig(pretrain_enc=True)
    rng = np.random.default_rng(1)
    params = _params(rng)
    tx = make_flat_adamw(params, cfg, 2)
    state = tx.init(params)
    updates, state = tx.update(_grad_seq(params, rng, 1)[0], state, params)
    flat = jax.tree.leaves({
        k: v for k, v in updates.items()
        if k in ("backbone", "text_encoder", "class_head")
    })
    for leaf in flat:
        assert jnp.all(leaf == 0.0), "frozen tier must receive zero update"
    # encoder-owned leaves (incl. memory_bus) do move
    enc = jax.tree.leaves(updates["transformer"])
    assert any(jnp.any(l != 0.0) for l in enc)


@pytest.mark.parametrize("flat", [True, False], ids=["flat", "chain"])
def test_frozen_text_encoder_gets_no_weight_decay(flat):
    """--freeze_text_encoder: the model emits exactly-zero grads for the
    text encoder (stop_gradient), and the optimizer must then leave its
    weights bit-identical — in particular decoupled weight decay must NOT
    multiply the pretrained RoBERTa weights by (1 - lr*wd) each step (the
    torch reference never registers requires_grad=False params)."""
    cfg = TrainConfig(freeze_text_encoder=True)
    rng = np.random.default_rng(7)
    params = _params(rng)
    tx = (make_flat_adamw(params, cfg, 2) if flat
          else make_optimizer(params, cfg, 2))
    state = tx.init(params)
    g = _grad_seq(params, rng, 1)[0]
    g["text_encoder"] = jax.tree.map(jnp.zeros_like, g["text_encoder"])
    updates, _ = tx.update(g, state, params)
    for leaf in jax.tree.leaves(updates["text_encoder"]):
        assert jnp.all(leaf == 0.0), "frozen text encoder must not decay"
    assert any(jnp.any(l != 0.0) for l in jax.tree.leaves(updates["backbone"]))


def test_gnorm_matches_optax_global_norm():
    """The flat state's ``gnorm`` (reused by the train step's grad_norm
    metric) is the pre-clip global norm over ALL grads — the same value
    optax.global_norm reports and torch's clip_grad_norm_ returns."""
    cfg = TrainConfig(pretrain_enc=True)  # frozen grads still count
    rng = np.random.default_rng(3)
    params = _params(rng)
    tx = make_flat_adamw(params, cfg, 2)
    state = tx.init(params)
    g = _grad_seq(params, rng, 1, scale=10.0)[0]
    _, state = tx.update(g, state, params)
    np.testing.assert_allclose(
        float(state.gnorm), float(optax.global_norm(g)), rtol=1e-6)


@pytest.mark.parametrize("flat", [True, False], ids=["flat", "chain"])
def test_seed_schedule_step_matches_real_steps(flat):
    """Resume-from-torch-.pth semantics (reference main.py:195-211): the
    lr_scheduler is restored at epoch E (MultiStep lr_drop boundaries count
    from epoch 0) while Adam starts FRESH — the weights-only checkpoint
    carries no optimizer state, so torch's bias-correction counter is 0.
    seed_schedule_step(N) must therefore produce updates equal to a fresh
    optimizer's first step scaled by lr(N)/lr(0) — NOT equal to N zero-grad
    steps, which would fast-forward the bias-correction counter and make
    the first update ~3.2x too large. N is chosen PAST a drop boundary so
    an unseeded schedule would apply a 10x-too-high LR."""
    from tce_rvos_tpu.parallel.train_step import (
        TrainState, seed_schedule_step)

    cfg = TrainConfig(lr_drop=(1, 3), flat_opt=flat)
    rng = np.random.default_rng(4)
    params = _params(rng)
    steps_per_epoch = 2
    n = 4  # past the first drop (epoch 1 -> step 2): lr(n) = 0.1 * lr(0)
    tx = (make_flat_adamw(params, cfg, steps_per_epoch) if flat
          else make_optimizer(params, cfg, steps_per_epoch))

    seeded = seed_schedule_step(
        TrainState(params=params, frozen={}, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32)),
        n,
    )
    assert int(seeded.step) == n
    if flat:
        assert int(seeded.opt_state.count) == 0   # Adam fresh
        assert int(seeded.opt_state.sched) == n   # schedule advanced

    g = _grad_seq(params, rng, 1)[0]
    upd_fresh, _ = tx.update(g, tx.init(params), params)
    upd_seeded, _ = tx.update(g, seeded.opt_state, params)
    # identical Adam state (count 0, zero moments) => the update vectors
    # differ EXACTLY by the schedule ratio lr(n)/lr(0) = 0.1
    scaled = jax.tree.map(lambda u: 0.1 * u, upd_fresh)
    _assert_traj_close([scaled], [upd_seeded])


@pytest.mark.parametrize("flat", [True, False], ids=["flat", "chain"])
def test_seeded_resume_agrees_across_optimizers(flat):
    """The flat and chain optimizers must produce the same post-seed
    trajectory (both emulate torch's fresh-Adam + restored-scheduler)."""
    from tce_rvos_tpu.parallel.train_step import (
        TrainState, seed_schedule_step)

    cfg = TrainConfig(lr_drop=(1, 3), flat_opt=flat)
    rng = np.random.default_rng(11)
    params = _params(rng)
    n = 4
    tx_f = make_flat_adamw(params, cfg, 2)
    tx_c = make_optimizer(params, cfg, 2)

    def seeded(tx):
        return seed_schedule_step(
            TrainState(params=params, frozen={}, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32)),
            n,
        ).opt_state

    grads = _grad_seq(params, rng, 3)
    sf, sc = seeded(tx_f), seeded(tx_c)
    pf = pc = params
    for g in grads:
        uf, sf = tx_f.update(g, sf, pf)
        uc, sc = tx_c.update(g, sc, pc)
        pf = optax.apply_updates(pf, uf)
        pc = optax.apply_updates(pc, uc)
    _assert_traj_close([pf], [pc])


def test_opt_layout_mismatch_names_the_flag(tmp_path):
    """Resuming a checkpoint written under the other optimizer layout
    (optax chain vs fused flat AdamW) must fail with a message naming
    --flat_opt/--no-flat_opt, not a raw flax deserialization error."""
    from tce_rvos_tpu.utils.native_ckpt import load_checkpoint, save_checkpoint

    cfg = TrainConfig()
    rng = np.random.default_rng(5)
    params = _params(rng)
    chain_state = make_optimizer(params, cfg, 2).init(params)
    save_checkpoint(str(tmp_path / "ck"), {"params": params},
                    opt_state=chain_state, epoch=0, step=1)
    flat_template = make_flat_adamw(params, cfg, 2).init(params)
    with pytest.raises(ValueError, match="no-flat_opt"):
        load_checkpoint(str(tmp_path / "ck"), {"params": params},
                        flat_template)


def test_restore_train_state_seeds_schedule_without_opt_state(tmp_path):
    """train.py resume wiring: a checkpoint that carries NO optimizer
    state (reference torch .pth, or a native save made without one) must
    come back with the LR-schedule counters fast-forwarded to
    start_epoch * steps_per_epoch — and a checkpoint WITH optimizer state
    must restore it verbatim (no seeding)."""
    from tce_rvos_tpu.parallel.train_step import TrainState
    from tce_rvos_tpu.train import restore_train_state
    from tce_rvos_tpu.utils.native_ckpt import save_checkpoint

    cfg = TrainConfig(lr_drop=(1, 3))
    rng = np.random.default_rng(6)
    params = _params(rng)
    steps_per_epoch = 5
    tx = make_flat_adamw(params, cfg, steps_per_epoch)

    def fresh():
        return TrainState(params=params, frozen={}, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    # no opt_state in the checkpoint -> schedule seeded from the epoch
    save_checkpoint(str(tmp_path / "bare"), {"params": params}, epoch=2)
    state, start_epoch = restore_train_state(
        fresh(), str(tmp_path / "bare"), None, steps_per_epoch)
    assert start_epoch == 3
    assert int(state.opt_state.sched) == 3 * steps_per_epoch
    assert int(state.opt_state.count) == 0  # Adam starts fresh (torch)
    assert int(state.step) == 3 * steps_per_epoch

    # opt_state present -> restored verbatim, step from meta
    stepped = tx.init(params)
    g = _grad_seq(params, rng, 1)[0]
    _, stepped = tx.update(g, stepped, params)
    save_checkpoint(str(tmp_path / "full"), {"params": params},
                    opt_state=stepped, epoch=0, step=1)
    state2, start2 = restore_train_state(
        fresh(), str(tmp_path / "full"), None, steps_per_epoch)
    assert start2 == 1 and int(state2.opt_state.count) == 1
    assert int(state2.step) == 1
    np.testing.assert_array_equal(np.asarray(state2.opt_state.mu),
                                  np.asarray(stepped.mu))


def test_flat_state_checkpoint_roundtrip(tmp_path):
    from tce_rvos_tpu.utils.native_ckpt import load_checkpoint, save_checkpoint

    cfg = TrainConfig()
    rng = np.random.default_rng(2)
    params = _params(rng)
    tx = make_flat_adamw(params, cfg, 2)
    state = tx.init(params)
    for g in _grad_seq(params, rng, 3):
        _, state = tx.update(g, state, params)

    save_checkpoint(str(tmp_path / "ck"), {"params": params},
                    opt_state=state, epoch=1, step=3)
    template = tx.init(params)
    _, restored, meta = load_checkpoint(
        str(tmp_path / "ck"), {"params": params}, template)
    assert meta["step"] == 3
    assert int(restored.count) == int(state.count)
    np.testing.assert_array_equal(np.asarray(restored.mu),
                                  np.asarray(state.mu))
    np.testing.assert_array_equal(np.asarray(restored.nu),
                                  np.asarray(state.nu))


def test_update_captures_no_large_constants():
    """Regression: the update must not embed param-sized arrays as jit
    constants. The pre-tier-sorted version captured three [P] f32 vectors
    (LR multiplier / decay mask / frozen mask) — 2.2 GB at flagship size,
    which broke remote compilation (HTTP 413) and bloated every compiled
    artifact. The tier-sorted layout needs only static slice boundaries."""
    cfg = TrainConfig(pretrain_enc=True)  # exercises the frozen tier too
    rng = np.random.default_rng(5)
    params = _params(rng)
    tx = make_flat_adamw(params, cfg, 2)
    state = tx.init(params)
    g = _grad_seq(params, rng, 1)[0]
    jaxpr = jax.make_jaxpr(lambda gr, st, p: tx.update(gr, st, p))(
        g, state, params
    )
    big = [
        c for c in jaxpr.consts
        if hasattr(c, "nbytes") and c.nbytes > 1024
    ]
    assert not big, [(type(c), getattr(c, "shape", None)) for c in big]


@pytest.mark.parametrize(
    "cfg_kw, grad_scale",
    [
        (dict(lr_drop=(1, 3)), 0.01),
        (dict(lr_drop=(1, 3)), 10.0),
        (dict(cyclic_lr=True, cyclic_lr_boundary=(1e-5, 1e-4)), 0.01),
        (dict(pretrain_enc=True, lr_drop=(1, 3)), 10.0),
        (dict(freeze_text_encoder=True, lr_drop=(1, 3)), 10.0),
    ],
    ids=["multistep", "clipped", "cyclic", "pretrain_enc", "freeze_text"],
)
def test_fused_apply_matches_update_apply(cfg_kw, grad_scale):
    """make_flat_adamw_fused (new params out, per-leaf fused apply) must
    track make_flat_adamw + optax.apply_updates exactly: same state, same
    trajectory; frozen leaves bit-identical passthrough."""
    from tce_rvos_tpu.parallel.flat_adamw import make_flat_adamw_fused

    cfg = TrainConfig(**cfg_kw)
    rng = np.random.default_rng(0)
    params = _params(rng)
    steps_per_epoch = 2
    grads = _grad_seq(params, rng, 8, scale=grad_scale)

    ref = _run(make_flat_adamw(params, cfg, steps_per_epoch), params, grads)

    tx = make_flat_adamw_fused(params, cfg, steps_per_epoch)
    state = tx.init(params)
    p = params
    out = []
    for g in grads:
        p, state = tx.apply_params(g, state, p)
        out.append(p)
    _assert_traj_close(ref, out)

    if cfg_kw.get("pretrain_enc") or cfg_kw.get("freeze_text_encoder"):
        # frozen tier: apply_params must pass leaves through BIT-identical
        frozen_keys = (
            ("backbone", "text_encoder", "class_head")
            if cfg_kw.get("pretrain_enc") else ("text_encoder",)
        )
        for k in frozen_keys:
            for a, b in zip(jax.tree.leaves(params[k]),
                            jax.tree.leaves(out[-1][k])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_apply_captures_no_large_constants():
    from tce_rvos_tpu.parallel.flat_adamw import make_flat_adamw_fused

    cfg = TrainConfig(pretrain_enc=True)
    rng = np.random.default_rng(5)
    params = _params(rng)
    tx = make_flat_adamw_fused(params, cfg, 2)
    state = tx.init(params)
    g = _grad_seq(params, rng, 1)[0]
    jaxpr = jax.make_jaxpr(lambda gr, st, p: tx.apply_params(gr, st, p))(
        g, state, params
    )
    big = [
        c for c in jaxpr.consts
        if hasattr(c, "nbytes") and c.nbytes > 1024
    ]
    assert not big, [(type(c), getattr(c, "shape", None)) for c in big]


def test_dropout_rng_impl_statistics():
    """The default training dropout stream (TrainConfig.dropout_rng_impl,
    'unsafe_rbg' = TPU hardware RngBitGenerator — measured 53 ms/step
    cheaper than threefry at flagship size, BASELINE.md round-3) must
    produce correct-rate, key-dependent masks, and split/fold_in must work
    on the typed keys (flax's make_rng folds per call site)."""
    import jax
    import jax.numpy as jnp

    from tce_rvos_tpu.config import TrainConfig

    impl = TrainConfig().dropout_rng_impl

    @jax.jit
    def stats(k):
        k1, k2 = jax.random.split(k)
        k3 = jax.random.fold_in(k1, 7)
        m1 = jax.random.bernoulli(k1, 0.9, (256, 2048))
        m2 = jax.random.bernoulli(k2, 0.9, (256, 2048))
        m3 = jax.random.bernoulli(k3, 0.9, (256, 2048))
        return m1.mean(), m2.mean(), m3.mean(), (m1 != m2).any(), (m1 != m3).any()

    r1, r2, r3, d12, d13 = stats(jax.random.key(0, impl=impl))
    for r in (r1, r2, r3):
        assert abs(float(r) - 0.9) < 0.01, f"keep-rate off: {float(r)}"
    assert bool(d12) and bool(d13), "split/fold_in keys must give distinct streams"
