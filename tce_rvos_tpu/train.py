"""Training entry point (parity with reference main.py:30-307).

Flow: parse opts-compatible flags -> build configs/model/criterion ->
jit-init -> optional pretrained-weight load (class heads dropped when
num_classes changes, tools/load_pretrained_weights.py:3-11) -> resume ->
per-epoch loop with keep_fps meta refresh (main.py:225-249), data-parallel
jitted train step, per-epoch checkpoint + json log line (main.py:292-294),
optional A2D eval each epoch (main.py:283-285).

Distributed: jax.distributed.initialize() when JAX_COORDINATOR is set; the
batch is sharded over the 1-D 'data' mesh, grads psum'd by XLA over ICI —
there is no DDP wrapper or NCCL setup (util/misc.py:447-488 equivalent)."""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp


def run_eval(args, model_cfg, data_cfg, model, variables):
    """Eval-only dispatch (reference main.py:150-176): A2D/JHMDB get the
    mask mAP + P@K protocol, RefCOCO(+/g)/COCO-pretrain get P@{1,5,10} and
    the class-agnostic COCO box mAP. ytvos/davis/mevis are server-scored
    mask dumps — use tce_rvos_tpu.infer for those (as the reference uses
    inference_*.py)."""
    from tce_rvos_tpu.data.loader import PrefetchLoader, ShardedSampler
    from tce_rvos_tpu.data.registry import build_dataset, collate_batch
    from tce_rvos_tpu.engine import evaluate_a2d, evaluate_coco_pretrain

    if args.resume:
        from tce_rvos_tpu.models.text_encoder import require_real_tokenizer
        from tce_rvos_tpu.utils.native_ckpt import load_any_checkpoint

        require_real_tokenizer("--resume checkpoint")
        # accepts a native msgpack dir OR a reference torch .pth / URL
        variables, _, _ = load_any_checkpoint(args.resume, variables)
    if model_cfg.compute_dtype != "float32":
        from tce_rvos_tpu.utils.precision import cast_floating, resolve_dtype

        variables = cast_floating(variables, model_cfg.compute_dtype)
        in_dtype = resolve_dtype(model_cfg.compute_dtype)
    else:
        in_dtype = None

    dataset_val = build_dataset(args.dataset_file, "val", data_cfg, model_cfg)
    sampler = ShardedSampler(len(dataset_val), shuffle=False)
    loader = PrefetchLoader(
        dataset_val, sampler, args.batch_size, collate_batch,
        num_workers=args.num_workers, drop_last=False,
    )

    @jax.jit
    def fwd(v, **kw):
        if in_dtype is not None:
            kw["video"] = kw["video"].astype(in_dtype)
        return model.apply(v, **kw)

    if args.dataset_file in ("a2d", "jhmdb"):
        return evaluate_a2d(fwd, variables, iter(loader), args.threshold)
    if args.dataset_file in ("refcoco", "refcoco+", "refcocog"):
        return evaluate_coco_pretrain(
            fwd, variables, iter(loader),
            dataset_val.gt_boxes_by_image(),
            dataset_val.coco_gt_by_image(),
            masks=model_cfg.masks,
        )
    raise ValueError(
        f"--eval has no metric protocol for {args.dataset_file!r}; "
        "use `python -m tce_rvos_tpu.infer` (ytvos/davis/mevis dump masks)"
    )


def restore_train_state(state, resume_path, ckpt_manager, steps_per_epoch):
    """Resume semantics (reference main.py:180-211): restore model
    variables (+ optimizer state when the checkpoint carries one) and
    return ``(state, start_epoch)``. Checkpoints WITHOUT restorable
    optimizer state — reference-format torch .pth files/URLs, or native
    saves made with opt_state=None — get their LR-schedule counters
    fast-forwarded to ``start_epoch * steps_per_epoch``: the reference
    restores its lr_scheduler on resume, so MultiStep ``lr_drop``
    boundaries count from epoch 0, never from the resume point."""
    from tce_rvos_tpu.parallel.train_step import seed_schedule_step
    from tce_rvos_tpu.utils.native_ckpt import load_any_checkpoint

    variables_t = {"params": state.params, **state.frozen}
    if ckpt_manager is not None:
        variables_r, opt_state, meta = ckpt_manager.restore(
            variables_t, state.opt_state
        )
    else:
        variables_r, opt_state, meta = load_any_checkpoint(
            resume_path, variables_t, state.opt_state
        )
    state = state.replace(
        params=variables_r["params"],
        frozen={k: v for k, v in variables_r.items() if k != "params"},
        opt_state=opt_state if opt_state is not None else state.opt_state,
    )
    start_epoch = meta.get("epoch", -1) + 1
    if opt_state is None:
        state = seed_schedule_step(state, start_epoch * steps_per_epoch)
    else:
        state = state.replace(step=jnp.asarray(meta.get("step", 0), jnp.int32))
    return state, start_epoch


def main(argv=None):
    from tce_rvos_tpu.cli import (
        data_config_from_args,
        get_args_parser,
        model_config_from_args,
        train_config_from_args,
    )

    import argparse

    # reference pattern: opts parser is help-less and used via parents
    # (main.py:303) — the child parser provides -h/--help
    parser = argparse.ArgumentParser(
        "TCE-RVOS-TPU training", parents=[get_args_parser()]
    )
    args = parser.parse_args(argv)
    if os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize()

    model_cfg = model_config_from_args(args)
    train_cfg = train_config_from_args(args)
    data_cfg = data_config_from_args(args)

    from tce_rvos_tpu.data.loader import PrefetchLoader, ShardedSampler
    from tce_rvos_tpu.data.registry import build_dataset, collate_batch
    from tce_rvos_tpu.engine import evaluate_a2d, train_one_epoch
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from tce_rvos_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )
    from tce_rvos_tpu.utils.native_ckpt import save_checkpoint

    print("git:", os.popen("git rev-parse --short HEAD 2>/dev/null").read().strip())
    print(args)

    rng = jax.random.key(
        train_cfg.seed + jax.process_index(), impl=train_cfg.dropout_rng_impl
    )

    # ---- model ----
    model = build_model(model_cfg)
    inputs = example_inputs(model_cfg, b=train_cfg.batch_size, t=model_cfg.num_frames)
    variables = jax.jit(model.init)(jax.random.PRNGKey(train_cfg.seed), **inputs)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"number of params: {n_params}")

    if args.pretrained_weights:
        from tce_rvos_tpu.models.text_encoder import require_real_tokenizer
        from tce_rvos_tpu.utils.checkpoint import (
            convert_state_dict,
            drop_class_heads,
            load_torch_file,
        )

        require_real_tokenizer("--pretrained_weights")
        sd = load_torch_file(args.pretrained_weights)
        sd = drop_class_heads(sd, model_cfg.dec_layers)
        variables, missing, unexpected = convert_state_dict(sd, variables)

    # ---- eval-only mode (reference main.py:150-176) ----
    if args.eval:
        stats = run_eval(args, model_cfg, data_cfg, model, variables)
        print(json.dumps(stats, default=float))
        if args.output_dir and jax.process_index() == 0:
            os.makedirs(args.output_dir, exist_ok=True)
            with open(os.path.join(args.output_dir, "log.txt"), "a") as fh:
                fh.write(json.dumps(stats, default=float) + "\n")
        return stats

    # ---- data ----
    import functools

    # bucket the padded (H, W) so the train step compiles once per bucket
    # instead of once per distinct multi-scale resize outcome (the train
    # pipeline samples short sides 288-512; unbucketed that is a fresh XLA
    # compile of the full step for nearly every batch)
    collate = functools.partial(
        collate_batch, hw_buckets=tuple(range(128, data_cfg.max_size + 64, 64))
    )
    from tce_rvos_tpu.data.loader import NodeShardedSampler

    sampler_cls = NodeShardedSampler if data_cfg.cache_mode else ShardedSampler
    dataset_train = build_dataset(args.dataset_file, "train", data_cfg, model_cfg)
    sampler = sampler_cls(len(dataset_train), shuffle=True, seed=train_cfg.seed)
    loader = PrefetchLoader(
        dataset_train, sampler, train_cfg.batch_size, collate,
        num_workers=args.num_workers,
    )

    # ---- optimizer / step ----
    steps_per_epoch = max(len(loader), 1)
    state, tx = create_train_state(variables, train_cfg, steps_per_epoch)
    crit_cfg = criterion_from_configs(model_cfg, train_cfg)
    # --compute_dtype bfloat16 opts into mixed-precision training (f32
    # master params, bf16 forward/backward — parallel/train_step.py)
    from tce_rvos_tpu.parallel.train_step import base_lr_schedule

    step_fn = jax.jit(make_train_step(
        model.apply, tx, crit_cfg, compute_dtype=model_cfg.compute_dtype,
        lr_fn=base_lr_schedule(train_cfg, steps_per_epoch),
    ))

    ckpt_manager = None
    if args.ckpt_backend == "orbax":
        from tce_rvos_tpu.utils.native_ckpt import OrbaxCheckpointManager

        ckpt_manager = OrbaxCheckpointManager(
            os.path.join(args.output_dir, "orbax"), max_to_keep=args.ckpt_keep
        )

    start_epoch = args.start_epoch
    if args.resume:
        state, start_epoch = restore_train_state(
            state, args.resume, ckpt_manager, steps_per_epoch
        )

    # per-epoch A2D eval during training (reference main.py:283-285)
    val_loader_fn = None
    if args.dataset_file == "a2d":
        dataset_val = build_dataset("a2d", "val", data_cfg, model_cfg)
        val_sampler = ShardedSampler(len(dataset_val), shuffle=False)

        def val_loader_fn():
            return iter(
                PrefetchLoader(
                    dataset_val, val_sampler, train_cfg.batch_size, collate_batch,
                    num_workers=args.num_workers, drop_last=False,
                )
            )

        @jax.jit
        def eval_fwd(v, **kw):
            return model.apply(v, **kw)

    mesh = make_mesh()
    output_dir = args.output_dir
    os.makedirs(output_dir, exist_ok=True)

    print("Start training")
    start_time = time.time()
    with mesh:
        state = replicate(state, mesh)
        for epoch in range(start_epoch, train_cfg.epochs):
            if data_cfg.keep_fps and hasattr(dataset_train, "refresh_metas"):
                dataset_train.refresh_metas()
                sampler = sampler_cls(
                    len(dataset_train), shuffle=True, seed=train_cfg.seed
                )
                loader = PrefetchLoader(
                    dataset_train, sampler, train_cfg.batch_size, collate,
                    num_workers=args.num_workers,
                )
            sampler.set_epoch(epoch)
            rng, epoch_rng = jax.random.split(rng)

            sharded = (
                shard_batch(batch, mesh) for batch in iter(loader)
            )
            state, train_stats = train_one_epoch(
                state, step_fn, sharded, epoch, epoch_rng
            )

            ckpt_vars = {"params": state.params, **state.frozen}
            if ckpt_manager is not None:
                ckpt_manager.save(
                    int(state.step), ckpt_vars, state.opt_state,
                    meta={"epoch": epoch, "step": int(state.step)},
                )
            else:
                save_checkpoint(
                    os.path.join(output_dir, "checkpoint"), ckpt_vars,
                    state.opt_state, epoch, int(state.step),
                )
                save_checkpoint(
                    os.path.join(output_dir, f"checkpoint{epoch:04}"), ckpt_vars,
                    state.opt_state, epoch, int(state.step),
                )

            log_stats = {
                **{f"train_{k}": v for k, v in train_stats.items()},
                "epoch": epoch,
                "n_parameters": int(n_params),
            }
            if val_loader_fn is not None:
                test_stats = evaluate_a2d(
                    eval_fwd, {"params": state.params, **state.frozen},
                    val_loader_fn(), args.threshold,
                )
                log_stats.update({k: v for k, v in test_stats.items()})
            if jax.process_index() == 0:
                with open(os.path.join(output_dir, "log.txt"), "a") as fh:
                    fh.write(json.dumps(log_stats) + "\n")

    if ckpt_manager is not None:
        ckpt_manager.wait()
        ckpt_manager.close()
    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")


if __name__ == "__main__":
    main()
