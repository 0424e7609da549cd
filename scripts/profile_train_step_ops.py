"""Per-op device-timeline profile of the flagship train step (the
training counterpart of profile_model_ops.py): keeps op identities and
looks the top ops up in the compiled HLO, so the train step's
``concatenate``/``copy``/``fusion`` buckets stop being anonymous."""

import re
import sys
import tempfile

import jax

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax.numpy as jnp
import numpy as np

T, H, W = 5, 384, 640


def main():
    from tce_rvos_tpu.config import ModelConfig, TrainConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.models.criterion import criterion_from_configs
    from tce_rvos_tpu.parallel.train_step import create_train_state, make_train_step

    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                      msda_impl=impl, use_checkpoint=True, compute_dtype=dtype)
    tcfg = TrainConfig()
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    state, tx = create_train_state(variables, tcfg, steps_per_epoch=1000)
    step = make_train_step(model.apply, tx, criterion_from_configs(cfg, tcfg),
                           compute_dtype=cfg.compute_dtype)

    rng = np.random.RandomState(0)
    batch = dict(inputs)
    batch["targets"] = {
        "labels": jnp.zeros((1, T), jnp.int32),
        "boxes": jnp.asarray(rng.rand(1, T, 4), np.float32),
        "masks": jnp.asarray((rng.rand(1, T, H, W) > 0.5).astype(np.float32)),
        "valid": jnp.ones((1, T), jnp.int32),
    }
    r = jax.random.key(0, impl=tcfg.dropout_rng_impl)

    @jax.jit
    def one(state, batch, r):
        st, metrics = step(state, batch, r)
        return st, metrics["loss"]

    lowered = one.lower(state, batch, r)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/train_hlo.txt", "w") as fh:
        fh.write(hlo)
    hlo_defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = (.*)", line)
        if m:
            hlo_defs[m.group(1)] = m.group(2)[:240]

    from _timeline import load_tpu_events, self_time_aggregate

    # execute through the ALREADY-compiled executable — re-calling one()
    # would compile the program a second time (minutes through the
    # remote-compile tunnel)
    st, loss = compiled(state, batch, r)
    jax.block_until_ready(loss)
    tmp = tempfile.mkdtemp()
    reps = 3
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            st, loss = compiled(state, batch, r)
            jax.block_until_ready(loss)
    total, agg = self_time_aggregate(load_tpu_events(tmp), reps, keep_ids=True)
    print(f"=== top individual ops ({impl}/{dtype}; device {total:.2f} ms/step) ===")
    for k, (ms, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:70]:
        defn = hlo_defs.get(k, "")
        print(f"{ms:8.3f} ms x{c:3d}  {k[:46]:46s} {defn[:150]}")


if __name__ == "__main__":
    main()
