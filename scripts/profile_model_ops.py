"""Name the individual fusion/copy ops in the flagship forward's device
timeline (profile_model.py aggregates by prefix; this one keeps op
identities and looks each top op up in the compiled HLO so the 'XLA
fusions' / 'copy' buckets stop being anonymous)."""

import re
import sys
import tempfile

import jax

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

T, H, W = 5, 384, 640


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # batch (serving E)
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                      msda_impl="pallas", compute_dtype=dtype)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=b, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    @jax.jit
    def fwd(variables, **kw):
        out = model.apply(variables, **kw)
        return out["pred_masks"].sum()

    lowered = fwd.lower(variables, **inputs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/model_hlo.txt", "w") as fh:
        fh.write(hlo)

    # map "fusion.123" -> the fusion's root expression line (shape + op)
    hlo_defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = (.*)", line)
        if m:
            hlo_defs[m.group(1)] = m.group(2)[:240]

    from _timeline import load_tpu_events, self_time_aggregate

    # execute through the ALREADY-compiled executable — re-calling fwd()
    # would compile the program a second time (minutes through the
    # remote-compile tunnel)
    jax.block_until_ready(compiled(variables, **inputs))
    tmp = tempfile.mkdtemp()
    reps = 3
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            jax.block_until_ready(compiled(variables, **inputs))
    # XLA-Ops-lane self-time (scopes/cond spans not double-booked),
    # keep_ids so each op maps back to its HLO definition
    total, agg = self_time_aggregate(load_tpu_events(tmp), reps, keep_ids=True)
    print(f"=== top individual ops ({dtype}; device {total:.2f} ms/fwd) ===")
    for k, (ms, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:60]:
        defn = hlo_defs.get(k, "")
        print(f"{ms:8.3f} ms x{c:3d}  {k[:46]:46s} {defn[:150]}")


if __name__ == "__main__":
    main()
