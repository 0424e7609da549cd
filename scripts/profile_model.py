"""Device-profile the full flagship model forward (bf16, Pallas MSDA),
aggregating the device timeline by op-name prefix."""

import collections
import glob
import gzip
import json
import re
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

T, H, W = 5, 384, 640


def main():
    from tce_rvos_tpu.config import ModelConfig
    from tce_rvos_tpu.models.build import build_model, example_inputs
    from tce_rvos_tpu.utils.precision import apply_compute_dtype

    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cfg = ModelConfig(with_box_refine=True, binary=True, f_token=8, qtrans=True,
                      msda_impl="pallas", compute_dtype=dtype)
    model = build_model(cfg)
    inputs = example_inputs(cfg, b=1, t=T, hw=(H, W), text_len=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **inputs)
    variables, inputs = apply_compute_dtype(cfg, variables, inputs)

    @jax.jit
    def fwd(variables, **kw):
        out = model.apply(variables, **kw)
        return out["pred_masks"].sum()

    jax.block_until_ready(fwd(variables, **inputs))
    tmp = tempfile.mkdtemp()
    reps = 3
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            jax.block_until_ready(fwd(variables, **inputs))
    p = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(p) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            name = e["name"]
            if name.startswith("jit_"):
                continue
            # branch bodies are nested inside their cond.* span — counting
            # both would double-book the banded MSDA kernels
            if not name.startswith("branch_"):
                total += e["dur"]
            key = re.sub(r"[.\d]+$", "", name)
            durs[key] += e["dur"]
            cnt[key] += 1
    print(f"=== device total: {total/reps/1e3:.2f} ms/forward ({dtype}) ===")
    for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/reps/1e3:9.3f} ms  x{cnt[k]//reps:4d}  {k[:70]}")


if __name__ == "__main__":
    main()
