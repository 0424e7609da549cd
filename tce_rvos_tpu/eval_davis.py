"""Offline Ref-DAVIS17 scoring CLI (parity with reference eval_davis.py):
computes J&F for each annotator directory produced by the davis inference
protocol, writes global/per-sequence CSVs, prints the summary tables, and
averages over the 4 annotators like scripts/dist_test_davis.sh:25-33."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def evaluate_results_dir(davis_path: str, results_path: str, subset: str = "val",
                         task: str = "unsupervised"):
    import pandas as pd

    from tce_rvos_tpu.eval.davis_eval import evaluate_davis

    csv_g = os.path.join(results_path, f"global_results-{subset}.csv")
    csv_seq = os.path.join(results_path, f"per-sequence_results-{subset}.csv")
    if os.path.exists(csv_g) and os.path.exists(csv_seq):
        print("Using precomputed results...")
        return pd.read_csv(csv_g), pd.read_csv(csv_seq)

    res = evaluate_davis(davis_path, results_path, subset, task)
    s = res["summary"]
    cols = ["J&F-Mean", "J-Mean", "J-Recall", "J-Decay", "F-Mean", "F-Recall", "F-Decay"]
    table_g = pd.DataFrame([[s[c] for c in cols]], columns=cols)
    table_g.to_csv(csv_g, index=False, float_format="%.5f")

    seq_names = list(res["J"]["M_per_object"].keys())
    table_seq = pd.DataFrame(
        {
            "Sequence": seq_names,
            "J-Mean": [res["J"]["M_per_object"][k] for k in seq_names],
            "F-Mean": [res["F"]["M_per_object"][k] for k in seq_names],
        }
    )
    table_seq.to_csv(csv_seq, index=False, float_format="%.5f")
    return table_g, table_seq


def main(argv=None):
    t0 = time.time()
    p = argparse.ArgumentParser()
    p.add_argument("--davis_path", required=True)
    p.add_argument("--set", dest="subset", default="val")
    p.add_argument("--task", default="unsupervised",
                   choices=["semi-supervised", "unsupervised"])
    p.add_argument("--results_path", required=True,
                   help="either one annotator dir or a parent containing anno_0..anno_3")
    args, _ = p.parse_known_args(argv)

    anno_dirs = [
        os.path.join(args.results_path, d)
        for d in sorted(os.listdir(args.results_path))
        if d.startswith("anno_")
    ] or [args.results_path]

    jf_means = []
    for d in anno_dirs:
        table_g, table_seq = evaluate_results_dir(
            args.davis_path, d, args.subset, args.task
        )
        print(f"--------- Global results for {d} ---------")
        print(table_g.to_string(index=False))
        jf_means.append(float(table_g["J&F-Mean"].iloc[0]))
    if len(jf_means) > 1:
        print(f"\nMean J&F over {len(jf_means)} annotators: {np.mean(jf_means):.5f}")
    sys.stdout.write(f"\nTotal time: {time.time() - t0}\n")


if __name__ == "__main__":
    main()
