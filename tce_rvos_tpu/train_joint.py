"""Joint ref-datasets pretraining entry (parity with reference
main_joint.py:28-215): forces dataset_file='joint' and binary
classification, then reuses the main training loop. The reference's broken
``util.send_mail`` import (main_joint.py:26 — module absent) is replaced by
an optional no-op notifier hook."""

from __future__ import annotations

import sys


def notify(msg: str):  # the reference's e-mail hook, made harmless
    print(f"[notify] {msg}")


def main(argv=None):
    from tce_rvos_tpu.train import main as train_main

    argv = list(sys.argv[1:] if argv is None else argv)
    # strip any user-provided dataset_file, then force joint + binary
    while "--dataset_file" in argv:
        i = argv.index("--dataset_file")
        del argv[i : i + 2]
    argv += ["--dataset_file", "joint"]
    if "--binary" not in argv:
        argv.append("--binary")
    train_main(argv)
    notify("joint pretraining finished")


if __name__ == "__main__":
    main()
