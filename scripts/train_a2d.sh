#!/usr/bin/env bash
# A2D-Sentences training with per-epoch eval (equivalent of reference
# scripts/dist_train_a2d_new.sh).
set -x
OUTPUT_DIR=a2d_dirs/${1}
PY_ARGS=${@:2}
python -m tce_rvos_tpu.train --dataset_file a2d --binary --masks \
  --with_box_refine --f_token 8 --qtrans \
  --epochs 6 --lr_drop 3 5 --output_dir=${OUTPUT_DIR} ${PY_ARGS}
