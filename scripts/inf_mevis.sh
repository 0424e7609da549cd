#!/usr/bin/env bash
set -x
OUTPUT_DIR=$1
CHECKPOINT=$2
PY_ARGS=${@:3}
python -m tce_rvos_tpu.infer --dataset_file mevis --with_box_refine --binary \
  --f_token 8 --qtrans --output_dir=${OUTPUT_DIR} --resume=${CHECKPOINT} ${PY_ARGS}
