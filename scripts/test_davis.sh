#!/usr/bin/env bash
# Ref-DAVIS17 inference + 4-annotator J&F (equivalent of reference
# scripts/dist_test_davis.sh).
set -x
OUTPUT_DIR=$1
CHECKPOINT=$2
DAVIS_PATH=${DAVIS_PATH:-/data/davis17}
PY_ARGS=${@:3}

python -m tce_rvos_tpu.infer --dataset_file davis --with_box_refine --binary \
  --freeze_text_encoder --f_token 8 --qtrans --backbone video_swin_t_p4w7 \
  --davis_path=${DAVIS_PATH} --output_dir=${OUTPUT_DIR} --resume=${CHECKPOINT} ${PY_ARGS}

python -m tce_rvos_tpu.eval_davis --davis_path=${DAVIS_PATH} \
  --results_path=${OUTPUT_DIR}/valid
