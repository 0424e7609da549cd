#!/usr/bin/env bash
# Flagship Ref-YouTube-VOS training + inference (equivalent of reference
# scripts/dist_train_test_ytvos_new.sh — no torch.distributed.launch: one
# process drives all local TPU chips; multi-host via JAX_COORDINATOR).
set -x
OUTPUT_DIR=ytvos_dirs/${1}
PRETRAINED_WEIGHTS=${PRETRAINED_WEIGHTS:-""}
PY_ARGS=${@:2}

python -m tce_rvos_tpu.train --with_box_refine --binary --masks \
  --epochs 6 --lr_drop 3 5 --f_token 8 --qtrans \
  ${PRETRAINED_WEIGHTS:+--pretrained_weights=$PRETRAINED_WEIGHTS} \
  --output_dir=${OUTPUT_DIR} --backbone resnet50 ${PY_ARGS}

python -m tce_rvos_tpu.infer --dataset_file ytvos --with_box_refine --binary \
  --f_token 8 --qtrans --backbone resnet50 \
  --output_dir=${OUTPUT_DIR} --resume=${OUTPUT_DIR}/checkpoint ${PY_ARGS}
