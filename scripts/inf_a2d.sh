#!/usr/bin/env bash
# A2D-Sentences eval of a trained checkpoint (equivalent of reference
# scripts/inf_a2d.sh): mask mAP 0.5:0.95, AP50/75, P@K, overall/mean IoU.
set -x
CKPT=${1:?usage: inf_a2d.sh <checkpoint> [extra args]}
PY_ARGS=${@:2}
python -m tce_rvos_tpu.train --dataset_file a2d --with_box_refine \
  --freeze_text_encoder --qtrans --f_token 8 --backbone resnet50 \
  --resume ${CKPT} --eval ${PY_ARGS}
