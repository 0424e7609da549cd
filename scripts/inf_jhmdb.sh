#!/usr/bin/env bash
# JHMDB-Sentences eval-only with an A2D checkpoint (equivalent of reference
# scripts/inf_jhmdb.sh).
set -x
CKPT=${1:?usage: inf_jhmdb.sh <checkpoint> [extra args]}
PY_ARGS=${@:2}
python -m tce_rvos_tpu.train --dataset_file jhmdb --with_box_refine \
  --freeze_text_encoder --qtrans --f_token 8 --backbone resnet50 \
  --batch_size 1 --resume ${CKPT} --eval ${PY_ARGS}
