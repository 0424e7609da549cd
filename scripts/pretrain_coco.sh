#!/usr/bin/env bash
# Joint RefCOCO/+/g pseudo-video pretraining (equivalent of reference
# scripts/dist_pretrain_coco.sh; --f_extra is defined here, unlike opts.py).
set -x
OUTPUT_DIR=pretrain_dirs/${1}
PY_ARGS=${@:2}
python -m tce_rvos_tpu.train_joint --masks --with_box_refine \
  --pretrain_coco --f_extra 0 --output_dir=${OUTPUT_DIR} ${PY_ARGS}
