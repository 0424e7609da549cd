#!/usr/bin/env bash
# Flagship Ref-YouTube-VOS training FROM SCRATCH — no COCO-pretrained
# weights (equivalent of reference scripts/dist_train_test_ytvos_scratch.sh).
set -x
OUTPUT_DIR=ytvos_dirs/${1}
PY_ARGS=${@:2}
python -m tce_rvos_tpu.train --with_box_refine --binary --masks \
  --epochs 6 --lr_drop 3 5 --f_token 8 --qtrans \
  --output_dir=${OUTPUT_DIR} --backbone resnet50 ${PY_ARGS}
