#!/usr/bin/env bash
# Ref-YouTube-VOS inference: per-frame binary PNGs for competition-server
# submission (equivalent of reference scripts/inf_ytvos.sh). --num_devices
# fans videos over local chips; add --visualize for qualitative overlays.
set -x
CKPT=${1:?usage: inf_ytvos.sh <checkpoint> <output_dir> [extra args]}
OUTPUT_DIR=${2:?usage: inf_ytvos.sh <checkpoint> <output_dir> [extra args]}
PY_ARGS=${@:3}
python -m tce_rvos_tpu.infer --dataset_file ytvos --with_box_refine --binary \
  --f_token 8 --qtrans --backbone resnet50 \
  --resume ${CKPT} --output_dir ${OUTPUT_DIR} ${PY_ARGS}
