#!/bin/bash
# Zero-shot CLIP evaluation on a CoOp-universe dataset. Equivalent of
# /root/reference/scripts/coop/zeroshot.sh.
#
# Usage: zeroshot.sh DATASET CFG
#   CFG: vit_b16 or vit_b32 (configs/trainers/CoOp/<CFG>.yaml — the
#   reference's rn50/rn101 configs have no equivalent here: prompt
#   tuning is ViT-only, mvlpt.py:47, and the RN towers serve the
#   linear-probe / feature-extraction path)
# Env: DATA, OUT (default ./output), EXTRA_OPTS.
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=ZeroshotCLIP
DATASET=$1
CFG=$2

python train.py \
  --root "${DATA}" \
  --trainer ${TRAINER} \
  --dataset-coop \
  --dataset-config-file configs/datasets/${DATASET}.yaml \
  --config-file configs/trainers/CoOp/${CFG}.yaml \
  --output-dir "${OUT}/${TRAINER}/${CFG}/${DATASET}" \
  --eval-only \
  ${EXTRA_OPTS}
