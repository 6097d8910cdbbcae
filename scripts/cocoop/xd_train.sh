#!/bin/bash
# Cross-dataset transfer, training leg: train the prompt on ImageNet
# (all classes). Equivalent of /root/reference/scripts/cocoop/xd_train.sh.
#
# Usage: xd_train.sh SEED
# Env: DATA, OUT (default ./output), TRAINER (CoCoOp), CFG (vit_b16),
#      SHOTS (16), DATASET (imagenet), EXTRA_OPTS.
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=${TRAINER:-CoCoOp}

DATASET=${DATASET:-imagenet}
SEED=$1

CFG=${CFG:-vit_b16}
SHOTS=${SHOTS:-16}

DIR=${OUT}/${DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
if [ -d "$DIR" ]; then
  echo "Oops! The results exist at ${DIR} (so skip this job)"
else
  python train.py \
    --root "${DATA}" \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-coop \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    ${EXTRA_OPTS}
fi
