#!/bin/bash
# Base-to-new generalization, training leg: train on the BASE half of
# the classes. Equivalent of
# /root/reference/scripts/cocoop/base2new_train.sh.
#
# Usage: base2new_train.sh DATASET SEED
# Env: DATA, OUT (default ./output), TRAINER (CoCoOp; set TRAINER=CoOp
#      for the CoOp protocol), CFG (vit_b16), SHOTS (16), EXTRA_OPTS.
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=${TRAINER:-CoCoOp}

DATASET=$1
SEED=$2

CFG=${CFG:-vit_b16}
SHOTS=${SHOTS:-16}

DIR=${OUT}/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
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
    DATASET.SUBSAMPLE_CLASSES base \
    ${EXTRA_OPTS}
fi
