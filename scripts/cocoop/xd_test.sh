#!/bin/bash
# Cross-dataset transfer, test leg: evaluate the ImageNet-trained
# prompt on a target dataset. Equivalent of
# /root/reference/scripts/cocoop/xd_test.sh.
#
# Usage: xd_test.sh DATASET SEED
# Env: DATA, OUT (default ./output), TRAINER (CoCoOp), CFG (vit_b16),
#      SHOTS (16), LOADEP (empty = best/newest), SRC_DATASET (imagenet), EXTRA_OPTS.
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=${TRAINER:-CoCoOp}

DATASET=$1
SEED=$2

CFG=${CFG:-vit_b16}
SHOTS=${SHOTS:-16}
# Empty LOADEP (default) omits --load-epoch: the trainer then loads
# model-best.pth.tar or, failing that, the highest-numbered epoch
# checkpoint the train leg wrote (prompt_io.find_checkpoint) -- works
# for any MAX_EPOCH/CHECKPOINT_FREQ. Set LOADEP=N to pin an epoch.
LOADEP=${LOADEP:-}
SRC_DATASET=${SRC_DATASET:-imagenet}

DIR=${OUT}/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
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
    --model-dir "${OUT}/${SRC_DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}" \
    ${LOADEP:+--load-epoch ${LOADEP}} \
    --eval-only \
    ${EXTRA_OPTS}
fi
