#!/bin/bash
# Base-to-new generalization, test leg: evaluate a base-trained prompt
# on the NEW half of the classes. Equivalent of
# /root/reference/scripts/cocoop/base2new_test.sh.
#
# Usage: base2new_test.sh DATASET SEED
# Env: DATA, OUT (default ./output), TRAINER (CoCoOp), CFG (vit_b16),
#      SHOTS (16), LOADEP (empty = best/newest), SUB (new), EXTRA_OPTS.
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
SUB=${SUB:-new}

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
MODEL_DIR=${OUT}/base2new/train_base/${COMMON_DIR}
DIR=${OUT}/base2new/test_${SUB}/${COMMON_DIR}
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
    --model-dir "${MODEL_DIR}" \
    ${LOADEP:+--load-epoch ${LOADEP}} \
    --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    ${EXTRA_OPTS}
fi
