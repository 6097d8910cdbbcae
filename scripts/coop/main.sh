#!/bin/bash
# CoOp few-shot training protocol (seeds 1/2/3), mapped onto this
# repo's flag surface. Equivalent of /root/reference/scripts/coop/main.sh.
#
# Usage: main.sh DATASET CFG CTP NCTX SHOTS CSC
#   DATASET  dataset yaml stem (configs/datasets/<DATASET>.yaml)
#   CFG      trainer config stem (configs/trainers/CoOp/<CFG>.yaml)
#   CTP      class token position (end or middle)
#   NCTX     number of context tokens
#   SHOTS    number of shots (1, 2, 4, 8, 16)
#   CSC      class-specific context (False or True)
# Env: DATA (dataset root), OUT (output root, default ./output),
#      SEEDS (default "1 2 3"), EXTRA_OPTS (extra config opts).
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=CoOp

DATASET=$1
CFG=$2
CTP=$3
NCTX=$4
SHOTS=$5
CSC=$6

for SEED in ${SEEDS:-1 2 3}; do
  DIR=${OUT}/${DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
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
      TRAINER.COOP.N_CTX ${NCTX} \
      TRAINER.COOP.CSC ${CSC} \
      TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
      DATASET.NUM_SHOTS ${SHOTS} \
      ${EXTRA_OPTS}
  fi
done
