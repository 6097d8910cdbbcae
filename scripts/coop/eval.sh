#!/bin/bash
# CoOp cross-dataset evaluation: test an ImageNet-trained context on a
# target dataset (seeds 1/2/3). Equivalent of
# /root/reference/scripts/coop/eval.sh.
#
# Usage: eval.sh DATASET CFG
# Env: DATA, OUT (default ./output), SHOTS (16), NCTX (16), CSC (False),
#      CTP (end), LOADEP (empty = best/newest), SEEDS, MODEL_ROOT (where the ImageNet
#      runs live, default ${OUT}), EXTRA_OPTS.
set -e
cd "$(dirname "$0")/../.."

DATA=${DATA:-/path/to/datasets}
OUT=${OUT:-output}
TRAINER=CoOp
SHOTS=${SHOTS:-16}
NCTX=${NCTX:-16}
CSC=${CSC:-False}
CTP=${CTP:-end}
# Empty LOADEP (default) omits --load-epoch: the trainer loads
# model-best.pth.tar or the highest-numbered epoch checkpoint
# (prompt_io.find_checkpoint). Set LOADEP=N to pin an epoch.
LOADEP=${LOADEP:-}

DATASET=$1
CFG=$2
MODEL_ROOT=${MODEL_ROOT:-${OUT}}

for SEED in ${SEEDS:-1 2 3}; do
  python train.py \
    --root "${DATA}" \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-coop \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${OUT}/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/${DATASET}/seed${SEED}" \
    --model-dir "${MODEL_ROOT}/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}" \
    ${LOADEP:+--load-epoch ${LOADEP}} \
    --eval-only \
    TRAINER.COOP.N_CTX ${NCTX} \
    TRAINER.COOP.CSC ${CSC} \
    TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
    ${EXTRA_OPTS}
done
