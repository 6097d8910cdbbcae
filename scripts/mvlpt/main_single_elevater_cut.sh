#!/bin/bash
# Single ELEVATER task transfer, warm-started from an averaged multitask prompt.
TRAINER_MODE=$1
DATASET=$2
CFG=${3:-vit_b16}
NCTX=${4:-16}
SHOTS=${5:-5}
MODEL_DIR=$6     # averaged source checkpoint dir ('' = from scratch)
ROOT=${7:-$DATA}
OUT=${8:-./output/single_elevater}

case $TRAINER_MODE in
  UPT)  EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  VPT)  EXTRA=(TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  CoOp) EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX) ;;
esac

for SEED in 1 2 3; do
  python train.py \
    --root "$ROOT" --seed $SEED --trainer MVLPT \
    --dataset "$DATASET" --shots $SHOTS \
    --cut-contextlen --act-ckpt 4 \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} \
    --config-file configs/trainers/MVLPT/$CFG.yaml \
    --output-dir $OUT/${TRAINER_MODE}_${DATASET}_shots${SHOTS}/seed$SEED \
    TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION middle \
    TEST.FINAL_MODEL best_val \
    "${EXTRA[@]}"
done
