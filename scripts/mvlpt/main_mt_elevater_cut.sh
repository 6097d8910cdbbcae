#!/bin/bash
# 20-task ELEVATER multitask source training.
TRAINER_MODE=$1
CFG=${2:-vit_b16}
NCTX=${3:-16}
SHOTS=${4:-20}
ROOT=${5:-$DATA}
OUT=${6:-./output/mt_elevater}

DATASET="hateful-memes,cifar-10,mnist,oxford-flower-102,oxford-iiit-pets,resisc45_clip,country211,food-101,stanford-cars,caltech-101,dtd,voc-2007-classification,cifar-100,fgvc-aircraft-2013b-variants102,patch-camelyon,rendered-sst2,gtsrb,eurosat_clip,fer-2013,kitti-distance"

case $TRAINER_MODE in
  UPT)  EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  VPT)  EXTRA=(TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  CoOp) EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX) ;;
esac

for SEED in 1 2 3; do
  python train.py \
    --root "$ROOT" --seed $SEED --trainer MVLPT \
    --multi-task --multi-task-label_pertask \
    --dataset "$DATASET" --shots $SHOTS \
    --cut-contextlen --act-ckpt 4 \
    --config-file configs/trainers/MVLPT/$CFG.yaml \
    --output-dir $OUT/${TRAINER_MODE}_nctx${NCTX}_shots${SHOTS}/seed$SEED \
    TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION middle \
    TEST.FINAL_MODEL best_val \
    "${EXTRA[@]}"
done
