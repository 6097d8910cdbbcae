#!/bin/bash
# 11-task CoOp-universe multitask source training (MCoOp / MVPT / MUPT).
# Usage: main_mt_coopdata_cut.sh {UPT|VPT|CoOp} <cfg> <nctx> <shots> <root> <outdir>
TRAINER_MODE=$1
CFG=${2:-vit_b16}
NCTX=${3:-16}
SHOTS=${4:-16}
ROOT=${5:-$DATA}
OUT=${6:-./output/mt_coop}

DATASET="ImageNet,Caltech101,Food101,StanfordCars,OxfordPets,OxfordFlowers,FGVCAircraft,SUN397,DescribableTextures,EuroSAT,UCF101"

case $TRAINER_MODE in
  UPT)  EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  VPT)  EXTRA=(TRAINER.MVLPT.VPT.N_CTX $NCTX) ;;
  CoOp) EXTRA=(TRAINER.MVLPT.COOP.N_CTX $NCTX) ;;
  *) echo "mode must be UPT|VPT|CoOp"; exit 1 ;;
esac

for SEED in 1 2 3; do
  python train.py \
    --root "$ROOT" \
    --seed $SEED \
    --trainer MVLPT \
    --dataset-coop --multi-task \
    --dataset "$DATASET" \
    --shots $SHOTS \
    --cut-contextlen --act-ckpt 4 \
    --config-file configs/trainers/MVLPT/$CFG.yaml \
    --output-dir $OUT/${TRAINER_MODE}_nctx${NCTX}_shots${SHOTS}/seed$SEED \
    TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION middle \
    TEST.FINAL_MODEL best_val \
    "${EXTRA[@]}"
done
