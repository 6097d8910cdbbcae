#!/bin/bash
# Zero-shot CLIP eval on a CoOp-universe dataset.
DATASET=$1
CFG=${2:-vit_b16}
ROOT=${3:-$DATA}
python train.py \
  --root "$ROOT" --trainer ZeroshotCLIP \
  --dataset-coop --dataset "$DATASET" \
  --dataset-config-file configs/datasets/$DATASET.yaml \
  --config-file configs/trainers/MVLPT/$CFG.yaml \
  --output-dir ./output/zeroshot/$DATASET \
  --eval-only --no-train
