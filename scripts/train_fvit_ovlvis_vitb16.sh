#!/usr/bin/env bash
# F-ViT open-vocabulary detector training on OV-LVIS (1203 classes, mask
# head, federated class weights) with a distilled EVA02-B/16 backbone.
# Usage: $0 DISTILLED_CKPT
# (reference: F-ViT/dist_train.sh + configs/ov_lvis/fvit_vitb16_..._clipself_patches.py)
CKPT=${1:-checkpoints/clipself_lvis_eva_vitb16.pt}
python -m clipself_tpu.detector.train \
  --preset ov_lvis_vitb16 --dataset lvis \
  --ann-file data/lvis/annotations/lvis_v1_train_norare.json \
  --image-root data/coco \
  --class-embed metadata/lvis_with_background_evaclip_vitb16.npy \
  --clip-checkpoint "$CKPT" \
  --batch-size 64 --epochs 48 --lr 1e-4 --wd 0.1 \
  --output out_fvit_ovlvis_vitb16 "${@:2}"
