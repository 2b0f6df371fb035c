#!/usr/bin/env bash
# F-ViT open-vocabulary detector training on OV-COCO with a distilled
# EVA02-B/16 backbone. Usage: $0 DISTILLED_CKPT
# (reference: F-ViT/dist_train.sh + configs/ov_coco/fvit_vitb16_..._clipself_patches.py)
CKPT=${1:-checkpoints/clipself_coco_eva_vitb16.pt}
python -m clipself_tpu.detector.train \
  --preset ov_coco_vitb16 --dataset coco \
  --ann-file data/coco/annotations/instances_train2017.json \
  --image-root data/coco/train2017 \
  --class-embed metadata/coco_with_background_evaclip_vitb16.npy \
  --clip-checkpoint "$CKPT" \
  --batch-size 64 --epochs 3 --lr 1e-4 --wd 0.1 \
  --output out_fvit_ovcoco_vitb16 "${@:2}"
