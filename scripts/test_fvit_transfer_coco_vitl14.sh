#!/usr/bin/env bash
# Transfer evaluation: an OV-LVIS-trained L/14 detector on full-vocabulary
# COCO (reference: F-ViT/configs/transfer/fvit_vitl14_..._coco.py — transfer
# configs only swap the dataset/vocabulary; no retraining).
# Usage: $0 DETECTOR_CKPT [CLIP_CKPT]
DET_CKPT=$1
CLIP_CKPT=${2:-checkpoints/clipself_lvis_eva_vitl14.pt}
python -m clipself_tpu.detector.evaluate \
  --preset transfer_coco_vitl14 \
  --ann-file data/coco/annotations/instances_val2017.json \
  --image-root data/coco/val2017 \
  --class-embed metadata/coco_all_with_background_evaclip_vitl14x336.npy \
  --clip-checkpoint "$CLIP_CKPT" \
  --detector-checkpoint "$DET_CKPT" "${@:3}"
