#!/usr/bin/env bash
# F-ViT OV-LVIS evaluation (rare/common/frequent AP incl. masks).
# Usage: $0 DETECTOR_CKPT [CLIP_CKPT]
# (reference: F-ViT/dist_test.sh)
DET_CKPT=$1
CLIP_CKPT=${2:-checkpoints/clipself_lvis_eva_vitb16.pt}
python -m clipself_tpu.detector.evaluate \
  --preset ov_lvis_vitb16 --dataset lvis \
  --ann-file data/lvis/annotations/lvis_v1_val.json \
  --image-root data/coco \
  --class-embed metadata/lvis_with_background_evaclip_vitb16.npy \
  --clip-checkpoint "$CLIP_CKPT" \
  --detector-checkpoint "$DET_CKPT" "${@:3}"
