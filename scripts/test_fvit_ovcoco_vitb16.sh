#!/usr/bin/env bash
# F-ViT OV-COCO evaluation (base/novel AP50). Usage: $0 DETECTOR_CKPT [CLIP_CKPT]
# (reference: F-ViT/dist_test.sh)
DET_CKPT=$1
CLIP_CKPT=${2:-checkpoints/clipself_coco_eva_vitb16.pt}
python -m clipself_tpu.detector.evaluate \
  --preset ov_coco_vitb16 --dataset coco \
  --ann-file data/coco/annotations/instances_val2017.json \
  --image-root data/coco/val2017 \
  --class-embed metadata/coco_with_background_evaclip_vitb16.npy \
  --clip-checkpoint "$CLIP_CKPT" \
  --detector-checkpoint "$DET_CKPT" "${@:3}"
