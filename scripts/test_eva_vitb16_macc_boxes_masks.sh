#!/usr/bin/env bash
# Zero-shot region-classification eval (mAcc for boxes / crops / mask-pool),
# EVA02-B/16 on COCO-Panoptic val2017. Usage: $0 NAME CHECKPOINT
# (reference: scripts/test_eva_vitb16_macc_boxes_masks.sh)
NAME=$1
CHECKPOINT=$2
python -m clipself_tpu.train.main \
  --model EVA02-CLIP-B-16 --pretrained "$CHECKPOINT" \
  --extract-type v2 --det-image-size 1024 --val-batch-size 1 \
  --val-data data/coco/annotations/panoptic_val2017.json \
  --val-image-root data/coco/val2017 \
  --val-segm-root data/coco/annotations/panoptic_val2017 \
  --embed-path metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTB16.npy \
  --name "$NAME" "${@:3}"
