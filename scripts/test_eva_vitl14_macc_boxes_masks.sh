#!/usr/bin/env bash
# Zero-shot region-classification eval, EVA02-L/14-336 on COCO-Panoptic
# val2017. Usage: $0 NAME CHECKPOINT
# (reference: scripts/test_eva_vitl14_macc_boxes_masks.sh)
NAME=$1
CHECKPOINT=$2
python -m clipself_tpu.train.main \
  --model EVA02-CLIP-L-14-336 --pretrained "$CHECKPOINT" \
  --extract-type v2 --det-image-size 896 --val-batch-size 1 \
  --val-data data/coco/annotations/panoptic_val2017.json \
  --val-image-root data/coco/val2017 \
  --val-segm-root data/coco/annotations/panoptic_val2017 \
  --embed-path metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTL14x336.npy \
  --name "$NAME" "${@:3}"
