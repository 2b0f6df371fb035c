#!/usr/bin/env bash
# CLIPSelf image-patch distillation, EVA02-L/14-336 on COCO.
# (reference: scripts/train_clipself_coco_image_patches_eva_vitl14.sh)
# Pallas one-pass LN measured +1.4% on the 24-layer tower (PERF.md round 4;
# it is -2.4% on B/16, so this stays per-recipe rather than a global default)
export CLIPSELF_PALLAS_LN=${CLIPSELF_PALLAS_LN:-1}
# bf16 teacher attention logits measured +6% on the 577-token L/14 teacher
# crops (PERF.md round 4); per-recipe, not a global default (advisor round 4)
export CLIPSELF_XLA_ATTN_HALF_LOGITS=${CLIPSELF_XLA_ATTN_HALF_LOGITS:-1}
# query-chunked teacher attention (5 panels of 128 over the 577-token
# crops) measured +2% on top of bf16 logits (PERF.md round 5); L/14-only
export CLIPSELF_XLA_ATTN_CHUNK_Q=${CLIPSELF_XLA_ATTN_CHUNK_Q:-128}
python -m clipself_tpu.train.main \
  --model EVA02-CLIP-L-14-336 --pretrained checkpoints/EVA02_CLIP_L_336_psz14_s6B.pt \
  --dataset-type grid_distill --extract-type v2 \
  --train-data data/coco/annotations/instances_train2017.json \
  --train-image-root data/coco/train2017 \
  --val-data data/coco/annotations/panoptic_val2017.json \
  --val-image-root data/coco/val2017 \
  --val-segm-root data/coco/annotations/panoptic_val2017 \
  --embed-path metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTL14x336.npy \
  --batch-size 16 --lr 1e-5 --wd 0.1 --epochs 6 --warmup 1000 --workers 4 \
  --lock-image --lock-image-unlocked-groups 24 \
  --det-image-size 896 --alpha 0.95 \
  --zeroshot-frequency 1 --save-frequency 6 --log-every-n-steps 50 \
  --native-loader \
  --name clipself_coco_6_save6_test1_eva_vitl14_24layers "$@"
