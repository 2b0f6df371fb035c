#!/usr/bin/env bash
# CLIPSelf image-patch distillation, EVA02-B/16 on COCO.
# TPU-native equivalent of the reference recipe
# (reference: scripts/train_clipself_coco_image_patches_eva_vitb16.sh).
# Global batch 16 == the reference's 8 GPUs x per-GPU batch 2; one JAX
# process drives the whole slice, so there is no torchrun fan-out.
# bf16 teacher attention logits/probs: +1% measured on the 197-token B/16
# teacher crops (PERF.md round 4); per-recipe export, default off globally
export CLIPSELF_XLA_ATTN_HALF_LOGITS=${CLIPSELF_XLA_ATTN_HALF_LOGITS:-1}
python -m clipself_tpu.train.main \
  --model EVA02-CLIP-B-16 --pretrained checkpoints/EVA02_CLIP_B_psz16_s8B.pt \
  --dataset-type grid_distill --extract-type v2 \
  --train-data data/coco/annotations/instances_train2017.json \
  --train-image-root data/coco/train2017 \
  --val-data data/coco/annotations/panoptic_val2017.json \
  --val-image-root data/coco/val2017 \
  --val-segm-root data/coco/annotations/panoptic_val2017 \
  --embed-path metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTB16.npy \
  --batch-size 16 --lr 1e-5 --wd 0.1 --epochs 6 --warmup 1000 --workers 4 \
  --lock-image --lock-image-unlocked-groups 12 \
  --det-image-size 1024 --alpha 0.7 \
  --zeroshot-frequency 1 --save-frequency 6 --log-every-n-steps 50 \
  --native-loader \
  --name clipself_coco_6_save6_test1_eva_vitb16_12layers "$@"
