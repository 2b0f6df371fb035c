#!/usr/bin/env bash
# Regenerate the COCO-Panoptic 133-class classifier matrices (ViLD prompt
# ensemble, ordered by category id) used by zero-shot eval.
# (reference: tools/generate_text_embeddings.py -> metadata/*.npy)
python -m clipself_tpu.tools.text_embeddings \
  --model EVA02-CLIP-B-16 --pretrained checkpoints/EVA02_CLIP_B_psz16_s8B.pt \
  --ann data/coco/annotations/panoptic_val2017.json \
  --out metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTB16.npy
python -m clipself_tpu.tools.text_embeddings \
  --model EVA02-CLIP-L-14-336 --pretrained checkpoints/EVA02_CLIP_L_336_psz14_s6B.pt \
  --ann data/coco/annotations/panoptic_val2017.json \
  --out metadata/coco_panoptic_clip_hand_craft_EVACLIP_ViTL14x336.npy
