#!/usr/bin/env bash
# Build the detector class-embedding matrices (prompt ensemble + background
# row) from the vendored class-name lists.
# (reference: F-ViT/tools/dump_{coco,lvis,transfer}_openclip_feature.py)
python -m clipself_tpu.tools.text_embeddings \
  --model EVA02-CLIP-B-16 --pretrained checkpoints/EVA02_CLIP_B_psz16_s8B.pt \
  --classes-json clipself_tpu/detector/metadata/mscoco_65_classes.json \
  --add-background --out metadata/coco_with_background_evaclip_vitb16.npy
python -m clipself_tpu.tools.text_embeddings \
  --model EVA02-CLIP-L-14-336 --pretrained checkpoints/EVA02_CLIP_L_336_psz14_s6B.pt \
  --classes-json clipself_tpu/detector/metadata/mscoco_65_classes.json \
  --add-background --out metadata/coco_with_background_evaclip_vitl14x336.npy
python -m clipself_tpu.tools.text_embeddings \
  --model EVA02-CLIP-B-16 --pretrained checkpoints/EVA02_CLIP_B_psz16_s8B.pt \
  --classes-json clipself_tpu/detector/metadata/lvis_v1_all_classes.json \
  --add-background --out metadata/lvis_with_background_evaclip_vitb16.npy
