"""F-ViT-equivalent open-vocabulary detector, re-designed TPU-first.

The reference's downstream detector (`F-ViT/`) plugs plugins into
mmdet 2.28.1 (`F-ViT/models/`, `F-ViT/configs/`). Here the whole stack is
self-contained and jittable: fixed-shape padded boxes, masked assignment and
sampling, XLA-friendly NMS, and a frozen distilled CLIP ViT backbone.
"""
