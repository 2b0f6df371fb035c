"""Box geometry primitives: IoU, delta coding, clipping.

Semantics match mmdet's `DeltaXYWHBBoxCoder` and `bbox_overlaps` (used by the
reference detector configs, e.g.
`F-ViT/configs/ov_coco/fvit_vitb16_upsample_fpn_bs64_3e_ovcoco_eva_original.py:32-37,54-58`),
re-derived as pure fixed-shape jax functions. All boxes are xyxy, float32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# mmdet clamps dw/dh so exp() cannot overflow (wh_ratio_clip=16/1000)
_MAX_RATIO = abs(math.log(16.0 / 1000.0))


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes [..., 4] -> [...]."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: [N, 4], b: [M, 4] -> [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def box_iof(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection over the area of `a` (mmdet mode='iof'). [N,4],[M,4]->[N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(box_area(a)[:, None], 1e-6)


def encode_boxes(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Deltas (dx, dy, dw, dh) taking `src` (anchors/rois) to `dst` (gt)."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    sx = (src[..., 0] + src[..., 2]) * 0.5
    sy = (src[..., 1] + src[..., 3]) * 0.5
    dw_ = dst[..., 2] - dst[..., 0]
    dh_ = dst[..., 3] - dst[..., 1]
    dx_ = (dst[..., 0] + dst[..., 2]) * 0.5
    dy_ = (dst[..., 1] + dst[..., 3]) * 0.5
    sw = jnp.maximum(sw, 1e-6)
    sh = jnp.maximum(sh, 1e-6)
    dx = (dx_ - sx) / sw
    dy = (dy_ - sy) / sh
    dw = jnp.log(jnp.maximum(dw_, 1e-6) / sw)
    dh = jnp.log(jnp.maximum(dh_, 1e-6) / sh)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def decode_boxes(
    src: jnp.ndarray,
    deltas: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape=None,
) -> jnp.ndarray:
    """Apply deltas to `src` boxes; optionally clip to (h, w)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -_MAX_RATIO, _MAX_RATIO)
    dh = jnp.clip(d[..., 3], -_MAX_RATIO, _MAX_RATIO)
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    sx = (src[..., 0] + src[..., 2]) * 0.5
    sy = (src[..., 1] + src[..., 3]) * 0.5
    cx = sx + dx * sw
    cy = sy + dy * sh
    w = sw * jnp.exp(dw)
    h = sh * jnp.exp(dh)
    out = jnp.stack([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)
    if max_shape is not None:
        out = clip_boxes(out, max_shape)
    return out


def clip_boxes(boxes: jnp.ndarray, max_shape) -> jnp.ndarray:
    """Clip xyxy boxes to an (h, w) image."""
    h, w = max_shape
    x = jnp.clip(boxes[..., 0::2], 0.0, float(w))
    y = jnp.clip(boxes[..., 1::2], 0.0, float(h))
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out
