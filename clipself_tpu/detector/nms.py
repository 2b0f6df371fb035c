"""Fixed-shape greedy NMS for TPU.

The reference delegates NMS to mmcv's CUDA kernel (`multiclass_nms`,
`F-ViT/models/fvit_head.py:163-165`; train/test cfg
`configs/ov_coco/...eva_original.py:107-137`). TPU-native formulation:
candidates are reduced to a static top-k by score, the dense IoU matrix is
built once (one [K, K] matmul-shaped block, K <= 2000 fits easily in HBM),
and greedy suppression is a `lax.fori_loop` over the score ordering with a
boolean keep-vector — no dynamic shapes anywhere, jit/vmap-safe.

Outputs are fixed-size with validity implied by score > -inf sentinels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clipself_tpu.detector.boxes import box_iou

NEG_INF = -1e10


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over up to N boxes.

    Args:
      boxes: [N, 4] xyxy; scores: [N]; valid: optional [N] bool.
      max_out: static number of survivors to return.

    Returns:
      (boxes [max_out, 4], scores [max_out], indices [max_out]) sorted by
      score desc; suppressed/empty slots have score NEG_INF and index -1.
    """
    n = boxes.shape[0]
    s = scores
    if valid is not None:
        s = jnp.where(valid, s, NEG_INF)
    order = jnp.argsort(-s)  # descending
    b = boxes[order]
    s = s[order]

    from clipself_tpu.ops.nms_pallas import nms_keep_mask, pallas_nms_available

    if pallas_nms_available() and n >= 256:
        # on-core sequential suppression (~10x faster than the lax loop)
        keep = nms_keep_mask(b, s > NEG_INF, iou_threshold)
    else:
        iou = box_iou(b, b)  # [N, N]
        ranks = jnp.arange(n)

        def body(i, keep):
            # earlier-ranked kept boxes overlapping i beyond threshold suppress it
            sup = jnp.any(keep & (ranks < i) & (iou[:, i] > iou_threshold))
            live = (s[i] > NEG_INF) & ~sup
            return keep.at[i].set(live)

        keep = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    s_kept = jnp.where(keep, s, NEG_INF)
    top_s, top_i = jax.lax.top_k(s_kept, max_out)
    out_boxes = b[top_i]
    out_idx = jnp.where(top_s > NEG_INF, order[top_i], -1)
    out_boxes = jnp.where((top_s > NEG_INF)[:, None], out_boxes, 0.0)
    return out_boxes, top_s, out_idx


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    pre_nms: int = 2000,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-wise NMS via the coordinate-offset trick (mmcv `batched_nms`
    semantics used by `multiclass_nms`).

    Args:
      boxes: [N, 4] (class-shared) or [N, C, 4] (per-class regression).
      scores: [N, C] per-class scores WITHOUT the background column.

    Returns (boxes [max_per_img, 4], scores [max_per_img],
    labels [max_per_img]) with empty slots scored NEG_INF, label -1.
    """
    n, c = scores.shape
    if boxes.ndim == 2:
        boxes_pc = jnp.broadcast_to(boxes[:, None, :], (n, c, 4))
    else:
        boxes_pc = boxes
    flat_scores = scores.reshape(-1)
    flat_boxes = boxes_pc.reshape(-1, 4)
    flat_labels = jnp.tile(jnp.arange(c), (n,))
    ok = flat_scores > score_thr
    flat_scores = jnp.where(ok, flat_scores, NEG_INF)

    k = min(pre_nms, n * c)
    top_s, top_i = jax.lax.top_k(flat_scores, k)
    cand_boxes = flat_boxes[top_i]
    cand_labels = flat_labels[top_i]
    # offset boxes per class so cross-class pairs never overlap
    span = jnp.max(cand_boxes) + 1.0
    off_boxes = cand_boxes + (cand_labels.astype(jnp.float32) * span)[:, None]
    _, kept_s, kept_i = nms(off_boxes, top_s, iou_threshold, max_per_img)
    safe = jnp.maximum(kept_i, 0)
    out_boxes = jnp.where((kept_i >= 0)[:, None], cand_boxes[safe], 0.0)
    out_labels = jnp.where(kept_i >= 0, cand_labels[safe], -1)
    return out_boxes, kept_s, out_labels
