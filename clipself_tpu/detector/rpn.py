"""Region proposal network: head module, targets/loss, proposal decoding.

Behavioral spec from the reference config
(`F-ViT/configs/ov_coco/...eva_original.py:24-40,89-137`) and mmdet
`RPNHead`: a small conv tower shared across levels, per-anchor sigmoid
objectness + box deltas, BCE + L1 on 256 randomly-sampled anchors, and
top-k → decode → NMS proposal generation.

TPU-native notes: anchors are trace-time constants per feature shape; the
per-level score maps are flattened and concatenated once so assignment,
sampling, loss, and proposal NMS all run on single fixed-shape arrays.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from clipself_tpu.detector.anchors import multi_level_anchors
from clipself_tpu.detector.boxes import clip_boxes, decode_boxes, encode_boxes
from clipself_tpu.detector.config import FViTConfig
from clipself_tpu.detector.layers import ConvNorm
from clipself_tpu.detector.nms import NEG_INF, nms
from clipself_tpu.detector.targets import assign_max_iou, random_sample

Dtype = Any


class RPNHead(nn.Module):
    """Shared conv tower + objectness/delta 1x1 heads, applied per level."""

    num_anchors: int
    feat_channels: int = 256
    num_convs: int = 2
    norm: str = "none"  # mmdet RPNHead convs are norm-free by default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
        convs = [
            ConvNorm(
                self.feat_channels, kernel=3, norm=self.norm, act=True,
                dtype=self.dtype, name=f"conv_{i}",
            )
            for i in range(self.num_convs)
        ]
        cls_head = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="cls",
        )
        reg_head = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="reg",
        )
        scores, deltas = [], []
        for x in feats:
            for conv in convs:
                x = conv(x)
            scores.append(cls_head(x))
            deltas.append(reg_head(x))
        return scores, deltas


class RPNOut(NamedTuple):
    scores: jnp.ndarray  # [B, N] objectness logits over all levels' anchors
    deltas: jnp.ndarray  # [B, N, 4]
    anchors: jnp.ndarray  # [N, 4] (shared across batch)


def flatten_rpn_outputs(
    score_maps: Sequence[jnp.ndarray],
    delta_maps: Sequence[jnp.ndarray],
    cfg: FViTConfig,
) -> RPNOut:
    """Concatenate per-level map outputs into flat per-anchor arrays, with
    matching trace-time anchors."""
    feat_shapes = [tuple(s.shape[1:3]) for s in score_maps]
    anchors_np = multi_level_anchors(
        feat_shapes,
        cfg.anchors.strides[: len(feat_shapes)],
        cfg.anchors.scales,
        cfg.anchors.ratios,
        cfg.anchors.center_offset,
    )
    anchors = jnp.asarray(np.concatenate(anchors_np, axis=0))
    b = score_maps[0].shape[0]
    scores = jnp.concatenate([s.reshape(b, -1) for s in score_maps], axis=1)
    deltas = jnp.concatenate([d.reshape(b, -1, 4) for d in delta_maps], axis=1)
    return RPNOut(scores=scores, deltas=deltas, anchors=anchors)


def rpn_loss(
    rpn: RPNOut,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    cfg: FViTConfig,
) -> tuple[jnp.ndarray, dict]:
    """BCE objectness + L1 box loss on sampled anchors (mmdet RPNHead.loss).

    gt_boxes: [B, G, 4]; gt_valid: [B, G] bool.
    """
    b = rpn.scores.shape[0]

    def per_image(scores, deltas, gts, valid, key):
        a = assign_max_iou(
            rpn.anchors, gts, valid,
            cfg.rpn_assign.pos_iou_thr, cfg.rpn_assign.neg_iou_thr,
            cfg.rpn_assign.min_pos_iou, cfg.rpn_assign.match_low_quality,
        )
        s = random_sample(key, a, cfg.rpn_sample.num, cfg.rpn_sample.pos_fraction)
        chosen = s.pos_mask | s.neg_mask
        labels = s.pos_mask.astype(jnp.float32)
        # BCE with logits over sampled anchors, avg over the sample budget
        ce = optax.sigmoid_binary_cross_entropy(scores, labels)
        n_sampled = jnp.maximum(chosen.sum(), 1.0)
        loss_cls = (ce * chosen).sum() / n_sampled
        # L1 on positive anchors against encoded gt deltas
        tgt = encode_boxes(rpn.anchors, gts[a.gt_idx])
        l1 = jnp.abs(deltas - tgt).sum(-1)
        loss_box = (l1 * s.pos_mask).sum() / n_sampled
        return loss_cls, loss_box, s.num_pos

    keys = jax.random.split(rng, b)
    lc, lb, npos = jax.vmap(per_image)(rpn.scores, rpn.deltas, gt_boxes, gt_valid, keys)
    metrics = {
        "rpn_loss_cls": lc.mean(),
        "rpn_loss_bbox": lb.mean(),
        "rpn_num_pos": npos.mean(),
    }
    return lc.mean() + lb.mean(), metrics


def rpn_proposals(
    rpn: RPNOut,
    image_hw: tuple[int, int],
    nms_pre: int,
    max_per_img: int,
    iou_threshold: float,
    min_bbox_size: float = 0.0,
    valid_hw: jnp.ndarray = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + NMS proposals per image.

    valid_hw: optional [B, 2] per-image pre-padding (h, w); proposals are
    clipped to it (mmdet clips to `img_shape`, not the padded batch square,
    so anchors decoding into the zero-padding band never reach the RoI head
    as free-standing proposals).

    Returns (boxes [B, P, 4], scores [B, P]); empty slots have score NEG_INF.
    """
    if valid_hw is None:
        valid_hw = jnp.broadcast_to(
            jnp.asarray(image_hw, jnp.float32), (rpn.scores.shape[0], 2)
        )

    def per_image(scores, deltas, vhw):
        k = min(nms_pre, scores.shape[0])
        top_s, top_i = jax.lax.top_k(scores, k)
        boxes = decode_boxes(rpn.anchors[top_i], deltas[top_i], max_shape=image_hw)
        lim = jnp.stack([vhw[1], vhw[0], vhw[1], vhw[0]])  # x, y, x, y
        boxes = jnp.minimum(boxes, lim[None, :])
        wh = boxes[:, 2:] - boxes[:, :2]
        ok = (wh[:, 0] > min_bbox_size) & (wh[:, 1] > min_bbox_size)
        out_boxes, out_scores, _ = nms(
            boxes, jax.nn.sigmoid(top_s), iou_threshold, max_per_img, valid=ok
        )
        return out_boxes, out_scores

    return jax.vmap(per_image)(rpn.scores, rpn.deltas, valid_hw)
