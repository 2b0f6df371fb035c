"""RoI head: multi-level RoI-align, open-vocabulary bbox head, mask head.

Behavioral spec (reference `F-ViT/models/fvit_head.py`):
  - SingleRoIExtractor: rois map to FPN levels by
    level = clamp(floor(log2(sqrt(area)/finest_scale + 1e-6)), 0, 3)
    and are pooled 7x7 with `aligned` RoIAlign (`fvit_head.py:274-277`).
  - FViTBBoxHead (`fvit_head.py:14-119`): 4 shared convs + 2 shared fcs,
    1 cls fc / 1 reg fc; classification = L2-normalized cls feature times a
    fixed text-embedding matrix (all classes + background) scaled by a
    learned temperature; class-agnostic box deltas.
  - Test-time fusion (`fvit_head.py:111-119`): softmax detector scores and
    softmax VLM scores (1x1 RoI-aligned dense CLIP map vs the same
    embeddings, fixed temperature) are geometrically mixed with exponent
    alpha on base classes and beta on novel classes.

TPU-native notes: rois are pooled on ALL levels and blended with a one-hot
level mask — four fixed-shape einsum pools instead of gather/scatter over
ragged per-level index lists.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.detector.boxes import box_area, decode_boxes, encode_boxes
from clipself_tpu.detector.config import FViTConfig
from clipself_tpu.detector.layers import ConvNorm
from clipself_tpu.detector.nms import NEG_INF, multiclass_nms
from clipself_tpu.detector.targets import assign_max_iou, random_sample
from clipself_tpu.core import knobs
from clipself_tpu.ops.roi_align import roi_align_nxn, roi_align_nxn_levels

Dtype = Any


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    out_size: int,
    finest_scale: float = 56.0,
) -> jnp.ndarray:
    """Pool [B, P, 4] image-space rois from the matching pyramid level.

    Returns [B, P, out, out, C]. Pools every roi on every level and selects
    with a one-hot mask (4x compute, zero gathers — the TPU trade).
    """
    num_levels = len(feats)
    scale = jnp.sqrt(jnp.maximum(box_area(rois), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)  # [B, P]
    if knobs.get("det_roi_concat_levels"):
        # one contraction over the row-concatenated pyramid instead of
        # pooling every roi on every level (round-5, ~2x less traffic on
        # the trace's largest line; equivalence-tested vs the blend path)
        return roi_align_nxn_levels(feats, rois, lvl, strides, (out_size, out_size))
    out = None
    for i, (f, s) in enumerate(zip(feats, strides)):
        pooled = roi_align_nxn(f, rois / float(s), (out_size, out_size))
        sel = (lvl == i).astype(pooled.dtype)[..., None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


class FViTBBoxHead(nn.Module):
    """ConvFC bbox head with text-embedding classification."""

    cfg: FViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, class_embed: jnp.ndarray):
        """x: [R, S, S, C] pooled rois; class_embed: [K+1, D] L2-normalized
        rows (all classes + background last).

        Returns (cls_logits [R, K+1], deltas [R, 4], cls_feat [R, D]).
        """
        c = self.cfg
        for i in range(c.num_shared_convs):
            x = ConvNorm(
                c.fpn_channels, kernel=3, norm=c.norm, act=True,
                dtype=self.dtype, name=f"shared_conv_{i}",
            )(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(c.num_shared_fcs):
            x = nn.relu(
                nn.Dense(
                    c.fc_out_channels, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"shared_fc_{i}",
                )(x)
            )
        x_cls = x
        for i in range(c.num_cls_fcs):
            x_cls = nn.relu(
                nn.Dense(
                    c.fc_out_channels, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"cls_fc_{i}",
                )(x_cls)
            )
        x_reg = x
        for i in range(c.num_reg_fcs):
            x_reg = nn.relu(
                nn.Dense(
                    c.fc_out_channels, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"reg_fc_{i}",
                )(x_reg)
            )
        # cls feature must live in the CLIP joint space to dot with text rows
        cls_feat = nn.Dense(
            c.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="cls_proj"
        )(x_cls)
        temperature = self.param(
            "temperature", nn.initializers.constant(c.learned_temperature), (), jnp.float32
        )
        normed = cls_feat / (
            jnp.linalg.norm(cls_feat.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12
        ).astype(cls_feat.dtype)
        logits = (
            normed.astype(jnp.float32) @ class_embed.T.astype(jnp.float32)
        ) * temperature
        deltas = nn.Dense(4, dtype=self.dtype, param_dtype=jnp.float32, name="fc_reg")(
            x_reg
        )
        return logits, deltas.astype(jnp.float32), normed


class _ClassConv1x1(nn.Module):
    """The mask head's final per-class 1x1 conv, with an exact label-gather
    path: logits[n,y,x,k] = x[n,y,x,:] @ W[:,k] + b[k], so when each roi n
    only ever consumes its own class channel k=labels[n] (the train loss AND
    the test path both select exactly one channel per roi), gathering
    W[:, labels] first computes the same values without materializing the
    [N, H, W, num_classes] tensor — at LVIS's 1203 classes that tensor is
    tens of GB and OOMs the compile. Param layout matches nn.Conv
    (kernel [1, 1, C, K], bias [K]) so checkpoints are unaffected."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        w = kernel[0, 0].astype(self.dtype)  # [C, K]
        if labels is None:
            return jnp.einsum("nyxc,ck->nyxk", x, w) + bias.astype(self.dtype)
        wsel = jnp.take(w.T, labels, axis=0)  # [N, C]
        bsel = jnp.take(bias, labels).astype(self.dtype)  # [N]
        return jnp.einsum("nyxc,nc->nyx", x, wsel) + bsel[:, None, None]


class MaskHead(nn.Module):
    """FCN mask head (mmdet FCNMaskHead semantics): 4 convs, 2x deconv,
    per-class 1x1 mask logits (LVIS config `configs/ov_lvis/...:96-110`).

    `labels` (optional, [N]): return only each roi's own class channel
    [N, H, W] via the exact weight-gather in `_ClassConv1x1` instead of the
    full [N, H, W, num_classes] map — required at LVIS class counts."""

    cfg: FViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = self.cfg
        for i in range(c.mask_convs):
            x = ConvNorm(
                c.mask_channels, kernel=3, norm=c.norm, act=True,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
        x = nn.ConvTranspose(
            c.mask_channels, (2, 2), strides=(2, 2),
            dtype=self.dtype, param_dtype=jnp.float32, name="upsample",
        )(x)
        x = nn.relu(x)
        return _ClassConv1x1(c.num_classes, dtype=self.dtype, name="logits")(
            x, labels
        )


class RoITargets(NamedTuple):
    rois: jnp.ndarray  # [B, R, 4] sampled proposals (image space)
    labels: jnp.ndarray  # [B, R] class (num_classes = background)
    chosen: jnp.ndarray  # [B, R] bool — sampled (contributes to cls loss)
    pos: jnp.ndarray  # [B, R] bool — positive (contributes to reg loss)
    reg_targets: jnp.ndarray  # [B, R, 4]
    gt_idx: jnp.ndarray  # [B, R] assigned gt index (for mask targets)


def sample_rois(
    proposals: jnp.ndarray,
    proposal_scores: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    cfg: FViTConfig,
) -> RoITargets:
    """Assign + sample proposals for the RCNN stage (train cfg
    `configs/ov_coco/...:110-126`; gt boxes are appended as proposals)."""
    b = proposals.shape[0]

    def per_image(props, pscores, gts, glabels, gvalid, key):
        boxes = jnp.concatenate([props, gts], axis=0)
        # SampleCfg.add_gt_as_proposals (mmdet RandomSampler knob): when off,
        # the gt rows stay in the tensor (static shapes) but are invalidated
        gt_rows = gvalid if cfg.rcnn_sample.add_gt_as_proposals else jnp.zeros_like(gvalid)
        valid_rows = jnp.concatenate([pscores > NEG_INF, gt_rows], axis=0)
        a = assign_max_iou(
            boxes, gts, gvalid,
            cfg.rcnn_assign.pos_iou_thr, cfg.rcnn_assign.neg_iou_thr,
            cfg.rcnn_assign.min_pos_iou, cfg.rcnn_assign.match_low_quality,
        )
        pos = a.pos & valid_rows
        neg = a.neg & valid_rows
        a = a._replace(pos=pos, neg=neg)
        ksample, kgather = jax.random.split(key)
        s = random_sample(ksample, a, cfg.rcnn_sample.num, cfg.rcnn_sample.pos_fraction)
        labels = jnp.where(
            s.pos_mask, glabels[a.gt_idx].astype(jnp.int32), cfg.num_classes
        )
        tgt = encode_boxes(boxes, gts[a.gt_idx], stds=cfg.bbox_stds)
        chosen = s.pos_mask | s.neg_mask
        # fixed-budget gather: the RoI head should only see the sampled
        # `num` rois, not all proposals+gts (halves its FLOPs; the sample
        # budget is static so shapes stay static)
        prio = chosen.astype(jnp.float32) * 2.0 + s.pos_mask.astype(jnp.float32)
        prio = prio + jax.random.uniform(kgather, prio.shape) * 0.5
        _, sel = jax.lax.top_k(prio, cfg.rcnn_sample.num)
        return RoITargets(
            rois=boxes[sel],
            labels=labels[sel],
            chosen=chosen[sel],
            pos=s.pos_mask[sel],
            reg_targets=tgt[sel],
            gt_idx=a.gt_idx[sel],
        )

    keys = jax.random.split(rng, b)
    return jax.vmap(per_image)(
        proposals, proposal_scores, gt_boxes, gt_labels, gt_valid, keys
    )


def rcnn_cls_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    chosen: jnp.ndarray,
    class_weight: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Weighted softmax CE (reference `CustomCrossEntropyLoss`,
    `F-ViT/models/custom_losses.py:62-111`): classes with ~zero weight get
    -inf logits (excluded from the partition function), the loss is scaled by
    the label's class weight, and averaged over sampled rois."""
    if class_weight is not None:
        masked = class_weight < 1e-5
        logits = jnp.where(masked[None, :], -jnp.inf, logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weight is None:
        ce = -ll
    else:
        w = class_weight[labels]
        # zero-weight labels (e.g. novel classes leaking into the batch) have
        # -inf log-prob after masking; select before multiplying to avoid inf*0
        ce = jnp.where(w > 1e-5, -ll * w, 0.0)
    ce = jnp.where(chosen, ce, 0.0)
    return ce.sum() / jnp.maximum(chosen.sum(), 1.0)


def rcnn_reg_loss(
    deltas: jnp.ndarray, targets: jnp.ndarray, pos: jnp.ndarray, chosen: jnp.ndarray
) -> jnp.ndarray:
    """L1 on positive rois, averaged over all sampled rois (mmdet
    BBoxHead.loss avg_factor semantics)."""
    l1 = jnp.abs(deltas - targets).sum(-1)
    return (l1 * pos).sum() / jnp.maximum(chosen.sum(), 1.0)


def fuse_vlm_scores(
    cls_logits: jnp.ndarray,
    vlm_feats: jnp.ndarray,
    class_embed: jnp.ndarray,
    base_mask: jnp.ndarray,
    cfg: FViTConfig,
) -> jnp.ndarray:
    """Geometric score fusion (reference `fvit_head.py:111-119`).

    cls_logits: [R, K+1]; vlm_feats: [R, D] (1x1 RoI-pooled dense CLIP map,
    already ~normalized); base_mask: [K+1] bool (True = base/seen class).
    Returns fused probabilities [R, K+1].
    """
    det = jax.nn.softmax(cls_logits, axis=-1)
    v = vlm_feats / (
        jnp.linalg.norm(vlm_feats.astype(jnp.float32), axis=-1, keepdims=True) + 1e-12
    )
    vlm = jax.nn.softmax(
        (v @ class_embed.T.astype(jnp.float32)) * cfg.vlm_temperature, axis=-1
    )
    exp = jnp.where(base_mask, cfg.alpha, cfg.beta)[None, :]
    return det ** (1.0 - exp) * vlm ** exp


def rcnn_detections(
    rois: jnp.ndarray,
    fused_scores: jnp.ndarray,
    deltas: jnp.ndarray,
    image_hw: tuple[int, int],
    cfg: FViTConfig,
    valid_hw: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode class-agnostic boxes and run multiclass NMS. Per image.

    fused_scores: [R, K+1] probabilities (background last, dropped here).
    valid_hw: optional (2,) = this image's pre-padding (h, w) — detections
    are clipped to it (mmdet clips to per-image img_shape, not the padded
    batch square).
    Returns (boxes [D, 4], scores [D], labels [D])."""
    boxes = decode_boxes(rois, deltas, stds=cfg.bbox_stds, max_shape=image_hw)
    if valid_hw is not None:
        hi = jnp.stack([valid_hw[1], valid_hw[0], valid_hw[1], valid_hw[0]])
        boxes = jnp.clip(boxes, 0.0, hi[None, :].astype(boxes.dtype))
    scores = fused_scores[:, :-1]
    return multiclass_nms(
        boxes, scores,
        cfg.rcnn_test.score_thr, cfg.rcnn_test.iou_threshold, cfg.rcnn_test.max_per_img,
    )
