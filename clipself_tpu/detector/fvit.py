"""F-ViT detector assembly: frozen CLIP backbone + trainable detection head.

Reference architecture (`F-ViT/models/fvit.py`, `F-ViT/models/evaclip_vit.py`):
a frozen distilled EVA-CLIP ViT is tapped at 4 depths, expanded into a
feature pyramid, fed through FPN + RPN + RoI head; at test time the dense
VLM feature map (final block value-path) scores each detection against the
class embeddings and is geometrically fused with the detector scores.

TPU-native design: the backbone runs inside the SAME jitted step under
`stop_gradient` (its params are a separate frozen pytree — no optimizer
state, no grads); detection params are a small trainable pytree. Everything
downstream of the image batch is fixed-shape.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from clipself_tpu.detector.config import FViTConfig
from clipself_tpu.detector.nms import NEG_INF
from clipself_tpu.detector.neck import FPN, SimpleFeaturePyramid
from clipself_tpu.detector.roi_head import (
    FViTBBoxHead,
    MaskHead,
    RoITargets,
    fuse_vlm_scores,
    multilevel_roi_align,
    rcnn_cls_loss,
    rcnn_detections,
    rcnn_reg_loss,
    sample_rois,
)
from clipself_tpu.detector.rpn import (
    RPNHead,
    flatten_rpn_outputs,
    rpn_loss,
    rpn_proposals,
)
from clipself_tpu.ops.roi_align import roi_align_1x1, roi_align_nxn

Dtype = Any


class FViTDetector(nn.Module):
    """Trainable detector head stack (pyramid + FPN + RPN + RoI heads)."""

    cfg: FViTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        num_anchors = len(c.anchors.scales) * len(c.anchors.ratios)
        self.pyramid = SimpleFeaturePyramid(
            width=c.backbone_width, norm=c.norm, dtype=self.dtype, name="pyramid"
        )
        self.fpn = FPN(
            out_channels=c.fpn_channels, num_outs=c.num_fpn_outs, norm=c.norm,
            dtype=self.dtype, name="fpn",
        )
        self.rpn_head = RPNHead(
            num_anchors=num_anchors, feat_channels=c.fpn_channels,
            num_convs=c.rpn_convs, dtype=self.dtype, name="rpn",
        )
        self.bbox_head = FViTBBoxHead(c, dtype=self.dtype, name="bbox_head")
        if c.with_mask:
            self.mask_head = MaskHead(c, dtype=self.dtype, name="mask_head")

    def features(self, taps):
        """Backbone taps -> (fpn feats list, rpn score/delta maps)."""
        pyr = self.pyramid(taps)
        feats = self.fpn(pyr)
        scores, deltas = self.rpn_head(feats)
        return feats, scores, deltas

    def __call__(self, taps, rois, class_embed):
        """Convenience full pass for init: features + heads on given rois."""
        feats, scores, deltas = self.features(taps)
        pooled = multilevel_roi_align(
            feats[:4], rois, self.cfg.anchors.strides[:4], self.cfg.roi_feat_size,
            self.cfg.finest_scale,
        )
        r = pooled.reshape((-1,) + pooled.shape[2:])
        logits, box_deltas, cls_feat = self.bbox_head(r, class_embed)
        if self.cfg.with_mask:
            mp = multilevel_roi_align(
                feats[:4], rois, self.cfg.anchors.strides[:4], self.cfg.mask_roi_size,
                self.cfg.finest_scale,
            )
            self.mask_head(mp.reshape((-1,) + mp.shape[2:]))
        return logits, box_deltas

    # ----- training ----------------------------------------------------

    def loss(
        self,
        taps,
        gt_boxes,
        gt_labels,
        gt_valid,
        rng,
        class_embed,
        class_weight=None,
        gt_masks=None,
        valid_hw=None,
    ):
        """Full detection loss (RPN + RCNN [+ mask]).

        taps: list of 4 [B, h, w, width] frozen backbone taps.
        gt_boxes [B, G, 4] image-space xyxy; gt_labels [B, G]; gt_valid [B, G].
        gt_masks: [B, G, Hm, Wm] binary (stride-4 resolution) when with_mask.
        """
        c = self.cfg
        image_hw = (c.image_size, c.image_size)
        feats, smap, dmap = self.features(taps)
        rpn = flatten_rpn_outputs(smap, dmap, c)
        k_rpn, k_prop, k_roi = jax.random.split(rng, 3)
        l_rpn, metrics = rpn_loss(rpn, gt_boxes, gt_valid, k_rpn, c)

        props, pscores = rpn_proposals(
            jax.tree.map(jax.lax.stop_gradient, rpn), image_hw,
            c.train_proposals.nms_pre, c.train_proposals.max_per_img,
            c.train_proposals.iou_threshold, c.train_proposals.min_bbox_size,
            valid_hw=valid_hw,
        )
        tgt = sample_rois(props, pscores, gt_boxes, gt_labels, gt_valid, k_roi, c)

        pooled = multilevel_roi_align(
            feats[:4], tgt.rois, c.anchors.strides[:4], c.roi_feat_size, c.finest_scale
        )
        b, r = pooled.shape[:2]
        logits, deltas, _ = self.bbox_head(
            pooled.reshape((b * r,) + pooled.shape[2:]), class_embed
        )
        l_cls = rcnn_cls_loss(
            logits, tgt.labels.reshape(-1), tgt.chosen.reshape(-1), class_weight
        )
        l_reg = rcnn_reg_loss(
            deltas,
            tgt.reg_targets.reshape(-1, 4),
            tgt.pos.reshape(-1),
            tgt.chosen.reshape(-1),
        )
        total = l_rpn + l_cls + l_reg
        metrics.update(
            {"loss_cls": l_cls, "loss_bbox": l_reg, "num_pos_roi": tgt.pos.sum() / b}
        )

        if c.with_mask and gt_masks is not None:
            l_mask = self._mask_loss(feats, tgt, gt_masks)
            total = total + l_mask
            metrics["loss_mask"] = l_mask
        metrics["loss"] = total
        return total, metrics

    def _mask_loss(self, feats, tgt: RoITargets, gt_masks):
        """Per-class BCE mask loss on positive rois (mmdet FCNMaskHead).

        Mask targets are built by RoI-aligning the gt masks themselves:
        each image's [G, Hm, Wm] masks become an Hm x Wm feature map with G
        channels; pooling the roi and selecting the assigned gt channel is
        one one-hot einsum — no per-roi crops.

        mmdet runs the mask branch only on the POSITIVE sampled rois — at
        most ``num * pos_fraction`` = 128 of the 512 (`RandomSampler`; the
        loss zeroes everything else anyway). The jit formulation takes a
        fixed 128-roi positives-first subset (stable argsort of the pos
        flag), which contains every positive by the sampler's cap, so the
        loss is unchanged while the head runs 4x fewer rois — and each roi
        evaluates only its own class channel (`MaskHead(labels=...)`), not
        the [N, H, W, 1203] map that OOMs at LVIS class counts.
        """
        c = self.cfg
        b, r = tgt.rois.shape[:2]
        mr = min(int(c.rcnn_sample.num * c.rcnn_sample.pos_fraction), r)
        order = jnp.argsort(-tgt.pos.astype(jnp.int32), axis=1)[:, :mr]
        rois = jnp.take_along_axis(tgt.rois, order[..., None], axis=1)
        labels = jnp.take_along_axis(tgt.labels, order, axis=1)
        gt_idx = jnp.take_along_axis(tgt.gt_idx, order, axis=1)
        pos = jnp.take_along_axis(tgt.pos, order, axis=1)

        pooled = multilevel_roi_align(
            feats[:4], rois, c.anchors.strides[:4], c.mask_roi_size, c.finest_scale
        )
        lab = jnp.clip(labels.reshape(-1), 0, c.num_classes - 1)
        ml = self.mask_head(
            pooled.reshape((b * mr,) + pooled.shape[2:]), lab
        )  # [B*mr, o, o]
        out = c.mask_roi_size * 2
        # stride of the gt mask raster relative to image coords
        mstride = float(c.image_size) / float(gt_masks.shape[2])
        maps = jnp.moveaxis(gt_masks.astype(jnp.float32), 1, -1)  # [B, Hm, Wm, G]
        tgt_masks = roi_align_nxn(maps, rois / mstride, (out, out))  # [B,mr,o,o,G]
        onehot = jax.nn.one_hot(gt_idx, gt_masks.shape[1])  # [B, mr, G]
        tgt_sel = jnp.einsum("brxyg,brg->brxy", tgt_masks, onehot)
        tgt_sel = (tgt_sel > 0.5).astype(jnp.float32).reshape(b * mr, out, out)
        bce = optax.sigmoid_binary_cross_entropy(ml, tgt_sel)
        posf = pos.reshape(-1)
        per_roi = bce.mean(axis=(1, 2))
        return (per_roi * posf).sum() / jnp.maximum(posf.sum(), 1.0)

    # ----- inference ----------------------------------------------------

    def predict(
        self,
        taps,
        dense_vlm: Optional[jnp.ndarray],
        class_embed,
        base_mask,
        image_hw=None,
        valid_hw: Optional[jnp.ndarray] = None,
    ):
        """Test-time detection with VLM score fusion.

        dense_vlm: [B, gh, gw, D] normalized dense CLIP map (None disables
        fusion). valid_hw: optional [B, 2] per-image pre-padding (h, w) to
        clip detections to. Returns (boxes [B, D, 4], scores [B, D],
        labels [B, D] [, mask probs [B, D, 2s, 2s]]).
        """
        c = self.cfg
        image_hw = image_hw or (c.image_size, c.image_size)
        feats, smap, dmap = self.features(taps)
        rpn = flatten_rpn_outputs(smap, dmap, c)
        props, pscores = rpn_proposals(
            rpn, image_hw,
            c.test_proposals.nms_pre, c.test_proposals.max_per_img,
            c.test_proposals.iou_threshold, c.test_proposals.min_bbox_size,
            valid_hw=valid_hw,
        )
        pooled = multilevel_roi_align(
            feats[:4], props, c.anchors.strides[:4], c.roi_feat_size, c.finest_scale
        )
        b, r = pooled.shape[:2]
        logits, deltas, _ = self.bbox_head(
            pooled.reshape((b * r,) + pooled.shape[2:]), class_embed
        )
        logits = logits.reshape(b, r, -1)
        deltas = deltas.reshape(b, r, 4)

        if dense_vlm is not None:
            # 1x1 RoI-align on the dense map; boxes in feature coords
            patch = float(c.image_size) / float(dense_vlm.shape[1])
            vlm_feats = roi_align_1x1(dense_vlm, props / patch)  # [B, R, D]
        else:
            vlm_feats = None

        def per_image(lg, dl, pr, ps, vf, vhw):
            if vf is not None:
                fused = fuse_vlm_scores(lg, vf, class_embed, base_mask, c)
            else:
                fused = jax.nn.softmax(lg, axis=-1)
            # empty NMS slots (score NEG_INF) must not become detections:
            # zero their probabilities so the score threshold removes them
            fused = jnp.where((ps > NEG_INF)[:, None], fused, 0.0)
            return rcnn_detections(pr, fused, dl, image_hw, c, valid_hw=vhw)

        if valid_hw is None:
            valid_hw_b = jnp.broadcast_to(
                jnp.asarray(image_hw, jnp.float32)[None, :], (b, 2)
            )
        else:
            valid_hw_b = valid_hw.astype(jnp.float32)
        if vlm_feats is None:
            det = jax.vmap(lambda l, d, p, ps, vhw: per_image(l, d, p, ps, None, vhw))(
                logits, deltas, props, pscores, valid_hw_b
            )
        else:
            det = jax.vmap(per_image)(logits, deltas, props, pscores, vlm_feats, valid_hw_b)
        boxes, scores, labels = det

        if not c.with_mask:
            return boxes, scores, labels
        mp = multilevel_roi_align(
            feats[:4], boxes, c.anchors.strides[:4], c.mask_roi_size, c.finest_scale
        )
        nd = mp.shape[1]
        lab = jnp.clip(labels.reshape(-1), 0, c.num_classes - 1)
        # each detection evaluates only its own class channel (exact
        # weight-gather — see MaskHead)
        ml = self.mask_head(mp.reshape((b * nd,) + mp.shape[2:]), lab)
        probs = jax.nn.sigmoid(ml).reshape(b, nd, ml.shape[1], ml.shape[2])
        return boxes, scores, labels, probs


def backbone_taps(clip_model, clip_params, images, cfg: FViTConfig, with_dense: bool):
    """Run the frozen CLIP visual trunk (stop-gradient) and return taps
    [+ dense VLM map] — reference `EvaCLIPViT.forward`
    (`F-ViT/models/evaclip_vit.py:61-115`)."""
    taps, dense = clip_model.apply(
        {"params": clip_params},
        images,
        tuple(cfg.out_indices),
        with_dense,
        method="visual_taps",
    )
    taps = [jax.lax.stop_gradient(t) for t in taps]
    dense = jax.lax.stop_gradient(dense) if dense is not None else None
    return taps, dense
