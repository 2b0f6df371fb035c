"""Assignment and sampling as fixed-shape masked computation.

Reproduces mmdet `MaxIoUAssigner` + `RandomSampler` semantics (reference
train cfg `F-ViT/configs/ov_coco/...eva_original.py:89-126`) without any
data-dependent shapes: every anchor/proposal gets an assignment label, and
"sampling" selects a static-size subset via randomized top-k masks — the
TPU-native replacement for mmdet's variable-length index lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from clipself_tpu.detector.boxes import box_iou


class Assignment(NamedTuple):
    gt_idx: jnp.ndarray  # [N] index of assigned gt (valid only where pos)
    max_iou: jnp.ndarray  # [N]
    pos: jnp.ndarray  # [N] bool
    neg: jnp.ndarray  # [N] bool


def assign_max_iou(
    boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float,
    match_low_quality: bool,
) -> Assignment:
    """Max-IoU assignment over padded gt boxes.

    Args:
      boxes: [N, 4] anchors or proposals.
      gt_boxes: [G, 4] padded; gt_valid: [G] bool.
    """
    iou = box_iou(boxes, gt_boxes)  # [N, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    gt_idx = jnp.argmax(iou, axis=1)
    max_iou = jnp.max(iou, axis=1)
    pos = max_iou >= pos_iou_thr
    # mmdet: anchors with no overlapping (or no valid) gt are NEGATIVE —
    # images whose gts were all cropped away still train background
    neg = max_iou < neg_iou_thr

    if match_low_quality:
        # each gt claims its best-overlapping anchor(s) if IoU >= min_pos_iou.
        # mmdet assigns every anchor tying the per-gt max (gt_max_assign_all).
        gt_best = jnp.max(iou, axis=0)  # [G]
        is_best = (iou == gt_best[None, :]) & (iou > 0.0) & gt_valid[None, :]
        claim = is_best & (gt_best[None, :] >= min_pos_iou)
        claimed = jnp.any(claim, axis=1)
        # later gts override earlier ones (mmdet iterates gts in order)
        claim_gt = jnp.where(
            claimed,
            (claim.shape[1] - 1)
            - jnp.argmax(claim[:, ::-1], axis=1),  # last claiming gt
            gt_idx,
        )
        gt_idx = jnp.where(claimed, claim_gt, gt_idx)
        pos = pos | claimed
        neg = neg & ~claimed

    return Assignment(gt_idx=gt_idx, max_iou=max_iou, pos=pos, neg=neg)


class SampleResult(NamedTuple):
    pos_mask: jnp.ndarray  # [N] bool, sampled positives
    neg_mask: jnp.ndarray  # [N] bool, sampled negatives
    num_pos: jnp.ndarray  # scalar
    num_neg: jnp.ndarray  # scalar


def random_sample(
    rng: jax.Array,
    assign: Assignment,
    num: int,
    pos_fraction: float,
) -> SampleResult:
    """Random pos/neg subsampling with fixed budget (mmdet `RandomSampler`).

    Up to `num * pos_fraction` positives are kept (random without
    replacement); the remaining budget is filled with random negatives.
    Expressed as two randomized top-k masks.
    """
    n = assign.pos.shape[0]
    num_pos_max = int(num * pos_fraction)
    kpos, kneg = jax.random.split(rng)

    # Exact top-k scatter masks rather than score thresholds: a `>= kth`
    # threshold keeps EVERY entry tied at the k-th score, so a float32
    # noise collision among > k candidates could silently exceed the cap
    # (advisor round-4 finding). top_k breaks ties by index, so the masks
    # hold exactly min(count, cap) entries by construction — the invariant
    # the mask branch's positives-first subset (fvit.py::_mask_loss) and
    # the reference's RandomSampler both rely on.
    pos_noise = jax.random.uniform(kpos, (n,))
    pos_score = jnp.where(assign.pos, pos_noise, -1.0)
    pos_mask = _topk_mask(pos_score, num_pos_max) & assign.pos
    num_pos = jnp.minimum(assign.pos.sum(), num_pos_max)

    budget = num - num_pos  # traced: dynamic cutoff within a static top-k
    neg_noise = jax.random.uniform(kneg, (n,))
    neg_score = jnp.where(assign.neg, neg_noise, -1.0)
    neg_mask = _topk_mask(neg_score, num, k_dynamic=budget) & assign.neg
    num_neg = jnp.minimum(assign.neg.sum(), budget)
    return SampleResult(pos_mask=pos_mask, neg_mask=neg_mask, num_pos=num_pos, num_neg=num_neg)


def _topk_mask(score: jnp.ndarray, k: int, k_dynamic=None) -> jnp.ndarray:
    """Boolean mask of the top-k scores, ties broken by index (static k).

    k_dynamic (traced, <= k) optionally keeps only the first k_dynamic of
    the k ranked entries."""
    n = score.shape[0]
    if k <= 0:
        return jnp.zeros((n,), bool)
    k = min(k, n)
    _, idx = jax.lax.top_k(score, k)
    keep = jnp.ones((k,), bool) if k_dynamic is None else jnp.arange(k) < k_dynamic
    return jnp.zeros((n,), bool).at[idx].set(keep)
