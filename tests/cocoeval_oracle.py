"""Faithful pure-Python transcription of the pycocotools COCOeval pipeline
(bbox, area range 'all', one maxDets value, useCats=1) — a TEST ORACLE for
`clipself_tpu.detector.eval_ap` (pycocotools itself is not installed).

Mirrors `pycocotools/cocoeval.py`:
  - computeIoU with the iscrowd intersection-over-det rule
  - evaluateImg's greedy per-threshold matching loop (gtm/dtm/dtIg arrays,
    crowd gts re-matchable, ignored-gt fallback ordering)
  - accumulate's score-merged cumsum, monotone precision envelope and
    101-point searchsorted interpolation, npig gating

This is reference-dependency scaffolding (like the torchvision roi_align
stub), NOT product code: the loop structure deliberately follows upstream
line by line rather than this repo's vectorized evaluator.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def _iou(dt, gt, iscrowd):
    # pycocotools maskUtils.iou for boxes
    out = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        ga = (g[2] - g[0]) * (g[3] - g[1])
        for i, d in enumerate(dt):
            da = (d[2] - d[0]) * (d[3] - d[1])
            w = min(d[2], g[2]) - max(d[0], g[0])
            h = min(d[3], g[3]) - max(d[1], g[1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union
    return out


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_crowd, max_det):
    """pycocotools COCOeval.evaluateImg for one (image, category)."""
    G, D = len(gt_boxes), len(dt_boxes)
    if G == 0 and D == 0:
        return None
    gtind = np.argsort(gt_ignore, kind="mergesort")
    gt_boxes = gt_boxes[gtind]
    gt_ig = gt_ignore[gtind].astype(float)
    crowd = gt_crowd[gtind]
    dtind = np.argsort(-dt_scores, kind="mergesort")[:max_det]
    dt_boxes = dt_boxes[dtind]
    dt_scores = dt_scores[dtind]
    D = len(dt_boxes)
    ious = _iou(dt_boxes, gt_boxes, crowd)
    T = len(IOU_THRS)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not crowd[gind]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = 1 + m  # gt "id"
            gtm[tind, m] = 1 + dind
    return {
        "dtScores": dt_scores,
        "dtMatches": dtm,
        "dtIgnore": dt_ig.astype(bool),
        "npig": int((gt_ig == 0).sum()),
    }


def coco_eval_oracle(images, num_classes, max_det=100):
    """images: list of dicts with dt_boxes/dt_scores/dt_labels and
    gt_boxes/gt_labels/gt_ignore/gt_crowd (xyxy). Returns the COCO metric
    dict {mAP, AP50, AP75} plus per-class AP[T]."""
    T, R = len(IOU_THRS), len(RECALL_THRS)
    precision = -np.ones((T, R, num_classes))
    for k in range(num_classes):
        evals = []
        for im in images:
            dsel = im["dt_labels"] == k
            gsel = im["gt_labels"] == k
            e = _evaluate_img(
                im["dt_boxes"][dsel], im["dt_scores"][dsel],
                im["gt_boxes"][gsel], im["gt_ignore"][gsel],
                im["gt_crowd"][gsel], max_det,
            )
            if e is not None:
                evals.append(e)
        if not evals:
            continue
        dt_scores = np.concatenate([e["dtScores"] for e in evals])
        inds = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
        dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]
        npig = sum(e["npig"] for e in evals)
        if npig == 0:
            continue
        tps = (dtm > 0) & ~dt_ig
        fps = (dtm == 0) & ~dt_ig
        tp_sum = np.cumsum(tps, axis=1).astype(float)
        fp_sum = np.cumsum(fps, axis=1).astype(float)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros(R)
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds2 = np.searchsorted(rc, RECALL_THRS, side="left")
            for ri, pi in enumerate(inds2):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[t, :, k] = q
    def _mean(p):
        valid = p[p > -1]
        return float(valid.mean()) if valid.size else float("nan")
    per_class = np.array([
        [_mean(precision[t, :, k]) for t in range(T)] for k in range(num_classes)
    ])
    return {
        "mAP": _mean(precision),
        "AP50": _mean(precision[0]),
        "AP75": _mean(precision[5]),
        "per_class": per_class,
    }
