"""Faithful pure-Python transcription of the official lvis-api evaluation
pipeline (LVISResults + LVISEval) — a TEST ORACLE for
`clipself_tpu.detector.eval_lvis` (the lvis package is not installed).

Mirrors `lvis/results.py` + `lvis/eval.py` (the evaluator the reference
imports at `F-ViT/datasets/lvls_ov.py:120-128`):
  - LVISResults.limit_dets_per_image: per-IMAGE cap of `max_dets` detections
    across ALL categories, by score (not the per-(image,class) cap COCOeval
    applies)
  - _prepare's federated filtering: detections of category c on an image
    where c is neither positively labeled (has gt anns) nor negatively
    labeled (c in the image's `neg_category_ids`) are DROPPED entirely
  - _evaluate_img: greedy score-ordered matching per iou threshold (LVIS has
    no crowd anns), gt `_ignore` from the area range, and the LVIS-specific
    rule that UNMATCHED detections whose category is in the image's
    `not_exhaustive_category_ids` (or whose area is outside the range) are
    ignored rather than counted as false positives
  - accumulate: per-(cat, area) score-merged cumsum, monotone precision
    envelope, 101-point searchsorted interpolation, num_gt gating (-1
    sentinel keeps absent categories out of every mean)
  - summarize/_summarize: AP over all s > -1 entries; APr/APc/APf restrict
    the category axis to the r/c/f frequency groups

This is reference-dependency scaffolding (like tests/cocoeval_oracle.py),
NOT product code: the loop structure deliberately follows upstream line by
line rather than this repo's vectorized evaluator.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [
    [0.0, 1e5**2],
    [0.0, 32.0**2],
    [32.0**2, 96.0**2],
    [96.0**2, 1e5**2],
]
AREA_LBLS = ["all", "small", "medium", "large"]


def _box_iou(dt, gt):
    # mask_utils.iou with iscrowd all-zero (LVIS has no crowd anns)
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
            out[i, j] = inter / (da + ga - inter)
    return out


def _mask_iou(dt_masks, gt_masks):
    out = np.zeros((len(dt_masks), len(gt_masks)))
    for i, d in enumerate(dt_masks):
        db = d.reshape(-1).astype(bool)
        for j, g in enumerate(gt_masks):
            gb = g.reshape(-1).astype(bool)
            union = (db | gb).sum()
            if union:
                out[i, j] = (db & gb).sum() / union
    return out


def limit_dets_per_image(anns, max_dets):
    """lvis/results.py LVISResults.limit_dets_per_image."""
    img_ann = defaultdict(list)
    for ann in anns:
        img_ann[ann["image_id"]].append(ann)
    for img_id, _anns in img_ann.items():
        if len(_anns) <= max_dets:
            continue
        _anns = sorted(_anns, key=lambda ann: ann["score"], reverse=True)
        img_ann[img_id] = _anns[:max_dets]
    return [ann for anns in img_ann.values() for ann in anns]


class LVISEvalOracle:
    """lvis/eval.py LVISEval, restricted to what the protocol needs.

    gt_dataset: {"images": [{"id", "neg_category_ids",
                 "not_exhaustive_category_ids"}], "annotations": [{"id",
                 "image_id", "category_id", "bbox" xywh, "area",
                 ("segmentation" raster for segm)}],
                 "categories": [{"id", "frequency" in r/c/f}]}
    results: [{"image_id", "category_id", "bbox" xywh, "score",
               ("segmentation" raster)}]
    """

    def __init__(self, gt_dataset, results, iou_type="bbox", max_dets=300):
        self.gt = gt_dataset
        self.iou_type = iou_type
        self.max_dets = max_dets
        self.img_ids = sorted(d["id"] for d in gt_dataset["images"])
        self.cat_ids = sorted(c["id"] for c in gt_dataset["categories"])
        # LVISResults: assign ids, compute area from bbox, cap per image
        # LVISResults: when results carry a bbox (mmdet's results2json always
        # writes one, for segm files too), area = w*h
        dts = []
        for i, r in enumerate(results):
            r = dict(r)
            r["id"] = i + 1
            r["area"] = r["bbox"][2] * r["bbox"][3]
            dts.append(r)
        dts = limit_dets_per_image(dts, max_dets)
        self._prepare(dts)

    def _prepare(self, dts):
        gts = [dict(g) for g in self.gt["annotations"]]
        for gt in gts:
            gt["ignore"] = gt.get("ignore", 0)
        self._gts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        img_data = self.gt["images"]
        img_nl = {d["id"]: d.get("neg_category_ids", []) for d in img_data}
        img_pl = defaultdict(set)
        for ann in gts:
            img_pl[ann["image_id"]].add(ann["category_id"])
        self.img_nel = {
            d["id"]: d.get("not_exhaustive_category_ids", []) for d in img_data
        }
        self._dts = defaultdict(list)
        for dt in dts:
            img_id, cat_id = dt["image_id"], dt["category_id"]
            if cat_id not in img_nl[img_id] and cat_id not in img_pl[img_id]:
                continue
            self._dts[img_id, cat_id].append(dt)
        # frequency groups over the category-index axis
        self.freq_groups = [[], [], []]
        order = {"r": 0, "c": 1, "f": 2}
        cats = {c["id"]: c for c in self.gt["categories"]}
        for idx, cat_id in enumerate(self.cat_ids):
            self.freq_groups[order[cats[cat_id]["frequency"]]].append(idx)

    def _get_gt_dt(self, img_id, cat_id):
        return self._gts[img_id, cat_id], self._dts[img_id, cat_id]

    def _compute_iou(self, img_id, cat_id):
        gt, dt = self._get_gt_dt(img_id, cat_id)
        dt = sorted(dt, key=lambda d: -d["score"])
        if len(dt) > self.max_dets:
            dt = dt[: self.max_dets]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        if self.iou_type == "segm":
            return _mask_iou(
                [d["segmentation"] for d in dt], [g["segmentation"] for g in gt]
            )
        to_xyxy = lambda b: [b[0], b[1], b[0] + b[2], b[1] + b[3]]
        return _box_iou(
            [to_xyxy(d["bbox"]) for d in dt], [to_xyxy(g["bbox"]) for g in gt]
        )

    def _evaluate_img(self, img_id, cat_id, area_rng):
        """lvis/eval.py LVISEval._evaluate_img."""
        gt, dt = self._get_gt_dt(img_id, cat_id)
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < area_rng[0] or g["area"] > area_rng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gt_idx = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gt_idx]
        dt_idx = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dt_idx]
        ious = (
            self.ious[img_id, cat_id][:, gt_idx]
            if len(self.ious[img_id, cat_id]) > 0
            else self.ious[img_id, cat_id]
        )
        num_thrs = len(IOU_THRS)
        num_gt = len(gt)
        num_dt = len(dt)
        gt_m = np.zeros((num_thrs, num_gt))
        dt_m = np.zeros((num_thrs, num_dt))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((num_thrs, num_dt))
        for iou_thr_idx, iou_thr in enumerate(IOU_THRS):
            if len(ious) == 0:
                break
            for dt_idx_, _dt in enumerate(dt):
                iou = min([iou_thr, 1 - 1e-10])
                m = -1
                for gt_idx_ in range(num_gt):
                    if gt_m[iou_thr_idx, gt_idx_] > 0:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gt_idx_] == 1:
                        break
                    if ious[dt_idx_, gt_idx_] < iou:
                        continue
                    iou = ious[dt_idx_, gt_idx_]
                    m = gt_idx_
                if m == -1:
                    continue
                dt_ig[iou_thr_idx, dt_idx_] = gt_ig[m]
                dt_m[iou_thr_idx, dt_idx_] = gt[m]["id"]
                gt_m[iou_thr_idx, m] = _dt["id"]
        # LVIS: ignore any UNMATCHED detection whose category was not
        # exhaustively annotated in its image, or whose area is out of range
        dt_ig_mask = [
            d["area"] < area_rng[0]
            or d["area"] > area_rng[1]
            or d["category_id"] in self.img_nel[d["image_id"]]
            for d in dt
        ]
        dt_ig_mask = np.array(dt_ig_mask).reshape((1, num_dt))
        dt_ig_mask = np.repeat(dt_ig_mask, num_thrs, 0)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dt_m == 0, dt_ig_mask))
        return {
            "dt_matches": dt_m,
            "dt_scores": np.array([d["score"] for d in dt]),
            "gt_ignore": gt_ig,
            "dt_ignore": dt_ig,
        }

    def evaluate(self):
        self.ious = {
            (img_id, cat_id): self._compute_iou(img_id, cat_id)
            for img_id in self.img_ids
            for cat_id in self.cat_ids
        }
        self.eval_imgs = [
            self._evaluate_img(img_id, cat_id, area_rng)
            for cat_id in self.cat_ids
            for area_rng in AREA_RNGS
            for img_id in self.img_ids
        ]

    def accumulate(self):
        """lvis/eval.py LVISEval.accumulate."""
        num_thrs = len(IOU_THRS)
        num_recalls = len(RECALL_THRS)
        num_cats = len(self.cat_ids)
        num_area_rngs = len(AREA_RNGS)
        num_imgs = len(self.img_ids)
        precision = -np.ones((num_thrs, num_recalls, num_cats, num_area_rngs))
        recall = -np.ones((num_thrs, num_cats, num_area_rngs))
        for cat_idx in range(num_cats):
            Nk = cat_idx * num_area_rngs * num_imgs
            for area_idx in range(num_area_rngs):
                Na = area_idx * num_imgs
                E = [
                    self.eval_imgs[Nk + Na + img_idx] for img_idx in range(num_imgs)
                ]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate([e["dt_scores"] for e in E], axis=0)
                dt_idx = np.argsort(-dt_scores, kind="mergesort")
                dt_m = np.concatenate([e["dt_matches"] for e in E], axis=1)[:, dt_idx]
                dt_ig = np.concatenate([e["dt_ignore"] for e in E], axis=1)[:, dt_idx]
                gt_ig = np.concatenate([e["gt_ignore"] for e in E])
                num_gt = np.count_nonzero(gt_ig == 0)
                if num_gt == 0:
                    continue
                tps = np.logical_and(dt_m, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dt_m), np.logical_not(dt_ig)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                for iou_thr_idx, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    num_tp = len(tp)
                    rc = tp / num_gt
                    if num_tp:
                        recall[iou_thr_idx, cat_idx, area_idx] = rc[-1]
                    else:
                        recall[iou_thr_idx, cat_idx, area_idx] = 0
                    pr = tp / (fp + tp + np.spacing(1))
                    pr = pr.tolist()
                    for i in range(num_tp - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    rec_thrs_insert_idx = np.searchsorted(
                        rc, RECALL_THRS, side="left"
                    )
                    pr_at_recall = [0.0] * num_recalls
                    try:
                        for _idx, pr_idx in enumerate(rec_thrs_insert_idx):
                            pr_at_recall[_idx] = pr[pr_idx]
                    except IndexError:
                        pass
                    precision[iou_thr_idx, :, cat_idx, area_idx] = np.array(
                        pr_at_recall
                    )
        self.eval = {"precision": precision, "recall": recall}

    def _summarize(self, summary_type, iou_thr=None, area_rng="all", freq_group_idx=None):
        aidx = [i for i, lbl in enumerate(AREA_LBLS) if lbl == area_rng]
        if summary_type == "ap":
            s = self.eval["precision"]
            if iou_thr is not None:
                tidx = np.where(np.isclose(iou_thr, IOU_THRS))[0]
                s = s[tidx]
            if freq_group_idx is not None:
                s = s[:, :, self.freq_groups[freq_group_idx], :][:, :, :, aidx]
            else:
                s = s[:, :, :, aidx]
        else:
            s = self.eval["recall"]
            if iou_thr is not None:
                tidx = np.where(np.isclose(iou_thr, IOU_THRS))[0]
                s = s[tidx]
            s = s[:, :, aidx]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        self.results = {
            "AP": self._summarize("ap"),
            "AP50": self._summarize("ap", iou_thr=0.50),
            "AP75": self._summarize("ap", iou_thr=0.75),
            "APs": self._summarize("ap", area_rng="small"),
            "APm": self._summarize("ap", area_rng="medium"),
            "APl": self._summarize("ap", area_rng="large"),
            "APr": self._summarize("ap", freq_group_idx=0),
            "APc": self._summarize("ap", freq_group_idx=1),
            "APf": self._summarize("ap", freq_group_idx=2),
            "AR@300": self._summarize("ar"),
        }
        return self.results

    def run(self):
        self.evaluate()
        self.accumulate()
        return self.summarize()
