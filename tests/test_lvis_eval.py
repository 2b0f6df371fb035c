"""LvisEvaluator vs a line-by-line lvis-api transcription (tests/lviseval_oracle.py).

Randomized synthetic LVIS-style data exercising every protocol branch the
official evaluator has and COCOeval does not (`F-ViT/datasets/lvls_ov.py:120-180`):
per-image 300-det cap across categories, federated pos/neg image sets,
not-exhaustive ignore of unmatched detections, frequency-group means, and
area-range gt/det ignores. Agreement required at 1e-9.
"""

from __future__ import annotations

import numpy as np
import pytest

from clipself_tpu.detector.eval_lvis import LvisEvaluator
from lviseval_oracle import LVISEvalOracle

NUM_CATS = 12
NUM_IMGS = 10
FREQS = ["r", "c", "f", "r", "c", "f", "f", "c", "r", "f", "c", "f"]


def _rand_boxes(rng, n, lo=0.0, hi=400.0, wh_hi=120.0):
    xy = rng.uniform(lo, hi, size=(n, 2))
    wh = rng.uniform(2.0, wh_hi, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def _make_dataset(rng, with_mask=False, mask_hw=24):
    """Synthetic gt + results in both oracle (dict) and evaluator (array) form."""
    images = []
    gt_anns = []
    results = []
    per_image = []  # evaluator-side arrays
    ann_id = 0
    # category 11 (label 11) gets no gt anywhere -> -1, excluded; but it DOES
    # appear as a negative category with detections (pure-FP, still -1)
    absent = 11
    for img_i in range(NUM_IMGS):
        img_id = 100 + img_i
        n_gt = int(rng.integers(0, 7))
        g_boxes = _rand_boxes(rng, n_gt)
        g_labels = rng.integers(0, NUM_CATS - 1, size=n_gt)  # never the absent cat
        # polygon area deliberately != box area
        g_area = 0.7 * (g_boxes[:, 2] - g_boxes[:, 0]) * (g_boxes[:, 3] - g_boxes[:, 1])
        # a few tiny / huge gts to exercise the area ranges
        if n_gt > 2:
            g_area[0] = 15.0**2
            g_area[1] = 200.0**2
        pos = set(g_labels.tolist())
        neg = set(
            int(c)
            for c in rng.choice(NUM_CATS, size=4, replace=False)
            if int(c) not in pos
        )
        neg.add(absent)
        nel = set(
            int(c) for c in rng.choice(NUM_CATS, size=2, replace=False) if int(c) in pos
        )
        images.append(
            {
                "id": img_id,
                "neg_category_ids": sorted(c + 1 for c in neg),
                "not_exhaustive_category_ids": sorted(c + 1 for c in nel),
            }
        )
        g_masks = None
        if with_mask:
            g_masks = rng.uniform(size=(n_gt, mask_hw, mask_hw)) < 0.35
            g_area = g_masks.reshape(max(n_gt, 1), -1).sum(axis=1)[:n_gt].astype(np.float64)
        for j in range(n_gt):
            ann_id += 1
            ann = {
                "id": ann_id,
                "image_id": img_id,
                "category_id": int(g_labels[j]) + 1,
                "bbox": [
                    float(g_boxes[j, 0]),
                    float(g_boxes[j, 1]),
                    float(g_boxes[j, 2] - g_boxes[j, 0]),
                    float(g_boxes[j, 3] - g_boxes[j, 1]),
                ],
                "area": float(g_area[j]),
            }
            if with_mask:
                ann["segmentation"] = g_masks[j]
            gt_anns.append(ann)
        # detections: mostly perturbed copies of gts + noise dets of random
        # categories (incl. cats that are neither pos nor neg -> dropped by
        # the federated filter). image 0 gets a flood to exercise the cap.
        n_noise = int(rng.integers(3, 10)) + (60 if img_i == 0 else 0)
        d_boxes = [g_boxes + rng.normal(0, 6.0, size=g_boxes.shape)]
        d_labels = [g_labels.copy()]
        d_boxes.append(_rand_boxes(rng, n_noise))
        d_labels.append(rng.integers(0, NUM_CATS, size=n_noise))
        d_boxes = np.concatenate(d_boxes)
        d_boxes[:, 2:] = np.maximum(d_boxes[:, 2:], d_boxes[:, :2] + 1.0)
        d_labels = np.concatenate(d_labels)
        d_scores = rng.uniform(0.05, 1.0, size=len(d_labels))
        d_masks = None
        if with_mask:
            d_masks = rng.uniform(size=(len(d_labels), mask_hw, mask_hw)) < 0.35
        for j in range(len(d_labels)):
            r = {
                "image_id": img_id,
                "category_id": int(d_labels[j]) + 1,
                "bbox": [
                    float(d_boxes[j, 0]),
                    float(d_boxes[j, 1]),
                    float(d_boxes[j, 2] - d_boxes[j, 0]),
                    float(d_boxes[j, 3] - d_boxes[j, 1]),
                ],
                "score": float(d_scores[j]),
            }
            if with_mask:
                r["segmentation"] = d_masks[j]
            results.append(r)
        per_image.append(
            dict(
                det_boxes=d_boxes,
                det_scores=d_scores,
                det_labels=d_labels,
                gt_boxes=g_boxes,
                gt_labels=g_labels,
                gt_areas=g_area,
                neg_labels=sorted(neg),
                not_exhaustive_labels=sorted(nel),
                det_masks=list(d_masks) if with_mask else None,
                gt_masks=list(g_masks) if with_mask else None,
            )
        )
    gt_dataset = {
        "images": images,
        "annotations": gt_anns,
        "categories": [{"id": c + 1, "frequency": FREQS[c]} for c in range(NUM_CATS)],
    }
    return gt_dataset, results, per_image


KEYS = ["AP", "AP50", "AP75", "APs", "APm", "APl", "APr", "APc", "APf"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lvis_eval_matches_oracle_bbox(seed):
    rng = np.random.default_rng(seed)
    gt_dataset, results, per_image = _make_dataset(rng)
    # small cap so the per-image limit actually bites (image 0 has ~65 dets)
    oracle = LVISEvalOracle(gt_dataset, results, iou_type="bbox", max_dets=25)
    ref = oracle.run()
    ev = LvisEvaluator(NUM_CATS, freq_index=np.array(["rcf".index(f) for f in FREQS]), max_dets=25)
    for item in per_image:
        item = dict(item)
        item.pop("det_masks"), item.pop("gt_masks")
        ev.add_image(**item)
    got = ev.summarize()
    for k in KEYS + ["AR@25"]:
        ok = ref[k.replace("@25", "@300")] if k == "AR@25" else ref[k]
        assert got[k] == pytest.approx(ok, abs=1e-9), (k, got[k], ok)


def test_lvis_eval_matches_oracle_segm():
    rng = np.random.default_rng(7)
    gt_dataset, results, per_image = _make_dataset(rng, with_mask=True)
    oracle = LVISEvalOracle(gt_dataset, results, iou_type="segm", max_dets=25)
    ref = oracle.run()
    ev = LvisEvaluator(
        NUM_CATS,
        freq_index=np.array(["rcf".index(f) for f in FREQS]),
        max_dets=25,
        with_mask=True,
    )
    for item in per_image:
        ev.add_image(**item)
    got = ev.summarize()
    for k in KEYS:
        assert got[k] == pytest.approx(ref[k], abs=1e-9), (k, got[k], ref[k])


def test_federated_filter_drops_unlabeled_images():
    """A detection of cat c on an image where c is neither pos nor neg must
    not count as FP; on a neg image it must."""
    ev = LvisEvaluator(2, freq_index=np.array([0, 2]))
    box = np.array([[10.0, 10.0, 50.0, 50.0]])
    # image A: cat 0 positive (perfect match)
    ev.add_image(box, np.array([0.9]), np.array([0]), box, np.array([0]),
                 neg_labels=[], not_exhaustive_labels=[])
    # image B: cat 0 unlabeled -> this FP-looking det is DROPPED
    ev.add_image(box, np.array([0.95]), np.array([0]),
                 np.zeros((0, 4)), np.zeros(0, int),
                 neg_labels=[1], not_exhaustive_labels=[])
    m_dropped = ev.summarize()
    assert m_dropped["AP"] == pytest.approx(1.0)
    # same but image B negatively labels cat 0 -> the det IS an FP and it
    # outranks the TP (score 0.95 > 0.9), halving interpolated precision
    ev2 = LvisEvaluator(2, freq_index=np.array([0, 2]))
    ev2.add_image(box, np.array([0.9]), np.array([0]), box, np.array([0]),
                  neg_labels=[], not_exhaustive_labels=[])
    ev2.add_image(box, np.array([0.95]), np.array([0]),
                  np.zeros((0, 4)), np.zeros(0, int),
                  neg_labels=[0], not_exhaustive_labels=[])
    assert ev2.summarize()["AP"] == pytest.approx(0.5)


def test_not_exhaustive_ignores_unmatched_only():
    """Unmatched dets of a not-exhaustive cat are ignored (no FP), but a
    matched det still counts as TP."""
    ev = LvisEvaluator(1, freq_index=np.array([2]))
    gt = np.array([[10.0, 10.0, 50.0, 50.0]])
    dets = np.array([[10.0, 10.0, 50.0, 50.0], [200.0, 200.0, 260.0, 260.0]])
    ev.add_image(dets, np.array([0.9, 0.95]), np.array([0, 0]), gt,
                 np.array([0]), neg_labels=[], not_exhaustive_labels=[0])
    m = ev.summarize()
    assert m["AP"] == pytest.approx(1.0)  # the stray high-score det is ignored
    # without the not-exhaustive flag it is an FP that outranks the TP
    ev2 = LvisEvaluator(1, freq_index=np.array([2]))
    ev2.add_image(dets, np.array([0.9, 0.95]), np.array([0, 0]), gt,
                  np.array([0]), neg_labels=[], not_exhaustive_labels=[])
    assert ev2.summarize()["AP"] == pytest.approx(0.5)


def test_eval_dataset_carries_lvis_fields(tmp_path):
    """DetectionDataset eval items must carry polygon areas and the image's
    neg / not-exhaustive category ids mapped to contiguous labels
    (lvis-api `LVISEval._prepare` inputs; ref `lvls_ov.py:120-180`)."""
    import json as _json

    from PIL import Image as PILImage

    from clipself_tpu.detector.data import DetectionDataset

    arr = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    PILImage.fromarray(arr).save(tmp_path / "im0.jpg")
    js = {
        "images": [
            {
                "id": 5,
                "file_name": "im0.jpg",
                "width": 64,
                "height": 48,
                "neg_category_ids": [2, 9],  # 9 unmapped -> dropped
                "not_exhaustive_category_ids": [1],
            }
        ],
        "annotations": [
            {
                "id": 1, "image_id": 5, "category_id": 1,
                "bbox": [4, 4, 20, 16], "area": 123.0,
            }
        ],
        "categories": [{"id": 1, "name": "aerosol_can"}, {"id": 2, "name": "air_conditioner"}],
    }
    (tmp_path / "ann.json").write_text(_json.dumps(js))
    ds = DetectionDataset(
        str(tmp_path / "ann.json"), str(tmp_path), ["aerosol_can", "air_conditioner"],
        image_size=32, max_gt=4, train=False,
    )
    item = ds[0]
    np.testing.assert_allclose(item["_gt_areas_full"], [123.0])  # polygon, not box, area
    assert item["_neg_labels"] == [1]
    assert item["_nel_labels"] == [0]


def test_evaluate_detector_routes_lvis_protocol(tmp_path):
    """`evaluate_detector(dataset_name='lvis')` with a freq-grouped split must
    score with LvisEvaluator and report the LVIS summary keys (AP/APr/APc/APf),
    matching the reference's lvis-api use (`F-ViT/datasets/lvls_ov.py:120-180`)."""
    import dataclasses
    import json as _json

    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from tests.test_detector_model import DET_CFG, TINY_CLIP
    from clipself_tpu.detector.data import DetectionDataset
    from clipself_tpu.detector.evaluate import evaluate_detector
    from clipself_tpu.detector.fvit import FViTDetector
    from clipself_tpu.models.factory import create_model

    names = ["aerosol_can", "air_conditioner"]
    imgs, anns = [], []
    for i in range(2):
        arr = (np.random.default_rng(i).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"im{i}.jpg")
        imgs.append(
            {
                "id": i, "file_name": f"im{i}.jpg", "width": 64, "height": 48,
                "neg_category_ids": [2], "not_exhaustive_category_ids": [],
            }
        )
        anns.append(
            {
                "id": 10 + i, "image_id": i, "category_id": 1,
                "bbox": [4, 4, 20, 16], "area": 320.0,
            }
        )
    (tmp_path / "ann.json").write_text(
        _json.dumps({"images": imgs, "annotations": anns,
                     "categories": [{"id": 1, "name": names[0]}, {"id": 2, "name": names[1]}]})
    )
    split = {
        "all": names, "seen": [names[1]], "unseen": [names[0]],
        "freq_groups": {"rare": [names[0]], "common": [], "frequent": [names[1]]},
    }
    cfg = dataclasses.replace(DET_CFG, num_classes=2, image_size=64)
    clip_model, clip_params = create_model(TINY_CLIP, dtype=jnp.float32)
    det = FViTDetector(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ce = rng.normal(size=(3, 32)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=-1, keepdims=True)
    ds = DetectionDataset(
        str(tmp_path / "ann.json"), str(tmp_path), names,
        image_size=64, max_gt=4, train=False,
    )
    taps = [jnp.zeros((1, 8, 8, 64), jnp.float32)] * 4
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]])
    det_params = det.init(jax.random.PRNGKey(1), taps, rois, jnp.asarray(ce))["params"]
    metrics = evaluate_detector(
        det, det_params, clip_model, clip_params, ds, cfg, ce,
        dataset_name="lvis", batch_size=2, split=split,
    )
    for k in ("AP", "AP50", "APr", "APc", "APf", "mAP_rare"):
        assert k in metrics, k
    # category 2 (air_conditioner) has no gt anywhere -> its group (frequent)
    # is the -1 sentinel
    assert metrics["APf"] == -1.0
