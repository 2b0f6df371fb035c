"""AP evaluator, class splits, detection data pipeline, train step."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from clipself_tpu.detector.classes import base_novel_mask, class_weights, coco_split, lvis_split
from clipself_tpu.detector.data import DetectionDataset, SyntheticDetectionData, collate
from clipself_tpu.detector.eval_ap import DetectionEvaluator


def test_perfect_detections_ap1():
    ev = DetectionEvaluator(num_classes=3)
    rng = np.random.default_rng(0)
    for _ in range(4):
        gt = rng.uniform(0, 100, (5, 2))
        gt = np.concatenate([gt, gt + rng.uniform(10, 40, (5, 2))], -1).astype(np.float32)
        labels = rng.integers(0, 3, 5)
        ev.add_image(gt, np.linspace(0.9, 0.5, 5), labels, gt, labels)
    m = ev.summarize()
    assert m["mAP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)


def test_missed_and_false_positive():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    # one perfect hit (higher score) + one false positive far away
    det = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    ev.add_image(det, np.array([0.9, 0.8]), np.zeros(2, int), gt, np.zeros(2, int))
    m = ev.summarize()
    # precision@recall: 1 tp of 2 gts -> recall 0.5 with precision 1 up to
    # there; AP = 0.5 (101-pt: ~0.5 within interpolation error)
    assert m["AP50"] == pytest.approx(0.5, abs=0.01)


def test_ignore_gt_not_counted():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    ignore = np.array([False, True])
    det = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    ev.add_image(det, np.array([0.9, 0.8]), np.zeros(2, int), gt, np.zeros(2, int), ignore)
    m = ev.summarize()
    # det matching the ignored gt is neither tp nor fp; the real gt is found
    assert m["AP50"] == pytest.approx(1.0)


def test_localization_quality_thresholds():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    det = np.array([[0, 0, 10, 8.0]], np.float32)  # IoU 0.8
    ev.add_image(det, np.array([0.9]), np.zeros(1, int), gt, np.zeros(1, int))
    m = ev.summarize()
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(1.0)
    assert m["mAP"] == pytest.approx(7 / 10, abs=0.01)  # thresholds .5..0.8 hit


def test_class_splits():
    coco = coco_split()
    assert len(coco["all"]) == 65 and len(coco["seen"]) == 48 and len(coco["unseen"]) == 17
    lvis = lvis_split()
    assert len(lvis["all"]) == 1203
    assert len(lvis["freq_groups"]["rare"]) == 337
    w = class_weights("coco", 0.6)
    assert w.shape == (66,) and w[-1] == 0.6 and (w[:-1] == 0).sum() == 17
    wl = class_weights("lvis", 0.9)
    assert wl.shape == (1204,) and (wl[:-1] == 0).sum() == len(lvis["freq_groups"]["rare"])
    bm = base_novel_mask("coco")
    assert bm.shape == (66,) and bm[-1] and (~bm).sum() == 17


@pytest.fixture()
def tiny_coco(tmp_path):
    imgs = []
    anns = []
    for i in range(3):
        arr = (np.random.default_rng(i).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
        name = f"im{i}.jpg"
        Image.fromarray(arr).save(tmp_path / name)
        imgs.append({"id": i, "file_name": name, "width": 64, "height": 48})
        anns.append(
            {
                "id": 10 + i, "image_id": i, "category_id": 1,
                "bbox": [4, 4, 20, 16], "area": 320, "iscrowd": 0,
                "segmentation": [[4, 4, 24, 4, 24, 20, 4, 20]],
            }
        )
    cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "skateboard"}]
    js = {"images": imgs, "annotations": anns, "categories": cats}
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(js))
    return str(path), str(tmp_path)


def test_detection_dataset_train_eval(tiny_coco):
    ann, root = tiny_coco
    names = ["person", "skateboard"]
    ds = DetectionDataset(ann, root, names, image_size=32, max_gt=4, train=True, with_mask=True)
    assert len(ds) == 3
    it = ds[0]
    assert it["images"].shape == (32, 32, 3)
    assert it["gt_boxes"].shape == (4, 4)
    assert it["gt_masks"].shape == (4, 8, 8)
    # determinism per (seed, epoch, idx)
    it2 = ds[0]
    np.testing.assert_array_equal(it["images"], it2["images"])
    ds.set_epoch(1)
    it3 = ds[0]
    assert not np.array_equal(it["images"], it3["images"])

    ev = DetectionDataset(ann, root, names, image_size=32, max_gt=4, train=False)
    item = ev[0]
    s = float(item["scale"])
    assert s == pytest.approx(0.5)
    assert item["gt_valid"].sum() == 1
    np.testing.assert_allclose(item["gt_boxes"][0], np.array([4, 4, 24, 20]) * s)
    b = collate([ev[0], ev[1]])
    assert b["images"].shape == (2, 32, 32, 3)


def test_synthetic_detection_data():
    d = SyntheticDetectionData(6, image_size=32, max_gt=4, with_mask=True)
    b = d.batch(2)
    assert b["images"].shape == (2, 32, 32, 3)
    assert b["gt_masks"].shape == (2, 4, 8, 8)


def test_det_train_step_decreases_loss():
    from tests.test_detector_model import DET_CFG, TINY_CLIP
    from clipself_tpu.detector.fvit import FViTDetector
    from clipself_tpu.detector.train import (
        DetTrainState,
        build_det_optimizer,
        make_det_train_step,
    )
    from clipself_tpu.models.factory import create_model

    clip_model, clip_params = create_model(TINY_CLIP, dtype=jnp.float32)
    det = FViTDetector(DET_CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ce = rng.normal(size=(DET_CFG.num_classes + 1, 32)).astype(np.float32)
    ce = jnp.asarray(ce / np.linalg.norm(ce, axis=-1, keepdims=True))

    data = SyntheticDetectionData(DET_CFG.num_classes, image_size=64, max_gt=5)
    batch = {k: jnp.asarray(v) for k, v in data.batch(2).items() if k not in ("scale", "image_id")}
    taps, _ = clip_model.apply(
        {"params": clip_params}, batch["images"], DET_CFG.out_indices, False,
        method="visual_taps",
    )
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]], [[8.0, 8.0, 40.0, 50.0]]])
    det_params = det.init(jax.random.PRNGKey(1), taps, rois, ce)["params"]

    tx = build_det_optimizer(1e-3)
    state = DetTrainState.create(det_params, tx)
    step = make_det_train_step(det, clip_model, tx, DET_CFG, ce, None)
    losses = []
    for _ in range(6):
        state, metrics = step(state, clip_params, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_transfer_splits_and_presets():
    from clipself_tpu.detector.classes import base_novel_mask, transfer_split
    from clipself_tpu.detector.config import PRESETS

    voc = transfer_split("voc")
    assert len(voc["all"]) == 20 and not voc["unseen"]
    o365 = transfer_split("objects365")
    assert len(o365["all"]) == 365
    p = PRESETS["transfer_voc_vitl14"]
    assert p.num_classes == 20 and p.alpha == p.beta == 0.3


def test_evaluate_detector_end_to_end(tiny_coco, monkeypatch):
    """Full evaluation driver: predict -> rescale -> COCO AP, with masks and
    a partial final batch; must not crash and must count every image."""
    import dataclasses

    from tests.test_detector_model import DET_CFG, TINY_CLIP
    from clipself_tpu.detector import evaluate as ev_mod
    from clipself_tpu.detector.evaluate import evaluate_detector
    from clipself_tpu.detector.fvit import FViTDetector
    from clipself_tpu.models.factory import create_model

    ann, root = tiny_coco
    cfg = dataclasses.replace(
        DET_CFG, with_mask=True, mask_convs=1, mask_channels=16, mask_roi_size=4,
        num_classes=65, image_size=64,
    )
    clip_model, clip_params = create_model(TINY_CLIP, dtype=jnp.float32)
    det = FViTDetector(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ce = rng.normal(size=(66, 32)).astype(np.float32)
    ce /= np.linalg.norm(ce, axis=-1, keepdims=True)

    from clipself_tpu.detector.data import DetectionDataset
    from clipself_tpu.detector.classes import coco_split

    names = coco_split()["all"]
    ds = DetectionDataset(ann, root, names, image_size=64, max_gt=4, train=False, with_mask=True)
    taps = [jnp.zeros((1, 8, 8, 64), jnp.float32)] * 4
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]])
    det_params = det.init(jax.random.PRNGKey(1), taps, rois, jnp.asarray(ce))["params"]

    metrics = evaluate_detector(
        det, det_params, clip_model, clip_params, ds, cfg, ce,
        dataset_name="coco", batch_size=2, max_images=3,  # 3 images -> partial batch
    )
    assert "AP50" in metrics and "segm_AP50" in metrics
    assert np.isfinite(metrics["mAP"]) or np.isnan(metrics["mAP"])


def test_eval_dataset_carries_full_gts_and_crowd(tiny_coco):
    import json

    ann, root = tiny_coco
    # add a crowd annotation to image 0
    data = json.load(open(ann))
    data["annotations"].append(
        {"id": 99, "image_id": 0, "category_id": 2, "bbox": [1, 1, 10, 10],
         "area": 100, "iscrowd": 1}
    )
    json.dump(data, open(ann, "w"))
    names = ["person", "skateboard"]
    ds = DetectionDataset(ann, root, names, image_size=32, max_gt=4, train=False)
    it = ds[0]
    assert it["_gt_boxes_full"].shape == (2, 4)
    assert list(it["_gt_ignore_full"]) == [False, True]
    assert it["valid_hw"].tolist() == [24.0, 32.0]
    # train mode drops the crowd ann
    tr = DetectionDataset(ann, root, names, image_size=32, max_gt=4, train=True)
    item = tr[0]
    assert item["gt_valid"].sum() == 1
    # collate skips underscore keys
    from clipself_tpu.detector.data import collate

    b = collate([ds[0], ds[1]])
    assert "_gt_boxes_full" not in b and "valid_hw" in b


def test_rle_decode():
    from clipself_tpu.detector.data import rle_decode

    # uncompressed, column-major: 2x3 mask
    rle = {"size": [2, 3], "counts": [1, 2, 3]}
    m = rle_decode(rle)
    # column-major runs: col0 = [0,1], col1 = [1,0], col2 = [0,0]... wait:
    # flat (col-major) = [0, 1, 1, 0, 0, 0] -> reshape(3,2).T
    want = np.array([[0, 1, 0], [1, 0, 0]], np.uint8)
    np.testing.assert_array_equal(m, want)

    # compressed round trip via the documented LEB128-style scheme
    def compress(counts):
        out = []
        for i, x in enumerate(counts):
            if i > 2:
                x = x - counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                out.append(chr(c + 48))
        return "".join(out)

    counts = [0, 5, 3, 4, 12]
    rle2 = {"size": [4, 6], "counts": compress(counts)}
    m2 = rle_decode(rle2)
    ref = rle_decode({"size": [4, 6], "counts": counts})
    np.testing.assert_array_equal(m2, ref)
    assert m2.sum() == 5 + 4


def test_eval_ap_matches_pycocotools_oracle():
    """Randomized cross-validation of DetectionEvaluator against a literal
    transcription of the pycocotools COCOeval pipeline
    (tests/cocoeval_oracle.py): many images, classes, crowd + ignore flags,
    duplicate detections, score ties."""
    import numpy as np

    from clipself_tpu.detector.eval_ap import DetectionEvaluator
    from tests.cocoeval_oracle import coco_eval_oracle

    rng = np.random.default_rng(123)
    num_classes = 5

    def rand_boxes(n):
        lo = rng.uniform(0, 80, size=(n, 2))
        wh = rng.uniform(4, 60, size=(n, 2))
        return np.concatenate([lo, lo + wh], 1).astype(np.float64)

    for trial in range(4):
        images = []
        ev = DetectionEvaluator(num_classes, max_dets=10)
        for _ in range(6):
            ng = int(rng.integers(0, 8))
            nd = int(rng.integers(0, 25))
            gt_boxes = rand_boxes(ng)
            gt_labels = rng.integers(0, num_classes, ng)
            gt_crowd = rng.random(ng) < 0.2
            gt_ignore = gt_crowd | (rng.random(ng) < 0.15)
            # half the dets perturb real gts (so there ARE matches at
            # varied IoUs), half are random; scores include exact ties
            dt_boxes = rand_boxes(nd)
            dt_labels = rng.integers(0, num_classes, nd)
            for i in range(nd // 2):
                if ng:
                    j = int(rng.integers(0, ng))
                    dt_boxes[i] = gt_boxes[j] + rng.normal(0, 3, 4)
                    dt_labels[i] = gt_labels[j]
            dt_scores = np.round(rng.random(nd), 1)  # coarse -> ties
            im = dict(
                dt_boxes=dt_boxes, dt_scores=dt_scores, dt_labels=dt_labels,
                gt_boxes=gt_boxes, gt_labels=gt_labels,
                gt_ignore=gt_ignore, gt_crowd=gt_crowd,
            )
            images.append(im)
            ev.add_image(
                dt_boxes, dt_scores, dt_labels, gt_boxes, gt_labels,
                gt_ignore=gt_ignore, gt_crowd=gt_crowd,
            )
        want = coco_eval_oracle(images, num_classes, max_det=10)
        got = ev.summarize()
        for key in ("mAP", "AP50", "AP75"):
            w, g = want[key], got[key]
            assert (np.isnan(w) and np.isnan(g)) or abs(w - g) < 1e-9, (
                f"trial {trial} {key}: ours {g} vs pycocotools-oracle {w}"
            )
        per = np.stack([ev._class_ap(c) for c in range(num_classes)])
        np.testing.assert_allclose(
            np.nan_to_num(per, nan=-1.0),
            np.nan_to_num(want["per_class"], nan=-1.0),
            atol=1e-9,
        )


def test_paste_mask_geometry():
    """paste_mask (mmdet get_seg_masks semantics): a uniform prob grid
    pastes to exactly the box's pixel footprint, clipped to the canvas;
    a half/half grid splits at the box midline."""
    import numpy as np

    from clipself_tpu.detector.evaluate import paste_mask

    ones = np.ones((4, 4), np.float32)
    out = paste_mask(ones, np.asarray([2.0, 3.0, 7.0, 6.0]), (10, 10))
    want = np.zeros((10, 10), bool)
    want[3:6, 2:7] = True
    np.testing.assert_array_equal(out, want)

    # box partially outside the canvas: clipped, no wrap
    out = paste_mask(ones, np.asarray([-3.0, 8.0, 4.0, 14.0]), (10, 10))
    assert out[:8].sum() == 0 and out[8:, :4].all() and not out[8:, 4:].any()

    # left-on / right-off grid: the paste splits at the box midline
    half = np.concatenate(
        [np.ones((8, 4), np.float32), np.zeros((8, 4), np.float32)], axis=1
    )
    out = paste_mask(half, np.asarray([0.0, 0.0, 8.0, 8.0]), (10, 10))
    assert out[:8, :3].all() and not out[:8, 5:].any()
    assert out[8:].sum() == 0
