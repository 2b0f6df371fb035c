"""End-to-end detector correctness: overfit one image, recover the gt boxes.

Catches sign/coordinate errors anywhere in the chain (anchors, box coding,
assignment, RPN proposals, RoI head, NMS, AP matching) that shape-only smoke
tests cannot.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.detector.eval_ap import DetectionEvaluator
from clipself_tpu.detector.fvit import FViTDetector
from clipself_tpu.detector.train import DetTrainState, build_det_optimizer, make_det_train_step
from clipself_tpu.models.factory import create_model
from tests.test_detector_model import DET_CFG, TINY_CLIP


def test_detector_overfits_single_image():
    cfg = dataclasses.replace(DET_CFG, rcnn_test=dataclasses.replace(DET_CFG.rcnn_test, score_thr=0.05))
    clip_model, clip_params = create_model(TINY_CLIP, dtype=jnp.float32)
    det = FViTDetector(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)

    # one fixed image with two well-separated boxes of distinct classes
    images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[6.0, 6.0, 28.0, 30.0], [36.0, 34.0, 60.0, 58.0],
                             [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]])
    gt_labels = jnp.asarray([[1, 4, 0, 0, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False, False]])
    ce = rng.normal(size=(cfg.num_classes + 1, 32)).astype(np.float32)
    ce = jnp.asarray(ce / np.linalg.norm(ce, axis=-1, keepdims=True))

    taps, dense = clip_model.apply(
        {"params": clip_params}, images, cfg.out_indices, True, method="visual_taps"
    )
    rois = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]])
    det_params = det.init(jax.random.PRNGKey(1), taps, rois, ce)["params"]
    tx = build_det_optimizer(3e-3, wd=0.0)
    state = DetTrainState.create(det_params, tx)
    step = make_det_train_step(det, clip_model, tx, cfg, ce, None)

    batch = {
        "images": images, "gt_boxes": gt_boxes, "gt_labels": gt_labels,
        "gt_valid": gt_valid,
    }
    # 160 steps: at 120 the acceptance was one reduction-order ulp from the
    # margin — the round-5 concat-pyramid RoI backward (bit-exact forward,
    # ~2e-7 relative grad rounding vs the blend path) landed one box at
    # IoU .48. A trajectory-robustness bump, not a semantics change.
    first = last = None
    for i in range(160):
        state, metrics = step(state, clip_params, batch, jax.random.PRNGKey(0))
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert np.isfinite(last) and last < first * 0.6, (first, last)

    predict = jax.jit(
        lambda p: det.apply(
            {"params": p}, taps, None, ce,
            jnp.ones(cfg.num_classes + 1, bool), method="predict",
        )
    )
    boxes, scores, labels = [np.asarray(o) for o in predict(state.params)]
    ok = scores[0] > 0.0
    ev = DetectionEvaluator(cfg.num_classes)
    ev.add_image(
        boxes[0][ok], scores[0][ok], labels[0][ok],
        np.asarray(gt_boxes[0][:2]), np.asarray(gt_labels[0][:2]),
    )
    m = ev.summarize()
    # overfit on its own training image: both gts must be found at IoU .5
    assert m["AP50"] > 0.5, (m, boxes[0][ok][:4], labels[0][ok][:4], scores[0][ok][:4])


def _write_micro_det_coco(root, n_images=8, size=64):
    """COCO-format detection micro-set: solid-color class-keyed rectangles
    on dark noise backgrounds — 2 boxes per image from 3 categories."""
    import json

    from PIL import Image

    from clipself_tpu.detector.classes import coco_split

    names = coco_split()["all"][:3]
    colors = [(255, 40, 40), (40, 255, 40), (40, 40, 255)]
    rng = np.random.default_rng(7)
    img_dir = root / "imgs"
    img_dir.mkdir()
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        arr = rng.integers(0, 40, size=(size, size, 3), dtype=np.uint8)
        boxes = [(4 + 2 * i, 6, 22, 26), (34, 30 + 2 * (i % 3), 58, 56)]
        for j, (x0, y0, x1, y1) in enumerate(boxes):
            c = (i + j) % 3
            arr[y0:y1, x0:x1] = colors[c]
            anns.append({
                "id": aid, "image_id": i, "category_id": c + 1,
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": (x1 - x0) * (y1 - y0), "iscrowd": 0,
            })
            aid += 1
        fname = f"{i}.png"
        Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": i, "file_name": fname, "width": size, "height": size})
    ann = {
        "images": images, "annotations": anns,
        "categories": [{"id": c + 1, "name": n} for c, n in enumerate(names)],
    }
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def test_detector_cli_overfits_micro_set(tmp_path):
    """8-image synthetic set trained through the REAL `detector/train.py`
    CLI (tiny_test preset, full 65-class vocabulary), then evaluated with
    the REAL `detector/evaluate.py` path to >= 0.9 AP50 — end-to-end
    evidence for the file pipeline, trainer and evaluator together."""
    from clipself_tpu.detector import train as det_train
    from clipself_tpu.detector.classes import coco_split
    from clipself_tpu.detector.config import PRESETS
    from clipself_tpu.detector.data import DetectionDataset
    from clipself_tpu.detector.evaluate import evaluate_detector
    from clipself_tpu.detector.fvit import FViTDetector

    ann_file, img_dir = _write_micro_det_coco(tmp_path)
    cfg = PRESETS["tiny_test"]
    split = coco_split()
    ce = np.random.default_rng(3).normal(size=(cfg.num_classes + 1, cfg.embed_dim))
    ce = (ce / np.linalg.norm(ce, axis=-1, keepdims=True)).astype(np.float32)
    ce_path = tmp_path / "ce.npy"
    np.save(ce_path, ce)

    state = det_train.main([
        "--preset", "tiny_test", "--dataset", "coco",
        "--ann-file", ann_file, "--image-root", img_dir,
        "--class-embed", str(ce_path),
        "--batch-size", "8", "--epochs", "400", "--lr", "3e-3", "--wd", "0.0",
        "--ratio-range", "1.0", "1.0",
        "--precision", "fp32", "--log-every", "100",
        "--output", str(tmp_path / "out"),
    ])

    clip_model, clip_params = create_model(cfg.clip_model, dtype=jnp.float32)
    val_ds = DetectionDataset(
        ann_file, img_dir, split["all"], image_size=cfg.image_size,
        max_gt=cfg.max_gt, train=False,
    )
    results = evaluate_detector(
        FViTDetector(cfg, dtype=jnp.float32), state.params, clip_model,
        clip_params, val_ds, cfg, ce, dataset_name="coco", batch_size=8,
    )
    assert results["AP50"] >= 0.9, results


def test_synth_det_data_roundtrips_lvis_mask_pipeline(tmp_path):
    """The recipe-shape drive's data generator (tools/synth_det_data)
    produces LVIS-format annotations that round-trip through the REAL
    DetectionDataset mask pipeline: polygon segmentations rasterize to
    non-empty stride-4 masks aligned with their boxes, and the LVIS
    protocol fields (areas, federated neg / not-exhaustive sets) come
    through typed."""
    from clipself_tpu.detector.data import DetectionDataset
    from clipself_tpu.tools.synth_det_data import write_synth_det

    names = [f"cls_{i}" for i in range(12)]
    ann, imgs = write_synth_det(
        str(tmp_path), names, gt_class_indices=[1, 4, 7], n_images=3,
        size=64, boxes_per_image=2, lvis_format=True, ellipses=True, seed=3,
    )
    ds = DetectionDataset(
        ann, imgs, names, image_size=64, max_gt=5, train=False, with_mask=True
    )
    assert len(ds) == 3
    item = ds[0]
    gv = item["gt_valid"]
    assert int(gv.sum()) == 2
    for j in range(2):
        m = item["gt_masks"][j]
        assert m.any(), "polygon rasterized to empty mask"
        ys, xs = np.where(m)
        x0, y0, x1, y1 = item["gt_boxes"][j] / 4.0
        # mask support sits inside (a 1px-dilated) box at stride-4
        assert xs.min() >= np.floor(x0) - 1 and xs.max() <= np.ceil(x1) + 1
        assert ys.min() >= np.floor(y0) - 1 and ys.max() <= np.ceil(y1) + 1
    assert item["_gt_areas_full"].dtype == np.float64
    assert item["_neg_labels"] == [] and item["_nel_labels"] == []
