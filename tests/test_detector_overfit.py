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
    first = last = None
    for i in range(120):
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
