"""Detector evaluation driver: jitted prediction -> NumPy COCO AP.

Equivalent of mmdet `F-ViT/test.py` + `CocoDatasetOV.evaluate`
(`F-ViT/datasets/coco_ov.py:330-380`): per-image fused detections are
rescaled to original image coordinates and scored with the COCO protocol,
reporting mAP / AP50 and the open-vocabulary base/novel AP50 split (LVIS:
rare/common/frequent mAP groups).
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.detector.classes import base_novel_mask, coco_split, lvis_split, transfer_split
from clipself_tpu.detector.config import PRESETS, FViTConfig
from clipself_tpu.detector.data import DetectionDataset, collate
from clipself_tpu.detector.eval_ap import DetectionEvaluator
from clipself_tpu.detector.eval_lvis import LvisEvaluator
from clipself_tpu.detector.fvit import FViTDetector, backbone_taps


def make_predict_fn(det: FViTDetector, clip_model, cfg: FViTConfig, class_embed, base_mask):
    from clipself_tpu.train.step import _tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=_tpu_compiler_options())
    def predict(det_params, clip_params, images, valid_hw):
        taps, dense = backbone_taps(clip_model, clip_params, images, cfg, True)
        return det.apply(
            {"params": det_params}, taps, dense, class_embed, base_mask,
            None, valid_hw, method="predict",
        )

    return predict


def paste_mask(prob: np.ndarray, box: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Paste a roi-space mask prob grid into a full-image boolean raster
    (mmdet FCNMaskHead.get_seg_masks semantics, 0.5 threshold)."""
    from PIL import Image

    h, w = out_hw
    out = np.zeros((h, w), bool)
    x0, y0, x1, y1 = box
    x0i, y0i = int(np.floor(x0)), int(np.floor(y0))
    x1i, y1i = int(np.ceil(x1)), int(np.ceil(y1))
    bw, bh = max(x1i - x0i, 1), max(y1i - y0i, 1)
    m = Image.fromarray((prob * 255).astype(np.uint8)).resize((bw, bh), Image.BILINEAR)
    m = np.asarray(m, np.float32) / 255.0 > 0.5
    xs0, ys0 = max(x0i, 0), max(y0i, 0)
    xs1, ys1 = min(x1i, w), min(y1i, h)
    if xs1 > xs0 and ys1 > ys0:
        out[ys0:ys1, xs0:xs1] = m[ys0 - y0i : ys1 - y0i, xs0 - x0i : xs1 - x0i]
    return out


def evaluate_detector(
    det: FViTDetector,
    det_params,
    clip_model,
    clip_params,
    dataset: DetectionDataset,
    cfg: FViTConfig,
    class_embed,
    dataset_name: str = "coco",
    batch_size: int = 8,
    max_images: int | None = None,
    mask_stride: int = 4,
    log_every: int = 50,
    split: dict | None = None,
) -> dict:
    if split is None:
        split = coco_split() if dataset_name == "coco" else lvis_split()
    # base/background rows fuse with alpha, novel with beta (all-True for
    # transfer vocabularies, where every class uses the base exponent)
    bm = jnp.asarray(base_novel_mask(split=split))
    predict = make_predict_fn(det, clip_model, cfg, jnp.asarray(class_embed), bm)
    # OV-LVIS is scored with the official LVIS protocol (federated pos/neg
    # image sets, per-image 300-det cap, not-exhaustive ignores), matching the
    # reference's lvis-api LVISEval use (`F-ViT/datasets/lvls_ov.py:120-180`);
    # everything else uses the COCO protocol.
    use_lvis = dataset_name == "lvis" and "freq_groups" in split
    if use_lvis:
        name_to_grp = {}
        for gi, g in enumerate(("rare", "common", "frequent")):
            for n_ in split["freq_groups"][g]:
                name_to_grp[n_] = gi
        freq_index = np.array([name_to_grp.get(n_, 2) for n_ in split["all"]])
        ev = LvisEvaluator(cfg.num_classes, freq_index=freq_index)
        ev_mask = (
            LvisEvaluator(cfg.num_classes, freq_index=freq_index, with_mask=True)
            if cfg.with_mask
            else None
        )
    else:
        ev = DetectionEvaluator(cfg.num_classes, with_mask=False)
        ev_mask = DetectionEvaluator(cfg.num_classes, with_mask=True) if cfg.with_mask else None
    log = logging.getLogger("fvit-eval")

    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    t0 = time.time()
    for start in range(0, n, batch_size):
        real = min(batch_size, n - start)
        # the last partial batch is padded by repeating its final item (the
        # padded copies are not scored) — no image is dropped
        items = [dataset[min(start + j, start + real - 1)] for j in range(batch_size)]
        batch = collate(items)
        out = predict(
            det_params, clip_params,
            jnp.asarray(batch["images"]), jnp.asarray(batch["valid_hw"]),
        )
        boxes, scores, labels = [np.asarray(o) for o in out[:3]]
        probs = np.asarray(out[3]) if cfg.with_mask else None
        for bi, item in enumerate(items[:real]):
            ok = scores[bi] > 0.0
            s = float(item["scale"])
            det_boxes = boxes[bi][ok] / s
            det_scores = scores[bi][ok]
            det_labels = labels[bi][ok]
            # full (unpadded) gt set in original coordinates; crowd = ignore
            gt_boxes = item["_gt_boxes_full"]
            gt_labels = item["_gt_labels_full"]
            gt_ignore = item["_gt_ignore_full"]
            if use_lvis:
                lvis_kw = dict(
                    gt_areas=item["_gt_areas_full"],
                    neg_labels=item["_neg_labels"],
                    not_exhaustive_labels=item["_nel_labels"],
                )
                ev.add_image(
                    det_boxes, det_scores, det_labels, gt_boxes, gt_labels, **lvis_kw
                )
            else:
                ev.add_image(
                    det_boxes, det_scores, det_labels, gt_boxes, gt_labels, gt_ignore
                )
            if ev_mask is not None:
                hs = int(np.ceil(cfg.image_size / s / mask_stride))
                det_m = [
                    paste_mask(probs[bi][j], boxes[bi][ok][j2] / s / mask_stride, (hs, hs))
                    for j2, j in enumerate(np.where(ok)[0])
                ]
                # mask rasters exist for the first max_gt gts; any overflow
                # gts are marked ignore so they are neither FN nor FP. Their
                # raster is the FILLED BOX (not zeros — a zero raster could
                # never mask-IoU-match, so a det segmenting an overflow gt
                # would wrongly count as FP instead of being absorbed)
                gv = item["gt_valid"]
                n_m = int(gv.sum())
                gt_m = [_resize_bool(m, (hs, hs)) for m in item["gt_masks"][gv]]

                def _box_raster(b):
                    r = np.zeros((hs, hs), bool)
                    x0, y0, x1, y1 = b / mask_stride
                    r[int(y0): int(np.ceil(y1)), int(x0): int(np.ceil(x1))] = True
                    return r

                overflow = [_box_raster(gt_boxes[i]) for i in range(n_m, len(gt_boxes))]
                ign_m = np.concatenate(
                    [gt_ignore[:n_m], np.ones(len(gt_boxes) - n_m, bool)]
                )
                if use_lvis:
                    ev_mask.add_image(
                        det_boxes, det_scores, det_labels,
                        gt_boxes[: len(ign_m)], gt_labels[: len(ign_m)],
                        gt_areas=item["_gt_areas_full"][: len(ign_m)],
                        det_masks=det_m,
                        gt_masks=gt_m + overflow,
                        gt_ignore=ign_m,
                        **{k: lvis_kw[k] for k in ("neg_labels", "not_exhaustive_labels")},
                    )
                else:
                    ev_mask.add_image(
                        det_boxes, det_scores, det_labels,
                        gt_boxes[: len(ign_m)], gt_labels[: len(ign_m)], ign_m,
                        det_masks=det_m,
                        gt_masks=gt_m + overflow,
                    )
        if (start // batch_size + 1) % log_every == 0:
            log.info(f"eval {start + real}/{n} ({(start + real) / (time.time() - t0):.1f} img/s)")

    if use_lvis:
        metrics = ev.summarize()
        if ev_mask is not None:
            metrics.update({f"segm_{k}": v for k, v in ev_mask.summarize().items()})
    else:
        groups = split.get("freq_groups")
        metrics = ev.summarize(
            class_names=split["all"], base_classes=split["seen"],
            novel_classes=split["unseen"], groups=groups,
        )
        if ev_mask is not None:
            mm = ev_mask.summarize(
                class_names=split["all"], base_classes=split["seen"],
                novel_classes=split["unseen"], groups=groups,
            )
            metrics.update({f"segm_{k}": v for k, v in mm.items()})
    return metrics


def _resize_bool(m: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(m.astype(np.uint8) * 255).resize((hw[1], hw[0]), Image.NEAREST)
    return np.asarray(im) > 127


def main(argv=None):
    from clipself_tpu.models.factory import create_model

    p = argparse.ArgumentParser("fvit-test")
    p.add_argument("--preset", default="ov_coco_vitb16", choices=sorted(PRESETS))
    p.add_argument("--dataset", default=None,
                   choices=["coco", "lvis", "voc", "objects365"],
                   help="class-split registry; inferred from --preset when "
                   "omitted. Transfer presets use the full target vocabulary "
                   "(reference configs/transfer/*)")
    p.add_argument("--ann-file", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--class-embed", required=True)
    p.add_argument("--clip-checkpoint", default=None)
    p.add_argument("--detector-checkpoint", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    cfg = PRESETS[args.preset]
    is_transfer = args.preset.startswith("transfer_")
    if args.dataset is None:
        if is_transfer:
            args.dataset = args.preset.split("_")[1]
        else:
            args.dataset = "lvis" if "lvis" in args.preset else "coco"
    if is_transfer:
        split = transfer_split(args.dataset)
    elif args.dataset == "coco":
        split = coco_split()
    elif args.dataset == "lvis":
        split = lvis_split()
    else:
        raise SystemExit(f"--dataset {args.dataset} requires a transfer_* preset")
    if len(split["all"]) != cfg.num_classes:
        raise SystemExit(
            f"--dataset {args.dataset} has {len(split['all'])} classes but "
            f"preset {args.preset} expects {cfg.num_classes}"
        )
    clip_model, clip_params = create_model(
        cfg.clip_model, dtype=jnp.bfloat16, pretrained=args.clip_checkpoint
    )
    det = FViTDetector(cfg, dtype=jnp.bfloat16)
    det_params = load_detector(args.detector_checkpoint)
    ce = np.load(args.class_embed).astype(np.float32)
    k = len(split["all"])
    if ce.shape != (k + 1, cfg.embed_dim):
        raise SystemExit(
            f"--class-embed {args.class_embed} has shape {ce.shape}; "
            f"preset {args.preset} needs ({k + 1}, {cfg.embed_dim}) — "
            f"{k} classes + background"
        )
    ce = ce / np.linalg.norm(ce, axis=-1, keepdims=True)
    ds = DetectionDataset(
        args.ann_file, args.image_root, split["all"],
        image_size=cfg.image_size, max_gt=cfg.max_gt, train=False,
        with_mask=cfg.with_mask,
    )
    metrics = evaluate_detector(
        det, det_params, clip_model, clip_params, ds, cfg, ce,
        dataset_name=args.dataset, batch_size=args.batch_size,
        max_images=args.max_images, split=split,
    )
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)
    return metrics


def load_detector(path: str):
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    flat = blob["params"]
    tree = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


if __name__ == "__main__":
    main()
