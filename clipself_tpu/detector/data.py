"""Detection data pipeline: COCO-style boxes -> fixed-shape TPU batches.

Re-designs the reference mmdet pipeline
(`F-ViT/configs/ov_coco/...eva_original.py:150-196`): train = random-ratio
keep-ratio resize (0.1-2.0x of 640) + bounded random crop + hflip +
normalize + pad-to-square; eval = keep-ratio fit-640 resize + pad. Items are
dicts of padded NumPy arrays (max_gt boxes with validity), deterministic per
(seed, epoch, index).

Detector normalization uses ImageNet mean/std (the mmdet convention, config
lines 166-169), NOT the CLIP mean/std used by the distillation pipelines.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from clipself_tpu.data.coco import COCOIndex

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def normalize_image(arr: np.ndarray) -> np.ndarray:
    return (arr.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD


def rle_decode(rle: dict) -> np.ndarray:
    """Decode a COCO RLE segmentation (crowd regions) to a binary [H, W]
    mask. Handles both uncompressed (counts = list) and the compressed
    LEB128-style string encoding pycocotools produces."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = _rle_uncompress(counts)
    mask = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            mask[pos : pos + c] = 1
        pos += c
        val ^= 1
    return mask.reshape(w, h).T  # COCO RLE is column-major


def _rle_uncompress(s: str) -> list[int]:
    """pycocotools' compressed counts string -> run lengths."""
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
        if x & (1 << (5 * k - 1)):  # sign-extend
            x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


class DetectionDataset:
    """COCO-style detection dataset with open-vocabulary class mapping.

    Labels are contiguous indices into `class_names` (the all-classes order
    used by the text-embedding matrix). Annotations whose category name is
    not in `class_names` are dropped.
    """

    def __init__(
        self,
        ann_file: str,
        image_root: str,
        class_names: Sequence[str],
        image_size: int = 640,
        max_gt: int = 100,
        train: bool = True,
        ratio_range: tuple[float, float] = (0.1, 2.0),
        min_gt_size: float = 0.01,
        seed: int = 0,
        with_mask: bool = False,
    ):
        self.coco = COCOIndex(ann_file)
        self.image_root = image_root
        self.class_names = list(class_names)
        self.image_size = image_size
        self.max_gt = max_gt
        self.train = train
        self.ratio_range = ratio_range
        self.min_gt_size = min_gt_size
        self.seed = seed
        self.epoch = 0
        self.with_mask = with_mask
        name_to_label = {n: i for i, n in enumerate(self.class_names)}
        self.cat_to_label = {
            cid: name_to_label[c["name"]]
            for cid, c in self.coco.cats.items()
            if c["name"] in name_to_label
        }
        if train:
            # keep images that have at least one mapped annotation
            self.image_ids = [
                i
                for i in self.coco.image_ids
                if any(a["category_id"] in self.cat_to_label for a in self.coco.img_to_anns[i])
            ]
        else:
            self.image_ids = self.coco.image_ids

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.image_ids)

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch, idx))

    def _load(self, image_id, keep_crowd: bool = False):
        path = os.path.join(self.image_root, self.coco.file_name(image_id))
        img = Image.open(path).convert("RGB")
        anns = [
            a
            for a in self.coco.img_to_anns[image_id]
            if a["category_id"] in self.cat_to_label
            and (keep_crowd or not a.get("iscrowd", 0))
        ]
        boxes = np.array(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]] for a in anns],
            np.float32,
        ).reshape(-1, 4)
        labels = np.array([self.cat_to_label[a["category_id"]] for a in anns], np.int64)
        crowd = np.array([bool(a.get("iscrowd", 0)) for a in anns], bool)
        return img, boxes, labels, crowd, anns

    def _pad_item(self, arr, boxes, labels, scale, image_id, masks=None):
        s = self.image_size
        g = self.max_gt
        out_boxes = np.zeros((g, 4), np.float32)
        out_labels = np.zeros((g,), np.int64)
        out_valid = np.zeros((g,), bool)
        n = min(len(boxes), g)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        out_valid[:n] = True
        item = {
            "images": arr,
            "gt_boxes": out_boxes,
            "gt_labels": out_labels,
            "gt_valid": out_valid,
            "scale": np.float32(scale),
            "image_id": np.int64(image_id if isinstance(image_id, (int, np.integer)) else 0),
        }
        if masks is not None:
            ms = s // 4
            # uint8 rasters: 4x less host memory / host->device transfer
            # than f32; the loss casts on device (`fvit.py::_mask_loss`)
            out_masks = np.zeros((g, ms, ms), np.uint8)
            for i in range(n):
                out_masks[i] = masks[i]
            item["gt_masks"] = out_masks
        return item

    def __getitem__(self, idx: int) -> dict:
        image_id = self.image_ids[idx]
        if self.train:
            # crowd regions are excluded from training targets (mmdet routes
            # them to gt_bboxes_ignore; with fixed-shape targets we drop them)
            img, boxes, labels, _, anns = self._load(image_id, keep_crowd=False)
            return self._train_item(idx, image_id, img, boxes, labels, anns)
        # eval: keep-ratio fit, pad bottom-right; crowd gts kept as IGNORE
        img, boxes, labels, crowd, anns = self._load(image_id, keep_crowd=True)
        s = self.image_size
        scale = min(s / img.width, s / img.height)
        nw, nh = int(round(img.width * scale)), int(round(img.height * scale))
        resized = img.resize((nw, nh), Image.BILINEAR)
        arr = np.zeros((s, s, 3), np.float32)
        arr[:nh, :nw] = normalize_image(np.asarray(resized))
        masks = None
        if self.with_mask:
            # only the first max_gt rasters are kept by _pad_item
            masks = [
                self._rasterize_mask(a, scale, (0, 0), (nh, nw), flip=False)
                for a in anns[: self.max_gt]
            ]
        item = self._pad_item(arr, boxes * scale, labels, scale, image_id, masks)
        # full (unpadded, original-coordinate) gt set for the evaluator —
        # keys with a leading underscore are skipped by collate()
        item["_gt_boxes_full"] = boxes
        item["_gt_labels_full"] = labels
        item["_gt_ignore_full"] = crowd
        # LVIS protocol fields: annotation (polygon) areas and the image's
        # federated neg / not-exhaustive category sets mapped to contiguous
        # labels (lvis-api `LVISEval._prepare`; ref `lvls_ov.py:120-180`).
        # Plain COCO JSONs lack these keys -> empty, harmless for COCOeval.
        item["_gt_areas_full"] = np.array(
            [
                a.get("area", (a["bbox"][2] * a["bbox"][3]))
                for a in self.coco.img_to_anns[image_id]
                if a["category_id"] in self.cat_to_label
            ],
            np.float64,
        )
        info = self.coco.imgs[image_id]
        item["_neg_labels"] = sorted(
            self.cat_to_label[c]
            for c in info.get("neg_category_ids", [])
            if c in self.cat_to_label
        )
        item["_nel_labels"] = sorted(
            self.cat_to_label[c]
            for c in info.get("not_exhaustive_category_ids", [])
            if c in self.cat_to_label
        )
        item["valid_hw"] = np.asarray([nh, nw], np.float32)
        return item

    def _train_item(self, idx, image_id, img, boxes, labels, anns):
        rng = self._rng(idx)
        s = self.image_size
        # random-ratio keep-ratio resize: ratio * fit-640 scale
        ratio = rng.uniform(*self.ratio_range)
        scale = ratio * min(s / img.width, s / img.height)
        nw = max(int(round(img.width * scale)), 1)
        nh = max(int(round(img.height * scale)), 1)
        img = img.resize((nw, nh), Image.BILINEAR)
        boxes = boxes * scale

        # bounded random crop to at most s x s
        cw, ch = min(nw, s), min(nh, s)
        x0 = int(rng.integers(0, nw - cw + 1))
        y0 = int(rng.integers(0, nh - ch + 1))
        img = img.crop((x0, y0, x0 + cw, y0 + ch))
        boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)

        # horizontal flip
        do_flip = rng.uniform() < 0.5
        if do_flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            flipped = boxes.copy()
            flipped[:, 0] = cw - boxes[:, 2]
            flipped[:, 2] = cw - boxes[:, 0]
            boxes = flipped

        # drop degenerate boxes (FilterAnnotations min_gt_bbox_wh)
        wh = boxes[:, 2:] - boxes[:, :2]
        keep = (wh > self.min_gt_size).all(axis=1)
        boxes, labels = boxes[keep], labels[keep]
        kept_anns = [a for a, k in zip(anns, keep) if k] if self.with_mask else None

        arr = np.zeros((s, s, 3), np.float32)
        arr[: img.height, : img.width] = normalize_image(np.asarray(img))

        masks = None
        if self.with_mask:
            masks = [
                self._rasterize_mask(a, scale, (x0, y0), (ch, cw), flip=do_flip)
                for a in kept_anns
            ]
        item = self._pad_item(arr, boxes, labels, scale, image_id, masks)
        item["valid_hw"] = np.asarray([img.height, img.width], np.float32)
        return item

    def _rasterize_mask(self, ann, scale, crop_xy, crop_hw, flip: bool = False):
        """Polygon segmentation -> stride-4 binary raster in crop coords
        (mirrored when the hflip augmentation fired, so mask targets stay
        aligned with the flipped image/boxes)."""
        ms = self.image_size // 4
        out = np.zeros((ms, ms), np.float32)
        seg = ann.get("segmentation")
        if isinstance(seg, dict) and "counts" in seg:
            # RLE (crowd regions): decode, then box-resample to the raster
            full = rle_decode(seg)
            src = Image.fromarray(full * 255)
            # map original pixels -> raster frame: scale then 1/4
            rw = max(int(round(full.shape[1] * scale / 4.0)), 1)
            rh = max(int(round(full.shape[0] * scale / 4.0)), 1)
            small = np.asarray(src.resize((rw, rh), Image.BILINEAR)) > 127
            # place into the (possibly cropped) raster
            ox = int(round(crop_xy[0] / 4.0))
            oy = int(round(crop_xy[1] / 4.0))
            ys, xs = min(rh - oy, ms), min(rw - ox, ms)
            if ys > 0 and xs > 0:
                out[:ys, :xs] = small[oy : oy + ys, ox : ox + xs]
            if flip:
                # mirror about the CROP width (as the polygon/box paths do),
                # not the full raster — they differ whenever the crop is
                # narrower than image_size
                cwr = min(ms, max(int(round(crop_hw[1] / 4.0)), 1))
                out[:, :cwr] = out[:, :cwr][:, ::-1]
            return out
        if not isinstance(seg, list):
            return out
        from PIL import ImageDraw

        im = Image.new("1", (ms, ms), 0)
        draw = ImageDraw.Draw(im)
        cw = crop_hw[1]
        for poly in seg:
            pts = np.asarray(poly, np.float32).reshape(-1, 2)
            pts = pts * scale - np.asarray(crop_xy, np.float32)
            if flip:
                pts[:, 0] = cw - pts[:, 0]
            pts = pts / 4.0
            if len(pts) >= 3:
                draw.polygon([tuple(p) for p in pts], fill=1)
        out[:] = np.asarray(im, np.float32)
        return out


def collate(items: list[dict]) -> dict:
    """Stack batchable keys; underscore-prefixed keys (variable-length
    per-image eval metadata) are per-item and skipped."""
    return {
        k: np.stack([it[k] for it in items])
        for k in items[0]
        if not k.startswith("_")
    }


class SyntheticDetectionData:
    """Fixed-shape random detection batches for smoke tests and benches."""

    def __init__(self, num_classes: int, image_size=640, max_gt=20, seed=0, with_mask=False):
        self.num_classes = num_classes
        self.image_size = image_size
        self.max_gt = max_gt
        self.seed = seed
        self.with_mask = with_mask
        self._calls = 0

    def batch(self, batch_size: int) -> dict:
        # fold a call counter into the seed: successive batches differ
        # (a fixed seed would make every "epoch" the same single batch)
        rng = np.random.default_rng((self.seed, self._calls))
        self._calls += 1
        b, g, s = batch_size, self.max_gt, self.image_size
        xy = rng.uniform(0, s * 0.6, size=(b, g, 2)).astype(np.float32)
        wh = rng.uniform(8, s * 0.3, size=(b, g, 2)).astype(np.float32)
        out = {
            "images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
            "gt_boxes": np.concatenate([xy, np.clip(xy + wh, None, s)], -1),
            "gt_labels": rng.integers(0, self.num_classes, size=(b, g)),
            "gt_valid": rng.uniform(size=(b, g)) < 0.7,
            "scale": np.ones((b,), np.float32),
            "image_id": np.arange(b, dtype=np.int64),
            "valid_hw": np.full((b, 2), float(s), np.float32),
        }
        if self.with_mask:
            out["gt_masks"] = (
                rng.uniform(size=(b, g, s // 4, s // 4)) < 0.3
            ).astype(np.uint8)
        return out
